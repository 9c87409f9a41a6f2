"""TiTok: ViT encoder → FSQ → ViT decoder over packed video batches.

Mirrors the reference model wiring (reference ``model/titok.py``):
``token_size = len(fsq_levels)`` (``titok.py:29``) — the latent channel dim
equals the number of FSQ levels.

Two API layers:

- :class:`TiTok` (flax module) — pure functions over PackedBatch device
  arrays; everything jittable. This is what training uses.
- :class:`TiTokModel` — stateful convenience wrapper owning params that
  accepts *lists of CTHW videos* and per-sample token counts, keeping the
  reference's public tokenizer API
  (``encode(x, token_counts, split_indices=True)`` ``titok.py:47-52``,
  ``decode_indices(indices, grids)`` ``titok.py:54-62``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from titok_tpu.data.packing import (
    PackedBatch,
    max_samples_for,
    pack_samples,
    unpack_indices,
    unpack_videos,
)
from titok_tpu.models.blocks import HEAD_DIM, PackedDecoder, PackedEncoder
from titok_tpu.models.quantizer import FSQ


class TiTok(nn.Module):
    """Functional TiTok over packed buffers.

    Config keys consumed (same schema as the reference
    ``configs/tiny.yaml``): ``tokenizer.model.{patch_size, fsq_levels,
    encoder_size, decoder_size}``.
    """

    patch_size: Sequence[int] = (4, 8, 8)
    fsq_levels: Sequence[int] = (7, 5, 5, 5, 5)
    encoder_size: str = "tiny"
    decoder_size: str = "tiny"
    in_channels: int = 3
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # quantizer family: 'fsq' (reference default) or 'vq' (EMA-VQ with the
    # Pallas nearest-neighbor kernel, titok_tpu/models/vq.py)
    quantizer: str = "fsq"
    remat: bool = False
    max_seg_len: int | None = None
    # context parallelism: shard the packed [S] axis over this mesh's
    # cp_axis (see titok_tpu/parallel/context_parallel.py)
    cp_mesh: Any = None
    cp_axis: str = "seq"
    tp_mesh: Any = None
    tp_axis: str = "model"
    vq_codebook_size: int = 16384
    vq_dim: int = 8
    vq_commitment_weight: float = 0.25
    vq_decay: float = 0.99
    vq_dead_steps: int = 256
    vq_entropy_weight: float = 0.0
    vq_entropy_tau: float = 0.2

    @property
    def token_size(self) -> int:
        return (len(self.fsq_levels) if self.quantizer == "fsq"
                else self.vq_dim)

    @property
    def codebook_size(self) -> int:
        return (int(np.prod(self.fsq_levels)) if self.quantizer == "fsq"
                else self.vq_codebook_size)

    def setup(self):
        self.encoder = PackedEncoder(
            model_size=self.encoder_size,
            patch_size=tuple(self.patch_size),
            in_channels=self.in_channels,
            out_channels=self.token_size,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            max_seg_len=self.max_seg_len,
            cp_mesh=self.cp_mesh,
            cp_axis=self.cp_axis,
            tp_mesh=self.tp_mesh,
            tp_axis=self.tp_axis,
            name="encoder",
        )
        if self.quantizer == "fsq":
            self.quantize = FSQ(self.fsq_levels)
        else:
            from titok_tpu.models.vq import EMAVQ

            self.quantize = EMAVQ(
                self.vq_codebook_size, self.vq_dim,
                commitment_weight=self.vq_commitment_weight,
                decay=self.vq_decay,
                dead_steps=self.vq_dead_steps,
                entropy_weight=self.vq_entropy_weight,
                entropy_tau=self.vq_entropy_tau,
                cp_mesh=self.cp_mesh, cp_axis=self.cp_axis,
            )
        self.decoder = PackedDecoder(
            model_size=self.decoder_size,
            patch_size=tuple(self.patch_size),
            in_channels=self.token_size,
            out_channels=self.in_channels,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            max_seg_len=self.max_seg_len,
            cp_mesh=self.cp_mesh,
            cp_axis=self.cp_axis,
            tp_mesh=self.tp_mesh,
            tp_axis=self.tp_axis,
            name="decoder",
        )

    # -- packed (jittable) API -------------------------------------------
    def encode_packed(self, batch: dict, vq_state=None) -> tuple[jnp.ndarray, dict]:
        """[S,P] patches -> ([S, token_size] quantized codes, {'indices': [S]}).

        Valid at token slots only (ref ``titok.py:47-52``); other rows carry
        garbage that downstream masks out. FSQ runs at every slot to keep the
        shape static — elementwise, so the cost is negligible.

        For the EMA-VQ family, pass the ``VQState`` (codebook + EMA stats);
        the aux dict then also carries ``commit_loss``, EMA batch stats, and
        ``perplexity``.
        """
        z = self.encoder(
            batch["patches"], batch["token_mask"], batch["segment_ids"],
            batch["rope_cos"], batch["rope_sin"],
        )
        if self.quantizer == "fsq":
            codes, aux = self.quantize(z)
        else:
            assert vq_state is not None, "EMA-VQ needs a VQState"
            codes, aux = self.quantize(
                z, vq_state, weights=batch["token_mask"]
            )
            aux["z"] = jax.lax.stop_gradient(z.astype(jnp.float32))
        return codes, aux

    def decode_packed(self, codes: jnp.ndarray, batch: dict) -> jnp.ndarray:
        """[S, token_size] codes -> [S, C*prod(patch)] patch pixels."""
        return self.decoder(
            codes, batch["token_mask"], batch["segment_ids"],
            batch["rope_cos"], batch["rope_sin"],
        )

    def decode_indices_packed(self, indices: jnp.ndarray, batch: dict,
                              vq_state=None) -> jnp.ndarray:
        """int32 [S] codebook ids -> [S, C*prod(patch)] (ref ``titok.py:54-62``)."""
        if self.quantizer == "fsq":
            codes = self.quantize.indices_to_codes(indices).astype(self.dtype)
        else:
            codes = self.quantize.indices_to_codes(indices, vq_state).astype(
                self.dtype
            )
        return self.decode_packed(codes, batch)

    def __call__(self, batch: dict, vq_state=None) -> tuple[jnp.ndarray, dict]:
        codes, aux = self.encode_packed(batch, vq_state)
        recon = self.decode_packed(codes, batch)
        return recon, aux


def _config_max_seg_len(config):
    """Static bound on one packed sample's slot count: max patch grid +
    max latent tokens (the packer never splits a clip)."""
    try:
        cs = config.training.sampling
        ps = config.tokenizer.model.patch_size
        grid = 1
        for g, p in zip(cs.max_grid, ps):
            grid *= g // p
        return int(grid) + int(cs.token_range[1])
    except (KeyError, AttributeError, TypeError):
        return None


def make_titok(config, cp_mesh=None, cp_axis: str = "seq",
               tp_mesh=None, tp_axis: str = "model") -> TiTok:
    """Build a TiTok module from a framework Config (ref ``titok.py:24-45``).

    ``cp_mesh``: optional mesh for context parallelism — the packed [S]
    axis is sharded along ``cp_axis`` and attention runs the shard_map CP
    op; pass batches sharded with ``parallel.cp.shard_packed_tree``.
    """
    tm = config.tokenizer.model
    precision = str(config.training.main.get("precision", "bf16-mixed"))
    dtype = {"bf16": jnp.bfloat16, "16": jnp.float16, "32": jnp.float32}[
        precision.split("-")[0]
    ]
    vq = tm.get("vq", {}) or {}
    return TiTok(
        patch_size=tuple(tm.patch_size),
        fsq_levels=tuple(tm.fsq_levels),
        encoder_size=tm.encoder_size,
        decoder_size=tm.decoder_size,
        dtype=dtype,
        attn_impl=str(config.training.main.get("attn_impl", "auto")),
        remat=bool(config.training.main.get("remat", False)),
        max_seg_len=_config_max_seg_len(config),
        quantizer=str(tm.get("quantizer", "fsq")),
        vq_codebook_size=int(vq.get("codebook_size", 16384)),
        vq_dim=int(vq.get("dim", 8)),
        vq_commitment_weight=float(vq.get("commitment_weight", 0.25)),
        vq_decay=float(vq.get("decay", 0.99)),
        vq_dead_steps=int(vq.get("dead_steps", 256)),
        vq_entropy_weight=float(vq.get("entropy_weight", 0.0)),
        vq_entropy_tau=float(vq.get("entropy_tau", 0.2)),
        cp_mesh=cp_mesh,
        cp_axis=cp_axis,
        tp_mesh=tp_mesh,
        tp_axis=tp_axis,
    )


class TiTokModel:
    """Stateful wrapper with the reference's list-of-videos public API.

    Not used in the training hot loop (training consumes PackedBatch
    directly); this is the inference/tokenizer-served surface.
    """

    def __init__(self, module: TiTok, params=None, seed: int = 0,
                 seq_len: int = 4096, min_grid: Sequence[int] = (8, 128, 128),
                 vq_state=None):
        self.module = module
        self.seq_len = seq_len
        self.max_samples = max_samples_for(seq_len, min_grid, module.patch_size)
        # EMA-VQ family: the codebook is inference state exactly like the
        # params (ref ``titok.py:54-62`` decodes indices through it); thread
        # it through every jitted closure. None for FSQ.
        if module.quantizer == "vq" and vq_state is None:
            from titok_tpu.models.vq import init_vq_state

            vq_state = init_vq_state(
                jax.random.PRNGKey(seed + 1),
                module.vq_codebook_size, module.vq_dim,
            )
        self.vq_state = vq_state
        if params is None:
            params = self.init_params(seed)
        self.params = params
        self._build_closures()

    def _build_closures(self, apply_fn=None):
        """(Re)build the jitted entry points from one apply function.

        ``apply_fn(variables, *args, method=...)`` defaults to
        ``module.apply``; serving-side wrappers (e.g. int8 quantization,
        ``titok_tpu/serving/quant.py``) override it so every entry point
        is rerouted in one place instead of duplicating closure
        signatures."""
        if apply_fn is None:
            apply_fn = self.module.apply
        self._jit_forward = jax.jit(
            lambda p, vqs, b: apply_fn({"params": p}, b, vqs)
        )
        self._jit_decode_indices = jax.jit(
            lambda p, vqs, idx, b: apply_fn(
                {"params": p}, idx, b, vqs,
                method=self.module.decode_indices_packed,
            )
        )

    def init_params(self, seed: int = 0):
        d = self._dummy_batch()
        return self.module.init(
            jax.random.PRNGKey(seed), d, self.vq_state
        )["params"]

    def _dummy_batch(self) -> dict:
        ps = list(self.module.patch_size)
        vid = np.zeros([self.module.in_channels] + [p * 2 for p in ps], np.float32)
        b = pack_samples([vid], [1], seq_len=self.seq_len,
                         max_samples=self.max_samples, patch_size=ps,
                         head_dim=HEAD_DIM)
        return b.device_arrays()

    def _pack(self, videos, token_counts, fps=None) -> PackedBatch:
        # uint8 THWC clips pass through untouched (the packer's fused
        # normalize+patchify handles them — half the host-side bytes);
        # everything else is the reference's float CTHW wire
        return pack_samples(
            [v if getattr(v, "dtype", None) == np.uint8
             else np.asarray(v, np.float32) for v in videos],
            [int(t) for t in token_counts],
            seq_len=self.seq_len, max_samples=self.max_samples,
            patch_size=list(self.module.patch_size), head_dim=HEAD_DIM, fps=fps,
        )

    def _groups(self, videos, token_counts):
        """Split a request into budget-fitting groups (serving-side
        batching; the training packer handles this on its own stream)."""
        import math as _math

        from titok_tpu.data.packing import video_dims

        ps = list(self.module.patch_size)
        groups, cur, cur_len = [], [], 0
        for i, (v, tc) in enumerate(zip(videos, token_counts)):
            dims = video_dims(np.asarray(v))
            cost = _math.prod(d // p for d, p in zip(dims, ps)) + int(tc)
            if cost > self.seq_len:
                raise ValueError(
                    f"clip {i} needs {cost} slots > budget {self.seq_len}"
                )
            if cur and (cur_len + cost > self.seq_len
                        or len(cur) >= self.max_samples):
                groups.append(cur)
                cur, cur_len = [], 0
            cur.append(i)
            cur_len += cost
        if cur:
            groups.append(cur)
        return groups

    # -- reference-parity public API --------------------------------------
    def encode(self, videos, token_counts, split_indices: bool = True):
        """Videos -> per-sample int32 codebook indices (ref ``titok.py:47-52``)."""
        per_sample: list = [None] * len(videos)
        for group in self._groups(videos, token_counts):
            batch = self._pack([videos[i] for i in group],
                               [token_counts[i] for i in group])
            _, aux = self._jit_forward(
                self.params, self.vq_state, batch.device_arrays()
            )
            idx = np.asarray(aux["indices"])
            for j, i in enumerate(group):
                per_sample[i] = unpack_indices(idx, batch)[j]
        if split_indices:
            return per_sample
        return np.concatenate(per_sample)

    def decode_indices(self, indices, grids, token_counts=None):
        """Indices + pixel-space grids -> list of CTHW videos
        (ref ``titok.py:54-62``). ``indices`` is either a list of per-sample
        index arrays, or one flat array with ``token_counts`` given."""
        if token_counts is not None:
            flat_in = np.asarray(indices, np.int32)
            splits = np.cumsum(token_counts)[:-1]
            indices = np.split(flat_in, splits)
        token_counts = [len(i) for i in indices]
        ps = list(self.module.patch_size)
        videos = [
            np.zeros([self.module.in_channels] + [int(g) for g in grid], np.float32)
            for grid in grids
        ]
        from titok_tpu.data.packing import sample_offsets

        out: list = [None] * len(videos)
        for group in self._groups(videos, token_counts):
            batch = self._pack([videos[i] for i in group],
                               [token_counts[i] for i in group])
            # place the provided indices at their token slots
            offs = sample_offsets(batch.token_counts, batch.grid_sizes)
            flat = np.zeros((batch.seq_len,), np.int32)
            for j, i in enumerate(group):
                flat[offs[j] : offs[j] + len(indices[i])] = np.asarray(
                    indices[i], np.int32
                )
            recon = self._jit_decode_indices(
                self.params, self.vq_state, flat, batch.device_arrays()
            )
            vids = unpack_videos(np.asarray(recon, np.float32), batch, ps)
            for j, i in enumerate(group):
                out[i] = vids[j]
        return out

    def forward(self, videos, token_counts):
        """Videos -> (reconstructions, {'indices': per-sample list})
        (ref ``titok.py:68-74``)."""
        out: list = [None] * len(videos)
        idx_out: list = [None] * len(videos)
        for group in self._groups(videos, token_counts):
            batch = self._pack([videos[i] for i in group],
                               [token_counts[i] for i in group])
            recon, aux = self._jit_forward(
                self.params, self.vq_state, batch.device_arrays()
            )
            vids = unpack_videos(np.asarray(recon, np.float32), batch,
                                 list(self.module.patch_size))
            idxs = unpack_indices(np.asarray(aux["indices"]), batch)
            for j, i in enumerate(group):
                out[i] = vids[j]
                idx_out[i] = idxs[j]
        return out, {"indices": idx_out}

    __call__ = forward
