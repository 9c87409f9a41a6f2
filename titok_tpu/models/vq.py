"""EMA vector quantizer (VQ-VAE style) with commitment loss and dead-code
tracking — the quantizer family alternative to FSQ.

Nearest-neighbor codebook lookup (pairwise L2 + argmin via the Pallas
kernel in ``titok_tpu/ops/vq_distance.py``), straight-through estimator,
and exponential-moving-average codebook updates with Laplace smoothing
(van den Oord et al. 2017 appendix / Razavi et al. 2019):

    N_i   <- decay * N_i + (1 - decay) * count_i
    m_i   <- decay * m_i + (1 - decay) * sum_of_assigned_z_i
    c_i   <- m_i / N_i_smoothed

The EMA state lives in :class:`VQState` inside the TrainState (it is not a
gradient-trained parameter); :func:`ema_update` is applied once per train
step after the optimizer. Dead codes (EMA count below ``dead_threshold``)
are reseeded from random batch latents.

fp32 throughout (like FSQ — quantization boundaries must not move with
bf16 noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from titok_tpu.ops.vq_distance import vq_nearest


class VQState(struct.PyTreeNode):
    codebook: jnp.ndarray    # [N, D] f32
    ema_counts: jnp.ndarray  # [N] f32
    ema_sums: jnp.ndarray    # [N, D] f32

    @property
    def codebook_size(self) -> int:
        return self.codebook.shape[0]


def init_vq_state(rng, codebook_size: int, dim: int, scale: float = 1.0) -> VQState:
    cb = jax.random.normal(rng, (codebook_size, dim), jnp.float32) * scale
    return VQState(
        codebook=cb,
        ema_counts=jnp.ones((codebook_size,), jnp.float32),
        ema_sums=cb.copy(),
    )


class EMAVQ:
    """Stateless codec over a VQState (mirrors the FSQ class interface)."""

    def __init__(self, codebook_size: int, dim: int,
                 commitment_weight: float = 0.25, decay: float = 0.99,
                 eps: float = 1e-5, dead_threshold: float = 1e-3,
                 impl: str = "auto", cp_mesh=None, cp_axis: str = "seq"):
        self.codebook_size = int(codebook_size)
        self.codebook_dim = int(dim)
        self.commitment_weight = float(commitment_weight)
        self.decay = float(decay)
        self.eps = float(eps)
        self.dead_threshold = float(dead_threshold)
        self.impl = impl
        # context parallelism: run the lookup per seq shard inside
        # shard_map (titok_tpu/ops/vq_distance.vq_nearest_cp) — rows are
        # independent and the codebook is replicated
        self.cp_mesh = cp_mesh
        self.cp_axis = cp_axis

    # -- forward ----------------------------------------------------------
    def __call__(self, z: jnp.ndarray, state: VQState,
                 weights: jnp.ndarray | None = None):
        """Quantize ``[S, D]`` latents.

        ``weights`` (optional f32 [S], e.g. valid-token mask) scopes the
        EMA statistics and losses to real slots.

        Returns (codes, aux) with aux carrying indices, commit loss, EMA
        batch stats, and perplexity.
        """
        orig_dtype = z.dtype
        zf = z.astype(jnp.float32)
        cb = jax.lax.stop_gradient(state.codebook)

        if self.cp_mesh is not None:
            from titok_tpu.ops.vq_distance import vq_nearest_cp

            indices, _ = vq_nearest_cp(
                jax.lax.stop_gradient(zf), cb, self.cp_mesh,
                axis=self.cp_axis, impl=self.impl,
            )
        else:
            indices, _ = vq_nearest(jax.lax.stop_gradient(zf), cb,
                                    impl=self.impl)
        quantized = cb[indices]  # [S, D]

        S = zf.shape[0]
        w = jnp.ones((S,), jnp.float32) if weights is None else weights.astype(jnp.float32)

        # commitment: ||z - sg(q)||^2 (codebook side handled by EMA)
        commit = jnp.sum(((zf - quantized) ** 2).mean(-1) * w) / jnp.maximum(
            w.sum(), 1.0
        )

        # straight-through
        codes = zf + jax.lax.stop_gradient(quantized - zf)

        # batch EMA statistics via scatter-add: the one-hot formulation
        # would materialize [S, N] in HBM (6144 x 16384 x 4B = 400 MB for
        # the 16k codebook) for a trivial matmul; scatter touches only
        # [N] + [N, D] outputs and S x D inputs
        zs = jax.lax.stop_gradient(zf)
        counts = jnp.zeros((self.codebook_size,), jnp.float32).at[indices].add(w)
        sums = jnp.zeros((self.codebook_size, self.codebook_dim),
                         jnp.float32).at[indices].add(zs * w[:, None])

        probs = counts / jnp.maximum(counts.sum(), 1.0)
        entropy = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
        aux = {
            "indices": indices.astype(jnp.int32),
            "commit_loss": commit * self.commitment_weight,
            "vq_counts": counts,
            "vq_sums": sums,
            "perplexity": jnp.exp(entropy),
        }
        return codes.astype(orig_dtype), aux

    # -- EMA codebook update (called once per step, post-optimizer) --------
    def ema_update(self, state: VQState, counts: jnp.ndarray,
                   sums: jnp.ndarray, rng: jnp.ndarray | None = None,
                   batch_z: jnp.ndarray | None = None) -> VQState:
        d = self.decay
        new_counts = d * state.ema_counts + (1 - d) * counts
        new_sums = d * state.ema_sums + (1 - d) * sums

        n = new_counts.sum()
        smoothed = (new_counts + self.eps) / (n + self.codebook_size * self.eps) * n
        codebook = new_sums / smoothed[:, None]

        if rng is not None and batch_z is not None:
            # dead-code reinit: reseed starved codes from random batch latents
            dead = new_counts < self.dead_threshold
            pick = jax.random.randint(
                rng, (self.codebook_size,), 0, batch_z.shape[0]
            )
            repl = jax.lax.stop_gradient(batch_z.astype(jnp.float32))[pick]
            codebook = jnp.where(dead[:, None], repl, codebook)
            new_sums = jnp.where(dead[:, None], repl, new_sums)
            new_counts = jnp.where(dead, jnp.ones_like(new_counts), new_counts)

        return VQState(codebook=codebook, ema_counts=new_counts,
                       ema_sums=new_sums)

    # -- codec (FSQ-interface parity) --------------------------------------
    def indices_to_codes(self, indices: jnp.ndarray, state: VQState) -> jnp.ndarray:
        return state.codebook[indices]

    def dead_code_fraction(self, state: VQState) -> jnp.ndarray:
        return (state.ema_counts < self.dead_threshold).mean()
