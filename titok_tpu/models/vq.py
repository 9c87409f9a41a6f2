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
step after the optimizer. Dead codes (no hit for ``dead_steps``
consecutive steps) are reseeded from random valid batch latents; the
codebook itself is initialized from the first batch's latents
(:func:`init_vq_state_from_latents`) — both guards against the cold-start
usage collapse observed with a scale-mismatched random codebook.

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
    ages: jnp.ndarray        # [N] f32, consecutive steps without a hit

    @property
    def codebook_size(self) -> int:
        return self.codebook.shape[0]


def init_vq_state(rng, codebook_size: int, dim: int, scale: float = 1.0) -> VQState:
    cb = jax.random.normal(rng, (codebook_size, dim), jnp.float32) * scale
    return VQState(
        codebook=cb,
        ema_counts=jnp.ones((codebook_size,), jnp.float32),
        ema_sums=cb.copy(),
        ages=jnp.zeros((codebook_size,), jnp.float32),
    )


def init_vq_state_from_latents(rng, z: jnp.ndarray, weights: jnp.ndarray,
                               codebook_size: int,
                               jitter: float = 0.05) -> VQState:
    """Data-dependent codebook init: rows sampled (with replacement) from
    the first batch's *valid* encoder latents, plus per-dim relative
    jitter so duplicated picks separate.

    A scale-mismatched random codebook collapses EMA-VQ at cold start:
    every latent maps to the single nearest code, the commitment loss
    glues the encoder to it within ~25 steps, and dead-code revival
    (which can only fire once EMA counts decay below threshold, ~700
    steps at decay 0.99) then reseeds from already-collapsed latents —
    observed live on the base-vq run. Seeding from the latent
    distribution makes usage spread from step 0.
    """
    zf = jax.lax.stop_gradient(jnp.asarray(z, jnp.float32))
    w = jnp.asarray(weights, jnp.float32)
    p = w / jnp.maximum(w.sum(), 1.0)
    k_pick, k_noise = jax.random.split(rng)
    pick = jax.random.choice(k_pick, zf.shape[0], (codebook_size,), p=p)
    cb = zf[pick]
    mean = (zf * p[:, None]).sum(0)
    std = jnp.sqrt(jnp.maximum(
        ((zf - mean) ** 2 * p[:, None]).sum(0), 1e-12))
    cb = cb + jitter * std * jax.random.normal(k_noise, cb.shape,
                                               jnp.float32)
    return VQState(
        codebook=cb,
        ema_counts=jnp.ones((codebook_size,), jnp.float32),
        ema_sums=cb.copy(),
        ages=jnp.zeros((codebook_size,), jnp.float32),
    )


class EMAVQ:
    """Stateless codec over a VQState (mirrors the FSQ class interface)."""

    def __init__(self, codebook_size: int, dim: int,
                 commitment_weight: float = 0.25, decay: float = 0.99,
                 eps: float = 1e-5, dead_steps: int = 256,
                 entropy_weight: float = 0.0, entropy_tau: float = 0.2,
                 impl: str = "auto", cp_mesh=None, cp_axis: str = "seq"):
        self.codebook_size = int(codebook_size)
        self.codebook_dim = int(dim)
        self.commitment_weight = float(commitment_weight)
        self.decay = float(decay)
        self.eps = float(eps)
        self.dead_steps = int(dead_steps)
        self.entropy_weight = float(entropy_weight)
        self.entropy_tau = float(entropy_tau)
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
        if self.entropy_weight > 0:
            aux["entropy_loss"] = (
                self.entropy_weight * self._entropy_loss(zf, cb, w)
            )
        return codes.astype(orig_dtype), aux

    def _entropy_loss(self, zf: jnp.ndarray, cb: jnp.ndarray,
                      w: jnp.ndarray) -> jnp.ndarray:
        """Soft-assignment entropy regularizer (the MAGVIT-v2 recipe,
        arXiv 2310.05737 §3.1, adapted to EMA-VQ): minimize per-token
        assignment entropy (each token commits to one code) while
        maximizing the entropy of the mean assignment (usage spreads over
        the codebook). The codebook is stop-gradient EMA, so the gradient
        shapes the ENCODER's latent distribution — the part that actually
        collapses (observed live: perplexity pinned at ~6 of 16384 while
        recon trains).

        ``entropy_tau`` is RELATIVE: logits are ``-d² / (tau * s)`` with
        ``s = sg(mean ||z||² + mean ||c||²)``, a scale proxy for typical
        squared distances. An absolute temperature either saturates the
        softmax to an exact one-hot (gradient underflows to zero — seen
        in tests) or washes it out, depending on the latent scale, which
        EMA-VQ does not control.

        Distances are computed in row chunks via ``lax.map`` so the
        [S, N] probability matrix (400 MB at S=6144, N=16k) never
        materializes; peak is [chunk, N].
        """
        S = zf.shape[0]
        chunk = min(512, S)
        pad = (-S) % chunk
        if pad:
            zf = jnp.concatenate(
                [zf, jnp.zeros((pad, zf.shape[1]), zf.dtype)])
            w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
        zc = zf.reshape(-1, chunk, zf.shape[1])
        wc = w.reshape(-1, chunk)
        cb2 = (cb ** 2).sum(-1)
        scale = self.entropy_tau * jax.lax.stop_gradient(
            (zf ** 2).sum(-1).mean() + cb2.mean()) + 1e-12

        def per_chunk(args):
            z_, w_ = args
            d2 = ((z_ ** 2).sum(-1, keepdims=True)
                  - 2.0 * z_ @ cb.T + cb2[None])
            p = jax.nn.softmax(-d2 / scale, axis=-1)
            h_tok = -(p * jnp.log(p + 1e-30)).sum(-1)  # [chunk]
            return (h_tok * w_).sum(), (p * w_[:, None]).sum(0)

        h_sums, p_sums = jax.lax.map(per_chunk, (zc, wc))
        wsum = jnp.maximum(w.sum(), 1.0)
        sharpness = h_sums.sum() / wsum
        mean_p = p_sums.sum(0) / wsum
        diversity = -(mean_p * jnp.log(mean_p + 1e-30)).sum()
        return sharpness - diversity

    # -- EMA codebook update (called once per step, post-optimizer) --------
    def ema_update(self, state: VQState, counts: jnp.ndarray,
                   sums: jnp.ndarray, rng: jnp.ndarray | None = None,
                   batch_z: jnp.ndarray | None = None,
                   batch_w: jnp.ndarray | None = None) -> VQState:
        d = self.decay
        new_counts = d * state.ema_counts + (1 - d) * counts
        new_sums = d * state.ema_sums + (1 - d) * sums
        ages = jnp.where(counts > 0, 0.0, state.ages + 1.0)

        n = new_counts.sum()
        smoothed = (new_counts + self.eps) / (n + self.codebook_size * self.eps) * n
        codebook = new_sums / smoothed[:, None]

        if rng is not None and batch_z is not None:
            # dead-code reinit: a code unused for ``dead_steps``
            # consecutive steps is reseeded from a random batch latent.
            # Age-based (not EMA-count-threshold) detection is scale-free:
            # a count threshold is poisoned by the init value — counts
            # start at 1.0 and take ~log(thr)/log(decay) ≈ 690 steps to
            # decay below 1e-3, far too slow to catch the cold-start
            # collapse observed live on the base-vq run. ``batch_w`` (e.g.
            # token_mask) restricts the reseed pool to valid slots — the
            # packed buffer's non-token rows are garbage.
            dead = ages >= self.dead_steps
            if batch_w is not None:
                wz = batch_w.astype(jnp.float32)
                pick = jax.random.choice(
                    rng, batch_z.shape[0], (self.codebook_size,),
                    p=wz / jnp.maximum(wz.sum(), 1.0),
                )
            else:
                pick = jax.random.randint(
                    rng, (self.codebook_size,), 0, batch_z.shape[0]
                )
            repl = jax.lax.stop_gradient(batch_z.astype(jnp.float32))[pick]
            # revived codes get the fair-share EMA count (NOT 1.0: the
            # equilibrium per-code count is tokens_per_step/N ≪ 1, and an
            # outsized count would skew the codebook average for hundreds
            # of steps)
            fair = jnp.maximum(new_counts.mean(), self.eps)
            codebook = jnp.where(dead[:, None], repl, codebook)
            new_sums = jnp.where(dead[:, None], repl * fair, new_sums)
            new_counts = jnp.where(dead, fair, new_counts)
            ages = jnp.where(dead, 0.0, ages)

        return VQState(codebook=codebook, ema_counts=new_counts,
                       ema_sums=new_sums, ages=ages)

    # -- codec (FSQ-interface parity) --------------------------------------
    def indices_to_codes(self, indices: jnp.ndarray, state: VQState) -> jnp.ndarray:
        return state.codebook[indices]

    def dead_code_fraction(self, state: VQState) -> jnp.ndarray:
        """Leading indicator: fraction of codes unused for at least half
        the revival window (fully dead codes are reseeded inside
        ``ema_update``, so post-update they are always 0)."""
        return (state.ages >= max(self.dead_steps // 2, 1)).mean()
