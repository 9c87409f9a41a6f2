"""Pallas fused pairwise-L2 distance + argmin for VQ codebook lookup.

Nearest-neighbor search ``argmin_n ||z_s - c_n||²`` for ``z [S, D]``
against a codebook ``c [N, D]``. The naive XLA path materializes the
``[S, N]`` distance matrix (6144 × 16384 × 4B = 400 MB for the 16k
ablation) — pure HBM traffic. This kernel blocks over the codebook axis
and keeps a running (min, argmin) pair in VMEM, so HBM sees only
``z``, ``c`` and the ``[S]`` outputs, while the ``-2 z·cᵀ`` term rides
the MXU.

Distances use the expansion ``|z|² - 2 z·cᵀ + |c|²``; |z|² is constant
per row and dropped (argmin-invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(z_ref, c_ref, cn_ref, idx_ref, dist_ref, min_s, arg_s, *, block_n, n_n):
    jn = pl.program_id(1)

    @pl.when(jn == 0)
    def _init():
        min_s[...] = jnp.full_like(min_s, jnp.inf)
        arg_s[...] = jnp.zeros_like(arg_s)

    z = z_ref[...]                      # [Bs, D]
    c = c_ref[...]                      # [Bn, D]
    cn = cn_ref[...]                    # [1, Bn] codebook squared norms
    # -2 z c^T + |c|^2  (row-constant |z|^2 omitted). Full f32 precision:
    # the MXU's default bf16 passes flip near-tie assignments, which must
    # be deterministic for token-ID stability.
    d = cn - 2.0 * jax.lax.dot_general(
        z, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Bs, Bn]

    local_min = jnp.min(d, axis=1, keepdims=True)          # [Bs, 1]
    local_arg = jnp.argmin(d, axis=1).reshape(-1, 1)       # [Bs, 1]
    local_arg = local_arg + jn * block_n

    better = local_min < min_s[...]
    arg_s[...] = jnp.where(better, local_arg.astype(jnp.int32), arg_s[...])
    min_s[...] = jnp.where(better, local_min, min_s[...])

    @pl.when(jn == n_n - 1)
    def _finish():
        idx_ref[...] = arg_s[...]
        dist_ref[...] = min_s[...]


def vq_nearest_pallas(z: jnp.ndarray, codebook: jnp.ndarray,
                      block_s: int = 1024, block_n: int = 1024):
    """(indices int32 [S], partial_dists f32 [S]) for z [S, D], cb [N, D]."""
    S, D = z.shape
    N = codebook.shape[0]
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    bn = min(block_n, N)
    while N % bn:
        bn //= 2

    cnorm = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1).reshape(1, N)

    idx, dist = pl.pallas_call(
        functools.partial(_vq_kernel, block_n=bn, n_n=N // bn),
        grid=(S // bs, N // bn),
        in_specs=[
            pl.BlockSpec((bs, D), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((bs, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bs, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, 1), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(z.astype(jnp.float32), codebook.astype(jnp.float32), cnorm)
    return idx[:, 0], dist[:, 0]


def vq_nearest_reference(z: jnp.ndarray, codebook: jnp.ndarray):
    """Dense XLA fallback (materializes [S, N])."""
    zf = z.astype(jnp.float32)
    cf = codebook.astype(jnp.float32)
    d = (
        jnp.sum(cf**2, axis=1)[None, :]
        - 2.0 * zf @ cf.T
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32), jnp.min(d, axis=1)


def vq_nearest(z, codebook, impl: str = "auto"):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
    if impl == "pallas":
        return vq_nearest_pallas(z, codebook)
    return vq_nearest_reference(z, codebook)


def vq_nearest_cp(z, codebook, mesh, axis: str = "seq", impl: str = "auto"):
    """Sequence-sharded nearest neighbor for context parallelism.

    Per-row argmin depends only on that row and the (replicated) codebook,
    so the kernel is embarrassingly parallel along the packed [S] axis:
    each chip runs it on its local rows inside ``shard_map`` with zero
    collectives. This is what makes the EMA-VQ family CP-compatible — the
    EMA statistics downstream (one-hot counts/sums) are contractions over
    S that the SPMD partitioner reduces with a psum on its own."""
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        functools.partial(vq_nearest, impl=impl),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(z, codebook)
