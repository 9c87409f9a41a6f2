"""A PyTorch mirror of the reference TiTok forward, for golden parity tests.

Rebuilds the reference's math (``model/base/transformer.py``,
``model/base/blocks.py``, ``model/titok.py``) with plain torch ops — the
reference itself is not importable here because it hard-requires CUDA
flash-attn/triton/xformers. The reference's RoPE and FSQ **are** importable
and are used directly, so those stay golden. Weights are injected from the
flax param tree, giving an end-to-end cross-framework check of every layer.
"""

from __future__ import annotations

import math
import sys

import numpy as np
import torch
import torch.nn.functional as F

from tests.conftest import REFERENCE

sys.path.insert(0, REFERENCE)
from model.base.rope import RoPE as RefRoPE, apply_rotary_emb as ref_apply_rope  # noqa: E402
from model.quantizer.fsq import FSQ as RefFSQ  # noqa: E402


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, np.float32))


def rms_norm(x, weight, eps=1e-5):
    xf = x.float()
    out = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + eps)
    return (out * weight.float()).to(x.dtype)


def attn_forward(p, x, freqs_cis, cu_seqlens, q_heads, kv_heads):
    """Reference Attn.forward (transformer.py:85-104) with torch sdpa
    per packed sample instead of flash_attn_varlen."""
    dim = x.shape[-1]
    head_dim = dim // q_heads
    gqa_dim = head_dim * kv_heads

    x = rms_norm(x, t(p["pre_ln"]["weight"]))
    qkv = x @ t(p["to_qkv"]["kernel"])  # flax kernel is [in, out]
    q, gate, k, v = torch.split(qkv, [dim, dim, gqa_dim, gqa_dim], dim=-1)
    L = x.shape[0]
    q = q.reshape(L, q_heads, head_dim)
    k = k.reshape(L, kv_heads, head_dim)
    v = v.reshape(L, kv_heads, head_dim)

    q = ref_apply_rope(q.clone(), freqs_cis)
    k = ref_apply_rope(k.clone(), freqs_cis)

    rep = q_heads // kv_heads
    k = k.repeat_interleave(rep, dim=1)
    v = v.repeat_interleave(rep, dim=1)

    out = torch.zeros(L, q_heads, head_dim)
    for a, b in zip(cu_seqlens[:-1], cu_seqlens[1:]):
        qs = q[a:b].transpose(0, 1)  # [H, l, D]
        ks = k[a:b].transpose(0, 1)
        vs = v[a:b].transpose(0, 1)
        o = F.scaled_dot_product_attention(qs, ks, vs)
        out[a:b] = o.transpose(0, 1)

    out = out.reshape(L, dim) * torch.sigmoid(gate)
    return out @ t(p["out_proj"]["kernel"])


def geglu_forward(p, x, dim, mult=4, mult_of=32):
    x = rms_norm(x, t(p["norm"]["weight"]))
    h = x @ t(p["w12"]["kernel"])
    x1, gate = h.chunk(2, dim=-1)
    h = F.gelu(gate) * x1
    return h @ t(p["w3"]["kernel"])


def blocks_forward(p, x, freqs_cis, cu_seqlens, num_layers, q_heads, kv_heads):
    alpha = num_layers * 2
    for i in range(num_layers):
        attn_p = p[f"attn_{i}"]
        ffd_p = p[f"ffd_{i}"]
        if i == 0:
            x = x + attn_forward(attn_p, x, freqs_cis, cu_seqlens, q_heads, kv_heads)
            x = x + geglu_forward(ffd_p, x, x.shape[-1])
        else:
            x = alpha * x + attn_forward(attn_p, x, freqs_cis, cu_seqlens,
                                         q_heads, kv_heads)
            x = rms_norm(x, t(p[f"attn_post_ln_{i - 1}"]["weight"]))
            x = alpha * x + geglu_forward(ffd_p, x, x.shape[-1])
            x = rms_norm(x, t(p[f"ffd_post_ln_{i - 1}"]["weight"]))
    return x


def _layout(videos, token_counts, patch_size):
    """grids, cu_seqlens, mask (ref blocks.py:80-86) + freqs."""
    grids = torch.tensor(
        [[s // p for s, p in zip(v.shape[1:], patch_size)] for v in videos],
        dtype=torch.int32,
    )
    grid_sizes = grids.prod(dim=-1)
    tcs = torch.tensor(token_counts, dtype=torch.int32)
    seq_lens = grid_sizes + tcs
    cu = [0]
    for l in seq_lens.tolist():
        cu.append(cu[-1] + l)
    mask = torch.zeros(cu[-1], dtype=torch.bool)
    for b in range(len(videos)):
        mask[cu[b] : cu[b] + int(tcs[b])] = True
    return grids, tcs, cu, mask


def patchify_torch(v, patch_size):
    from einops import rearrange

    p0, p1, p2 = patch_size
    return rearrange(v, "c (d0 p0) (d1 p1) (d2 p2) -> (d0 d1 d2) (p0 p1 p2 c)",
                     p0=p0, p1=p1, p2=p2)


def encoder_forward(params, videos, token_counts, patch_size, model_dims):
    """Reference TiTokEncoder.forward (blocks.py:71-104)."""
    width, num_layers, (q_heads, kv_heads) = model_dims
    grids, tcs, cu, mask = _layout(videos, token_counts, patch_size)
    rope = RefRoPE(head_dim=width // q_heads, grid_dims=len(patch_size))
    freqs = rope(grids, tcs, torch.device("cpu"))

    patches = torch.cat([patchify_torch(t(v), patch_size) for v in videos], 0)
    patches = patches @ t(params["proj_in"]["kernel"]) + t(params["proj_in"]["bias"])

    mt = t(params["mask_token"])  # [1, 1]
    L = mask.shape[0]
    x = torch.zeros(L, width)
    x[mask] = rms_norm(mt.expand(-1, width), t(params["ln_pre_t"]["weight"]))
    x[~mask] = rms_norm(patches + mt, t(params["ln_pre_p"]["weight"]))

    x = blocks_forward(params["model_layers"], x, freqs, cu, num_layers,
                       q_heads, kv_heads)
    tokens = x[mask]
    tokens = rms_norm(tokens, t(params["ln_post"]["weight"]))
    return tokens @ t(params["proj_out"]["kernel"]) + t(params["proj_out"]["bias"])


def decoder_forward(params, tokens, token_counts, grids_px, patch_size,
                    model_dims, out_channels=3):
    """Reference TiTokDecoder.forward (blocks.py:148-177)."""
    width, num_layers, (q_heads, kv_heads) = model_dims
    videos_fake = [np.zeros([out_channels] + list(g)) for g in grids_px]
    grids, tcs, cu, mask = _layout(videos_fake, token_counts, patch_size)
    rope = RefRoPE(head_dim=width // q_heads, grid_dims=len(patch_size))
    freqs = rope(grids, tcs, torch.device("cpu"))

    tk = tokens @ t(params["proj_in"]["kernel"]) + t(params["proj_in"]["bias"])
    mt = t(params["mask_token"])
    L = mask.shape[0]
    x = torch.zeros(L, width)
    x[mask] = rms_norm(tk + mt, t(params["ln_pre_t"]["weight"]))
    x[~mask] = rms_norm(mt.expand(-1, width), t(params["ln_pre_p"]["weight"]))

    x = blocks_forward(params["model_layers"], x, freqs, cu, num_layers,
                       q_heads, kv_heads)
    patches = x[~mask]
    patches = rms_norm(patches, t(params["ln_post"]["weight"]))
    patches = patches @ t(params["proj_out"]["kernel"]) + t(params["proj_out"]["bias"])

    from einops import rearrange

    outs = []
    off = 0
    p0, p1, p2 = patch_size
    for g in grids.tolist():
        n = g[0] * g[1] * g[2]
        outs.append(rearrange(
            patches[off : off + n],
            "(d0 d1 d2) (p0 p1 p2 c) -> c (d0 p0) (d1 p1) (d2 p2)",
            d0=g[0], d1=g[1], d2=g[2], p0=p0, p1=p1, p2=p2,
        ))
        off += n
    return outs


def titok_forward(flax_params, videos, token_counts, patch_size, fsq_levels,
                  model_dims):
    """Reference TiTok.forward (titok.py:68-74) with reference FSQ."""
    with torch.no_grad():
        z = encoder_forward(flax_params["encoder"], videos, token_counts,
                            patch_size, model_dims)
        fsq = RefFSQ(list(fsq_levels))
        codes, aux = fsq(z)
        grids_px = [v.shape[1:] for v in videos]
        recon = decoder_forward(flax_params["decoder"], codes, token_counts,
                                grids_px, patch_size, model_dims)
    return recon, aux["indices"]
