"""Weight-sharing torch mirror of the V-JEPA encoder + attentive pooler —
validation harness for ``titok_tpu/metrics/vjepa.py`` (same role as
``torch_i3d_mirror.py``: no jepa source or weights exist on this image, so
the JAX port is golden-tested against an independent torch implementation
of the identical spec; facebookresearch/jepa
``src/models/vision_transformer.py`` + ``src/models/attentive_pooler.py``
layout, which is what the reference's JEDi runs — reference
``model/metrics/jedi.py:19-21,78-99``).

The state-dict names intentionally match a real jepa checkpoint's (after
prefix stripping) so ``tools/convert_vjepa.py`` is exercised by the golden
test and will map real ``vitl16.pth.tar``/``ssv2-probe.pth.tar`` files
unchanged.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def torch_sincos_1d(embed_dim: int, pos: torch.Tensor) -> torch.Tensor:
    omega = torch.arange(embed_dim // 2, dtype=torch.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    out = pos.double()[:, None] * omega[None]
    return torch.cat([out.sin(), out.cos()], dim=1)


def torch_3d_sincos(embed_dim: int, gd: int, gh: int, gw: int,
                    uniform_power: bool = True) -> torch.Tensor:
    if uniform_power:
        dd = dh = dw = int(math.ceil(embed_dim / 6) * 2)
    else:
        dd, dh, dw = embed_dim // 2, embed_dim // 4, embed_dim // 4
    ed = torch_sincos_1d(dd, torch.arange(gd))
    eh = torch_sincos_1d(dh, torch.arange(gh))
    ew = torch_sincos_1d(dw, torch.arange(gw))
    out = torch.cat(
        [
            ed[:, None, None, :].expand(gd, gh, gw, dd),
            eh[None, :, None, :].expand(gd, gh, gw, dh),
            ew[None, None, :, :].expand(gd, gh, gw, dw),
        ],
        dim=-1,
    ).reshape(gd * gh * gw, -1)
    return out[:, :embed_dim].float()


class TorchMlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TorchAttention(nn.Module):
    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(out)


class TorchBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchPatchEmbed3D(nn.Module):
    """jepa PatchEmbed3D: the conv lives at ``.proj`` (state-dict key
    ``patch_embed.proj.weight`` in real checkpoints)."""

    def __init__(self, spec):
        super().__init__()
        self.proj = nn.Conv3d(
            3, spec.embed_dim,
            kernel_size=(spec.tubelet_size, spec.patch_size,
                         spec.patch_size),
            stride=(spec.tubelet_size, spec.patch_size, spec.patch_size),
        )

    def forward(self, x):
        return self.proj(x)


class TorchVJEPAEncoder(nn.Module):
    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        self.patch_embed = TorchPatchEmbed3D(spec)
        self.blocks = nn.ModuleList(
            [TorchBlock(spec.embed_dim, spec.num_heads, spec.mlp_ratio)
             for _ in range(spec.depth)]
        )
        self.norm = nn.LayerNorm(spec.embed_dim, eps=1e-6)
        self.register_buffer(
            "pos_embed",
            torch_3d_sincos(spec.embed_dim, *spec.grid,
                            uniform_power=spec.uniform_power),
            persistent=False,
        )

    def forward(self, x_nthwc):
        s = self.spec
        x = x_nthwc.permute(0, 4, 1, 2, 3)  # NCTHW
        x = self.patch_embed(x)  # [B, D, T', H', W']
        b, d, t, h, w = x.shape
        pos = self.pos_embed
        if (t, h, w) != s.grid:
            vol = pos.reshape(1, *s.grid, -1).permute(0, 4, 1, 2, 3)
            vol = F.interpolate(vol, size=(t, h, w), mode="trilinear",
                                align_corners=False)
            pos = vol.permute(0, 2, 3, 4, 1).reshape(t * h * w, -1)
        x = x.flatten(2).transpose(1, 2)  # [B, N, D], t-outer
        x = x + pos[None]
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class TorchCrossAttention(nn.Module):
    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, 2 * dim, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, q, x):
        b, nq, d = q.shape
        n = x.shape[1]
        hd = d // self.num_heads
        qh = self.q(q).reshape(b, nq, self.num_heads, hd).permute(0, 2, 1, 3)
        kv = self.kv(x).reshape(b, n, 2, self.num_heads, hd)
        k, v = kv.permute(2, 0, 3, 1, 4)
        attn = (qh @ k.transpose(-2, -1)) / math.sqrt(hd)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, nq, d)
        return self.proj(out)


class TorchCrossAttentionBlock(nn.Module):
    """jepa CrossAttentionBlock: the kv side is normed (norm1 on x), the
    residual stream is the raw query."""

    def __init__(self, spec):
        super().__init__()
        self.norm1 = nn.LayerNorm(spec.embed_dim, eps=1e-6)
        self.xattn = TorchCrossAttention(spec.embed_dim, spec.num_heads)
        self.norm2 = nn.LayerNorm(spec.embed_dim, eps=1e-6)
        self.mlp = TorchMlp(spec.embed_dim,
                            int(spec.embed_dim * spec.mlp_ratio))

    def forward(self, q, x):
        q = q + self.xattn(q, self.norm1(x))
        return q + self.mlp(self.norm2(q))


class TorchAttentivePooler(nn.Module):
    """jepa AttentivePooler at probe depth 1 (the SSv2 probe): one
    cross-attention block, no extra self-attention blocks."""

    def __init__(self, spec):
        super().__init__()
        self.query_tokens = nn.Parameter(torch.zeros(1, 1, spec.embed_dim))
        self.cross_attention_block = TorchCrossAttentionBlock(spec)

    def forward(self, tokens):
        q = self.query_tokens.expand(tokens.shape[0], -1, -1)
        return self.cross_attention_block(q, tokens)[:, 0]


class TorchVJEPAFeatures(nn.Module):
    def __init__(self, spec):
        super().__init__()
        self.encoder = TorchVJEPAEncoder(spec)
        self.pooler = TorchAttentivePooler(spec)

    def forward(self, x_nthwc):
        return self.pooler(self.encoder(x_nthwc))
