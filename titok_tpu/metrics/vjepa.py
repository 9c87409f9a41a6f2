"""V-JEPA video ViT + SSv2 attentive probe in JAX — the JEDi feature
extractor, TPU-resident.

The reference computes JEDi with facebookresearch/jepa's V-JEPA encoder
(ViT-L/16 or ViT-H/16, tubelet 2) plus the SSv2 attentive-probe pooler,
auto-downloaded and run through an external ``jepa/`` repo on sys.path
(reference ``model/metrics/jedi.py:4-5,19-70,99``). Zero egress here, so
this is a from-scratch port of that architecture:

- 3D patch embed: Conv3d(3→D, kernel (tubelet,16,16), stride same), token
  order t-outer/h/w-inner (jepa ``src/models/vision_transformer.py``).
- Fixed (non-learned) 3D sin-cos positional embedding; ``uniform_power``
  gives every axis ``ceil(D/6)*2`` channels, trimmed to D (jepa
  ``src/utils/pos_embs.py``). When the input grid differs from the
  pretrain grid the *pretrain-grid* table is trilinearly interpolated —
  NOT recomputed — matching jepa's ``interpolate_pos_encoding``.
- Pre-LN ViT blocks (qkv+proj bias, GELU MLP, LayerNorm eps 1e-6), final
  LayerNorm.
- Attentive pooler (jepa ``src/models/attentive_pooler.py``): one learned
  query, a cross-attention block (q from the query, k/v from LN'd tokens;
  residual + MLP), depth 1 as in the SSv2 probe. JEDi uses the pooled
  [B, D] feature (reference ``jedi.py:99,147``).
- Preprocessing (reference ``jedi.py:103-104,131-141``): [-1,1] → [0,1],
  bicubic short-side resize to 224 **without antialias** (torch
  ``F.interpolate`` semantics, a = -0.75, half-pixel), ImageNet
  normalize, pad to ``frames_per_clip`` by repeating the last frame.

Validation: no jepa weights or source exist on this image, so correctness
is established the same way as the I3D/InceptionV3 ports — a
weight-sharing torch mirror implements the identical spec and the golden
test drives both (``tests/test_vjepa.py``); the bicubic resize is tested
against real ``torch.nn.functional.interpolate``. The converter
(``tools/convert_vjepa.py``) maps real ``vitl16.pth.tar`` +
``ssv2-probe.pth.tar`` checkpoints onto these parameter names the moment
they are staged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class VJEPASpec:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 16
    tubelet_size: int = 2
    frames_per_clip: int = 16
    crop_size: int = 224
    mlp_ratio: float = 4.0
    uniform_power: bool = True  # jepa video configs set this

    @property
    def grid(self) -> tuple[int, int, int]:
        return (self.frames_per_clip // self.tubelet_size,
                self.crop_size // self.patch_size,
                self.crop_size // self.patch_size)


# jepa model family (src/models/vision_transformer.py vit_large/vit_huge)
SPECS = {
    "vit_large": VJEPASpec(embed_dim=1024, depth=24, num_heads=16),
    "vit_huge": VJEPASpec(embed_dim=1280, depth=32, num_heads=16),
    # small spec for tests (not a jepa release size)
    "test_tiny": VJEPASpec(embed_dim=48, depth=2, num_heads=4, patch_size=8,
                           tubelet_size=2, frames_per_clip=4, crop_size=32),
}


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """MAE-style 1D sin-cos table: [len(pos), embed_dim], sin block then
    cos block (jepa ``src/utils/pos_embs.py``
    ``get_1d_sincos_pos_embed_from_grid``)."""
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(embed_dim: int, grid_d: int, grid_h: int,
                            grid_w: int,
                            uniform_power: bool = True) -> np.ndarray:
    """[T*H*W, embed_dim] fixed positional table, t-outer flattening (jepa
    ``src/utils/pos_embs.py get_3d_sincos_pos_embed``). Without
    ``uniform_power`` the depth axis gets D/2 channels and each spatial
    axis D/4; with it every axis gets ceil(D/6)*2, trimmed to D."""
    if uniform_power:
        d_dim = h_dim = w_dim = int(np.ceil(embed_dim / 6) * 2)
    else:
        d_dim, h_dim, w_dim = embed_dim // 2, embed_dim // 4, embed_dim // 4
    emb_d = _sincos_1d(d_dim, np.arange(grid_d))  # [T, d_dim]
    emb_h = _sincos_1d(h_dim, np.arange(grid_h))  # [H, h_dim]
    emb_w = _sincos_1d(w_dim, np.arange(grid_w))  # [W, w_dim]
    out = np.concatenate(
        [
            np.broadcast_to(emb_d[:, None, None, :],
                            (grid_d, grid_h, grid_w, d_dim)),
            np.broadcast_to(emb_h[None, :, None, :],
                            (grid_d, grid_h, grid_w, h_dim)),
            np.broadcast_to(emb_w[None, None, :, :],
                            (grid_d, grid_h, grid_w, w_dim)),
        ],
        axis=-1,
    ).reshape(grid_d * grid_h * grid_w, -1)
    return out[:, :embed_dim].astype(np.float32)


def interpolate_pos_embed(table: jnp.ndarray, src_grid, dst_grid):
    """Trilinearly resample the pretrain-grid table onto the input grid
    (jepa ``interpolate_pos_encoding``; F.interpolate trilinear,
    half-pixel). No-op when the grids match."""
    if tuple(src_grid) == tuple(dst_grid):
        return table
    d = table.shape[-1]
    vol = table.reshape(*src_grid, d)
    out = jax.image.resize(vol, (*dst_grid, d), method="trilinear")
    return out.reshape(-1, d)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class SelfAttention(nn.Module):
    """qkv (bias) → scaled dot attention → proj (bias); jepa Block attn."""

    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, hd), 3, 2)
        q, k, v = (t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, name="proj")(out)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = x + SelfAttention(self.num_heads, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x))
        x = x + Mlp(int(d * self.mlp_ratio), d, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        return x


class VJEPAEncoder(nn.Module):
    """jepa VisionTransformer (video): Conv3d patch embed + fixed 3D
    sin-cos positions + pre-LN blocks + final LN. Input NTHWC in the
    normalized range; returns [B, N, D] tokens."""

    spec: VJEPASpec

    @nn.compact
    def __call__(self, x):
        s = self.spec
        x = nn.Conv(
            s.embed_dim,
            kernel_size=(s.tubelet_size, s.patch_size, s.patch_size),
            strides=(s.tubelet_size, s.patch_size, s.patch_size),
            padding="VALID", name="patch_embed",
        )(x)  # [B, T', H', W', D]
        b, t, h, w, d = x.shape
        x = x.reshape(b, t * h * w, d)
        table = jnp.asarray(get_3d_sincos_pos_embed(
            s.embed_dim, *s.grid, uniform_power=s.uniform_power))
        x = x + interpolate_pos_embed(table, s.grid, (t, h, w))[None]
        for i in range(s.depth):
            x = Block(s.num_heads, s.mlp_ratio, name=f"blocks_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class CrossAttention(nn.Module):
    """Pooler cross-attention: q projects the query tokens, kv the
    sequence (jepa ``attentive_pooler.py CrossAttention``)."""

    num_heads: int

    @nn.compact
    def __call__(self, q, x):
        b, nq, d = q.shape
        n = x.shape[1]
        hd = d // self.num_heads
        qh = nn.Dense(d, name="q")(q).reshape(b, nq, self.num_heads, hd)
        kv = nn.Dense(2 * d, name="kv")(x).reshape(b, n, 2, self.num_heads,
                                                   hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, nq, d)
        return nn.Dense(d, name="proj")(out)


class AttentivePooler(nn.Module):
    """One learned query cross-attends the tokens; residual + MLP
    (``CrossAttentionBlock``; the kv side is LayerNorm'd, the query is
    not — jepa applies norm1 to x only). SSv2 probe depth is 1, so no
    extra self-attention blocks."""

    spec: VJEPASpec

    @nn.compact
    def __call__(self, tokens):
        s = self.spec
        b = tokens.shape[0]
        query = self.param("query_tokens", nn.initializers.zeros,
                           (1, 1, s.embed_dim))
        q = jnp.broadcast_to(query, (b, 1, s.embed_dim))
        y = CrossAttention(s.num_heads, name="xattn")(
            q, nn.LayerNorm(epsilon=1e-6, name="norm1")(tokens))
        q = q + y
        q = q + Mlp(int(s.embed_dim * s.mlp_ratio), s.embed_dim,
                    name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(q))
        return q[:, 0]  # [B, D]


class VJEPAFeatures(nn.Module):
    """Encoder + attentive pooler: normalized NTHWC video → [B, D]."""

    spec: VJEPASpec

    @nn.compact
    def __call__(self, x):
        tokens = VJEPAEncoder(self.spec, name="encoder")(x)
        return AttentivePooler(self.spec, name="pooler")(tokens)


# ---- preprocessing (host, numpy) ------------------------------------------


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution weights, a=-0.75 (torch bicubic)."""
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    w = np.where(
        t <= 1, (a + 2) * t3 - (a + 3) * t2 + 1,
        np.where(t < 2, a * t3 - 5 * a * t2 + 8 * a * t - 4 * a, 0.0),
    )
    return w


def _resize_axis_cubic(x: np.ndarray, axis: int, out_size: int) -> np.ndarray:
    """Separable bicubic resize along one axis, half-pixel centers, no
    antialias — matches ``F.interpolate(mode='bicubic',
    align_corners=False, antialias=False)`` which torchvision's
    ``Resize(..., antialias=False)`` lowers to (reference preprocessing,
    ``jedi.py:103``)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(centers).astype(np.int64)
    offs = np.arange(-1, 3)
    idx = np.clip(base[:, None] + offs[None, :], 0, in_size - 1)  # [O, 4]
    w = _cubic_kernel(centers[:, None] - (base[:, None] + offs[None, :]))
    w = (w / w.sum(axis=1, keepdims=True)).astype(x.dtype)
    moved = np.moveaxis(x, axis, 0)  # [I, ...]
    gathered = moved[idx]  # [O, 4, ...]
    out = np.einsum("of,of...->o...", w, gathered)
    return np.moveaxis(out, 0, axis)


def resize_short_side_bicubic(video_tchw: np.ndarray,
                              target: int) -> np.ndarray:
    """torchvision ``v2.Resize(size=int)``: scale so the SHORT side equals
    ``target``, preserving aspect ratio (both up- and down-scaling)."""
    t, c, h, w = video_tchw.shape
    if h <= w:
        nh, nw = target, max(1, int(round(w * target / h)))
    else:
        nh, nw = max(1, int(round(h * target / w))), target
    out = _resize_axis_cubic(video_tchw, 2, nh)
    return _resize_axis_cubic(out, 3, nw)


def preprocess_bcthw(video_bcthw: np.ndarray, spec: VJEPASpec) -> np.ndarray:
    """Reference ``jedi.py:131-141`` ``get_feats`` preprocessing: [-1,1] →
    [0,1], bicubic short-side resize to crop_size, ImageNet normalize,
    repeat-pad to ``frames_per_clip``. Returns NTHWC float32."""
    v = np.clip(np.asarray(video_bcthw, np.float32), -1, 1)
    v = (v + 1.0) / 2.0
    out = []
    for clip in v:  # CTHW
        x = clip.transpose(1, 0, 2, 3)  # TCHW
        x = resize_short_side_bicubic(x, spec.crop_size)
        x = (x - IMAGENET_MEAN[None, :, None, None]) \
            / IMAGENET_STD[None, :, None, None]
        if x.shape[0] < spec.frames_per_clip:
            pad = np.repeat(x[-1:], spec.frames_per_clip - x.shape[0],
                            axis=0)
            x = np.concatenate([x, pad], axis=0)
        out.append(x.transpose(0, 2, 3, 1))  # THWC
    return np.stack(out).astype(np.float32)


class JaxVJEPAExtractor:
    """``video_bcthw in [-1,1] → [B, D]`` features (drop-in
    ``feature_fn`` for :class:`titok_tpu.metrics.jedi.JEDiMetric`)."""

    def __init__(self, params: dict, model_name: str = "vit_large"):
        self.spec = SPECS[model_name]
        model = VJEPAFeatures(self.spec)
        self._apply = jax.jit(
            lambda p, x: model.apply({"params": p}, x))
        self.params = params

    def __call__(self, video_bcthw: np.ndarray) -> np.ndarray:
        x = preprocess_bcthw(video_bcthw, self.spec)
        return np.asarray(self._apply(self.params, x), np.float32)


def load_vjepa_params(path: str) -> dict:
    """Load converted parameters (``tools/convert_vjepa.py`` output)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params: dict = {}
    for key, val in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return params
