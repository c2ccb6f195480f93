"""DINOv2 ViT backbone (VGGT patch embed), JAX.

Behavioral reference: /root/reference/vggt/vggt/layers/vision_transformer.py
(vit_large: 1024d, 24 blocks, 16 heads, GELU MLP, LayerScale init 1.0) and
layers/block.py / attention.py. Tokens: [cls | pos-added patches], register
tokens inserted after cls WITHOUT position embedding (:214-226); pos embed
bicubically interpolated to the patch grid (:180-212); output is the final
LayerNorm's patch tokens (x_norm_patchtokens).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class DinoViTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    layerscale_init: float = 1.0
    eps: float = 1e-6

    @classmethod
    def vit_large(cls) -> "DinoViTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "DinoViTConfig":
        return cls(img_size=28, patch_size=14, embed_dim=32, depth=2,
                   num_heads=2, num_register_tokens=2)


def _vit_block_init(key, dim, heads, mlp_ratio, ls_init, dtype, qk_norm=False,
                    head_dim=None):
    ks = P.split_keys(key, 4)
    hd = head_dim or dim // heads
    p = {
        "norm1": P.layer_norm_init(dim, dtype=dtype),
        "qkv": P.dense_init(ks[0], dim, dim * 3, dtype=dtype),
        "proj": P.dense_init(ks[1], dim, dim, dtype=dtype),
        "ls1": {"gamma": jnp.full((dim,), ls_init, dtype)},
        "norm2": P.layer_norm_init(dim, dtype=dtype),
        "fc1": P.dense_init(ks[2], dim, int(dim * mlp_ratio), dtype=dtype),
        "fc2": P.dense_init(ks[3], int(dim * mlp_ratio), dim, dtype=dtype),
        "ls2": {"gamma": jnp.full((dim,), ls_init, dtype)},
    }
    if qk_norm:
        p["q_norm"] = P.layer_norm_init(hd, dtype=dtype)
        p["k_norm"] = P.layer_norm_init(hd, dtype=dtype)
    return p


def vit_block_forward(p, x, heads, *, eps=1e-6, rope_fn=None, qk_norm=False):
    """Pre-LN block with LayerScale (layers/block.py:77-99). rope_fn applies
    2D RoPE to q/k heads [B, S, H, D] when given."""
    b, s, c = x.shape
    hd = c // heads
    h = P.layer_norm(p["norm1"], x, eps=eps)
    qkv = P.dense(p["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(t):
        return t.reshape(b, s, heads, hd)

    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    if qk_norm:
        q = P.layer_norm(p["q_norm"], q, eps=eps)
        k = P.layer_norm(p["k_norm"], k, eps=eps)
    if rope_fn is not None:
        q, k = rope_fn(q), rope_fn(k)
    o = attention(q, k, v).reshape(b, s, c)
    x = x + P.dense(p["proj"], o) * p["ls1"]["gamma"]
    h = P.layer_norm(p["norm2"], x, eps=eps)
    h = P.dense(p["fc2"], jax.nn.gelu(P.dense(p["fc1"], h),
                                      approximate=False))
    return x + h * p["ls2"]["gamma"]


def init_dino_vit(key, cfg: DinoViTConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, cfg.depth + 4)
    g = cfg.img_size // cfg.patch_size
    pdim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch": P.dense_init(ks[0], pdim, cfg.embed_dim, dtype=dtype),
        "cls": (0.02 * jax.random.normal(ks[1], (1, 1, cfg.embed_dim))
                ).astype(dtype),
        "registers": jnp.zeros((1, cfg.num_register_tokens, cfg.embed_dim),
                               dtype),
        "pos": (0.02 * jax.random.normal(ks[2], (1, g * g + 1, cfg.embed_dim))
                ).astype(dtype),
        "blocks": [
            _vit_block_init(ks[3 + i], cfg.embed_dim, cfg.num_heads,
                            cfg.mlp_ratio, cfg.layerscale_init, dtype)
            for i in range(cfg.depth)],
        "norm": P.layer_norm_init(cfg.embed_dim, dtype=dtype),
    }


def _interp_pos_embed(pos, g_h, g_w, dim):
    """Bicubic pos-embed interpolation (:180-212): pos [1, M*M+1, D]."""
    n = pos.shape[1] - 1
    m = int(np.sqrt(n))
    if (g_h, g_w) == (m, m):
        return pos
    cls_pos = pos[:, :1]
    grid = pos[:, 1:].reshape(1, m, m, dim)
    grid = jax.image.resize(grid, (1, g_h, g_w, dim), method="bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, g_h * g_w, dim)], axis=1)


def dino_vit_patch_tokens(params, cfg: DinoViTConfig, images: jnp.ndarray
                          ) -> jnp.ndarray:
    """images [N, 3, H, W] (already ImageNet-normalized by the caller) ->
    x_norm_patchtokens [N, (H/14)*(W/14), embed_dim]."""
    n, _, H, W = images.shape
    ps = cfg.patch_size
    gh, gw = H // ps, W // ps
    x = images.transpose(0, 2, 3, 1)
    x = x.reshape(n, gh, ps, gw, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, gh * gw, ps * ps * 3)
    x = P.dense(params["patch"], x.astype(jnp.float32))

    cls = jnp.broadcast_to(params["cls"].astype(jnp.float32),
                           (n, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos_embed(params["pos"].astype(jnp.float32), gh, gw,
                              cfg.embed_dim)
    regs = jnp.broadcast_to(params["registers"].astype(jnp.float32),
                            (n, cfg.num_register_tokens, cfg.embed_dim))
    x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)

    for blk in params["blocks"]:
        x = vit_block_forward(blk, x, cfg.num_heads, eps=cfg.eps)
    x = P.layer_norm(params["norm"], x, eps=cfg.eps)
    return x[:, 1 + cfg.num_register_tokens:]
