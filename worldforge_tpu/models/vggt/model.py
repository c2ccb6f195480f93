"""VGGT: alternating-attention geometry transformer (aggregator + top).

Behavioral reference: /root/reference/vggt/vggt/models/aggregator.py and
models/vggt.py:

  - DINOv2-L/14 patch embed -> per-frame tokens
  - camera + 4 register tokens, separate params for frame 0 vs the rest
    (slice_expand_and_flatten :308-331)
  - 24 x (frame-attention block over (B*S, P, C) then global-attention
    block over (B, S*P, C)), qk LayerNorm, LayerScale 0.01, 2D RoPE base
    100 on patch tokens (positions+1; special tokens at position 0 get
    identity rotation) (:184-305)
  - per-layer outputs: concat [frame_out || global_out] -> [B,S,P,2C];
    camera head uses the last, DPT heads tap layers {4, 11, 17, 23} —
    only those taps are kept (SURVEY.md §7 hard part 6)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.models.vggt.vit import (DinoViTConfig, _vit_block_init,
                                            dino_vit_patch_tokens,
                                            init_dino_vit, vit_block_forward)

_RESNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_RESNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    rope_freq: float = 100.0
    layerscale_init: float = 0.01
    eps: float = 1e-5   # aggregator Block norm (torch nn.LayerNorm default; the DINOv2 backbone uses its own 1e-6)
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    backbone: DinoViTConfig = dataclasses.field(
        default_factory=DinoViTConfig.vit_large)

    @property
    def patch_start_idx(self) -> int:
        return 1 + self.num_register_tokens

    @classmethod
    def vggt_1b(cls) -> "VGGTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VGGTConfig":
        return cls(img_size=28, embed_dim=32, depth=4, num_heads=2,
                   num_register_tokens=2, intermediate_layer_idx=(0, 1, 2, 3),
                   backbone=DinoViTConfig.tiny())


# ------------------------------------------------------------------ 2D RoPE


def rope2d_rotate(x: jnp.ndarray, pos: jnp.ndarray,
                  freq: float = 100.0) -> jnp.ndarray:
    """VGGT 2D RoPE (layers/rope.py:62-188): half-split features (y-half,
    x-half), each rotated GPT-NeoX style ([-x2, x1] on halves) by its
    coordinate. x: [B, S, H, D]; pos: [S, 2] int (y, x)."""
    b, s, h, d = x.shape
    half = d // 2
    quarter = half // 2
    exponents = np.arange(0, half, 2, dtype=np.float64) / half
    inv = 1.0 / (freq ** exponents)  # [half/2]
    posf = np.asarray(pos, np.float64)
    ang_y = jnp.asarray(posf[:, 0:1] * inv[None], jnp.float32)  # [S, q]
    ang_x = jnp.asarray(posf[:, 1:2] * inv[None], jnp.float32)

    def rot_half(t, ang):
        # t: [B, S, H, half]; angles duplicated: cat((ang, ang), -1)
        cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], -1)[None, :, None]
        sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], -1)[None, :, None]
        t1, t2 = t[..., :quarter], t[..., quarter:]
        rot = jnp.concatenate([-t2, t1], axis=-1)
        return t * cos + rot * sin

    y_feat, x_feat = x[..., :half], x[..., half:]
    return jnp.concatenate([rot_half(y_feat, ang_y), rot_half(x_feat, ang_x)],
                           axis=-1)


def make_positions(gh: int, gw: int, patch_start: int) -> np.ndarray:
    """[patch_start + gh*gw, 2]: zeros for special tokens, (y+1, x+1) for
    patches (aggregator.py:224-229)."""
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    pos = np.stack([yy.ravel() + 1, xx.ravel() + 1], axis=-1)
    return np.concatenate([np.zeros((patch_start, 2), np.int64), pos], axis=0)


# ------------------------------------------------------------------ init


def init_vggt_aggregator(key, cfg: VGGTConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, 2 * cfg.depth + 4)
    frame_blocks, global_blocks = [], []
    for i in range(cfg.depth):
        frame_blocks.append(_vit_block_init(
            ks[2 * i], cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
            cfg.layerscale_init, dtype, qk_norm=True))
        global_blocks.append(_vit_block_init(
            ks[2 * i + 1], cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
            cfg.layerscale_init, dtype, qk_norm=True))
    stack = lambda blocks: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *blocks)
    return {
        "backbone": init_dino_vit(ks[-1], cfg.backbone, dtype),
        "camera_token": (1e-6 * jax.random.normal(
            ks[-2], (1, 2, 1, cfg.embed_dim))).astype(dtype),
        "register_token": (1e-6 * jax.random.normal(
            ks[-3], (1, 2, cfg.num_register_tokens, cfg.embed_dim))
        ).astype(dtype),
        "frame_blocks": stack(frame_blocks),
        "global_blocks": stack(global_blocks),
    }


# ------------------------------------------------------------------ forward


def vggt_aggregator_forward(params, cfg: VGGTConfig, images: jnp.ndarray,
                            taps: Optional[Tuple[int, ...]] = None
                            ) -> Dict[int, jnp.ndarray]:
    """images [B, S, 3, H, W] in [0,1]. Returns {layer_idx: [B,S,P,2C]} for
    layer_idx in taps (default: intermediate taps + final layer)."""
    b, s, _, H, W = images.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    if taps is None:
        taps = tuple(sorted(set(cfg.intermediate_layer_idx)
                            | {cfg.depth - 1}))

    imgs = (images - _RESNET_MEAN[None, None, :, None, None]) \
        / _RESNET_STD[None, None, :, None, None]
    patch_tokens = dino_vit_patch_tokens(params["backbone"], cfg.backbone,
                                         imgs.reshape(b * s, 3, H, W))
    c = cfg.embed_dim

    def expand_special(tok):  # [1, 2, X, C] -> [B*S, X, C]
        first = jnp.broadcast_to(tok[:, 0], (b, 1) + tok.shape[2:]).reshape(
            b, 1, tok.shape[2], c)
        rest = jnp.broadcast_to(tok[:, 1:2], (b, s - 1) + tok.shape[2:]
                                ).reshape(b, s - 1, tok.shape[2], c)
        comb = jnp.concatenate([first, rest], axis=1)
        return comb.reshape(b * s, tok.shape[2], c).astype(jnp.float32)

    cam = expand_special(params["camera_token"])
    reg = expand_special(params["register_token"])
    tokens = jnp.concatenate([cam, reg, patch_tokens], axis=1)  # [B*S, P, C]
    p_tok = tokens.shape[1]

    pos = make_positions(gh, gw, cfg.patch_start_idx)
    rope_fn = lambda t: rope2d_rotate(t, pos, cfg.rope_freq)
    pos_g = np.tile(pos, (s, 1))
    rope_g = lambda t: rope2d_rotate(t, pos_g, cfg.rope_freq)

    def dual_block(tokens, layer):
        fb, gb = layer
        tokens = vit_block_forward(fb, tokens, cfg.num_heads, eps=cfg.eps,
                                   rope_fn=rope_fn, qk_norm=True)
        frame_out = tokens
        glob = tokens.reshape(b, s * p_tok, c)
        glob = vit_block_forward(gb, glob, cfg.num_heads, eps=cfg.eps,
                                 rope_fn=rope_g, qk_norm=True)
        return glob.reshape(b * s, p_tok, c), frame_out

    # segmented scan: one compiled dual-block body; each segment ends at a
    # tap so only the tapped layers' outputs materialize (not all 24 —
    # SURVEY §7 hard part 6)
    stacked = (params["frame_blocks"], params["global_blocks"])
    outputs: Dict[int, jnp.ndarray] = {}
    tap_list = sorted(taps)
    start = 0
    for tap in tap_list:
        seg = jax.tree_util.tree_map(lambda p: p[start:tap + 1], stacked)

        def body(carry, layer):
            out, frame_out = dual_block(carry, layer)
            return out, None

        if tap > start:
            head = jax.tree_util.tree_map(lambda p: p[: tap - start], seg)
            tokens, _ = jax.lax.scan(body, tokens, head)
        last = jax.tree_util.tree_map(lambda p: p[tap - start], seg)
        tokens, frame_out = dual_block(tokens, last)
        outputs[tap] = jnp.concatenate(
            [frame_out.reshape(b, s, p_tok, c),
             tokens.reshape(b, s, p_tok, c)], axis=-1)
        start = tap + 1
    return outputs
