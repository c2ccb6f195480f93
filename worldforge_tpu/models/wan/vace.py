"""VACE: video editing variant of the Wan DiT (context-block adapter).

Behavioral reference: /root/reference/wan_for_worldforge/wan/modules/
vace_model.py:10-250 — a parallel stack of "vace blocks" (WanAttentionBlocks
on every 2nd layer by default, with a zero-init before_proj on block 0 and
zero-init after_proj on all) processes the patched vace_context; each main
block whose index is in vace_layers adds its hint (scaled) after the block.

The generation facade (WanVace, wan/vace.py:37-797) lives in
pipelines/wan_vace.py and the video/mask preprocessor (vace_processor.py)
in io/vace_processor.py; the model here accepts a prepared vace_context
(built from VAE-encoded source video, masks and reference images).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from worldforge_tpu.core.dtypes import Policy, DEFAULT_POLICY
from worldforge_tpu.core import params as P
from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                           init_wan_dit_layer, patchify,
                                           sinusoidal_embedding_1d,
                                           unpatchify, wan_dit_layer_forward)
from worldforge_tpu.ops.rope import rope_cos_sin


@dataclasses.dataclass(frozen=True)
class VaceConfig:
    base: WanDiTConfig = dataclasses.field(
        default_factory=lambda: WanDiTConfig(model_type="t2v", in_dim=16))
    vace_layers: Optional[Tuple[int, ...]] = None  # default: every 2nd
    vace_in_dim: int = 96

    @property
    def layers(self) -> Tuple[int, ...]:
        if self.vace_layers is not None:
            return self.vace_layers
        return tuple(range(0, self.base.num_layers, 2))

    @classmethod
    def tiny(cls) -> "VaceConfig":
        return cls(base=WanDiTConfig.tiny(model_type="t2v"), vace_in_dim=12)


def init_vace(key, cfg: VaceConfig, dtype=jnp.bfloat16) -> dict:
    ks = P.split_keys(key, len(cfg.layers) + 3)
    params = init_wan_dit(ks[0], cfg.base, dtype)
    d = cfg.base.dim
    vace_blocks = []
    for n, _ in enumerate(cfg.layers):
        blk = init_wan_dit_layer(ks[1 + n], cfg.base, dtype)
        if n == 0:
            blk["before_proj"] = {"w": jnp.zeros((d, d), dtype),
                                  "b": jnp.zeros((d,), dtype)}
        blk["after_proj"] = {"w": jnp.zeros((d, d), dtype),
                             "b": jnp.zeros((d,), dtype)}
        vace_blocks.append(blk)
    params["vace_blocks"] = vace_blocks
    params["vace_patch_embedding"] = P.dense_init(
        ks[-1], cfg.vace_in_dim * math.prod(cfg.base.patch_size), d,
        dtype=dtype)
    return params


def vace_forward(params, cfg: VaceConfig, x, t, vace_context, context,
                 vace_context_scale: float = 1.0,
                 policy: Policy = DEFAULT_POLICY,
                 attn_impl: str = "auto"):
    """x: [B, 16, F, H, W]; vace_context: [B, vace_in_dim, F, H, W];
    context: [B, text_len, text_dim]. Returns [B, 16, F, H, W] fp32
    (vace_model.py:136-250)."""
    b = x.shape[0]
    bcfg = cfg.base
    pt, ph, pw = bcfg.patch_size
    grid = (x.shape[2] // pt, x.shape[3] // ph, x.shape[4] // pw)
    f, hh, ww = grid

    tokens = P.dense(params["patch_embedding"],
                     patchify(x.astype(policy.compute_dtype), bcfg.patch_size),
                     compute_dtype=policy.compute_dtype)
    c_tok = P.dense(params["vace_patch_embedding"],
                    patchify(vace_context.astype(policy.compute_dtype),
                             bcfg.patch_size),
                    compute_dtype=policy.compute_dtype)

    te = sinusoidal_embedding_1d(bcfg.freq_dim, t)
    te = P.dense(params["time_embedding"]["fc1"], te,
                 compute_dtype=jnp.float32)
    e = P.dense(params["time_embedding"]["fc2"], jax.nn.silu(te),
                compute_dtype=jnp.float32)
    e0 = P.dense(params["time_projection"], jax.nn.silu(e),
                 compute_dtype=jnp.float32).reshape(b, 6, bcfg.dim)

    ctx = P.dense(params["text_embedding"]["fc2"], P.gelu_tanh(
        P.dense(params["text_embedding"]["fc1"],
                context.astype(policy.compute_dtype))))

    cos, sin = rope_cos_sin(f, hh, ww, bcfg.head_dim)

    # vace hint stack (forward_vace :136-154): block 0 injects x via the
    # zero-init before_proj; each block emits after_proj(c)
    hints = []
    c = c_tok.astype(jnp.float32)
    for n, blk in enumerate(params["vace_blocks"]):
        if n == 0:
            c = P.dense(blk["before_proj"], c.astype(policy.compute_dtype)
                        ).astype(jnp.float32) + tokens.astype(jnp.float32)
        c = wan_dit_layer_forward(blk, bcfg, c, e0, ctx, cos, sin, 0,
                                  policy, attn_impl)
        hints.append(P.dense(blk["after_proj"],
                             c.astype(policy.compute_dtype)))

    mapping = {layer: n for n, layer in enumerate(cfg.layers)}
    h = tokens.astype(jnp.float32)
    blocks = params["blocks"]
    for i in range(bcfg.num_layers):
        layer = jax.tree_util.tree_map(lambda p: p[i], blocks)
        h = wan_dit_layer_forward(layer, bcfg, h, e0, ctx, cos, sin, 0,
                                  policy, attn_impl)
        if i in mapping:
            h = h + hints[mapping[i]].astype(jnp.float32) \
                * vace_context_scale

    hm = params["head"]["modulation"].astype(jnp.float32) + e[:, None]
    sh, sc = hm[:, 0:1], hm[:, 1:2]
    h = P.layer_norm({}, h, eps=bcfg.eps, out_dtype=jnp.float32)
    h = h * (1.0 + sc) + sh
    out = P.dense(params["head"]["head"], h, compute_dtype=jnp.float32)
    return unpatchify(out, grid, bcfg.patch_size,
                      bcfg.out_dim).astype(jnp.float32)
