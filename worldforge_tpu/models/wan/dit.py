"""Wan2.1 DiT denoiser (t2v / i2v), TPU-native.

Behavioral reference: /root/reference/wan_for_worldforge/wan/modules/model.py
(WanModel; the active WF path uses the numerically equivalent diffusers
WanTransformer3DModel). Key behaviors reproduced:

  - patch embed Conv3d kernel=stride=(1,2,2)    (model.py:456-457) — here a
    reshape + dense (pure MXU matmul; conv kernel maps to dense weight with
    (pt,ph,pw,cin) flatten order, see checkpoint converter)
  - sinusoidal time embedding [cos|sin]         (model.py:18-28)
  - adaLN: e0 = time_projection(time_embedding) -> [B,6,dim] fp32; per block
    (modulation + e0).chunk(6) = (shift_sa, scale_sa, gate_sa, shift_ff,
    scale_ff, gate_ff)                          (model.py:296-316)
  - self-attn: QK RMSNorm, 3D RoPE on q,k       (model.py:105-159)
  - i2v cross-attn: context = [257 CLIP tokens | 512 text tokens]; separate
    k_img/v_img branch added to the text branch (model.py:187-229)
  - FFN gelu(tanh)                              (model.py:271-273)
  - head: (head_mod + e).chunk(2) modulated norm, zero-init output proj
                                                (model.py:320-347, 631)
  - fp32 islands: norms, modulation math, gated residual adds
                                                (model.py:297-313)

The residual stream is carried fp32 (matching the reference autocast
islands); matmul inputs are cast to the policy compute dtype (bf16 on MXU).
Layers are stacked and executed with lax.scan (one compiled block body).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from worldforge_tpu.core.dtypes import Policy, DEFAULT_POLICY
from worldforge_tpu.core import params as P
from worldforge_tpu.ops.attention import attention
from worldforge_tpu.ops.rope import apply_rope_qk, rope_cos_sin

CLIP_TOKENS = 257  # i2v CLIP image context tokens (model.py:14-15: 257 for i2v)


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    model_type: str = "i2v"  # 't2v' | 'i2v'
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 36  # i2v: 16 latent + 4 mask + 16 first-frame cond
    dim: int = 5120
    ffn_dim: int = 13824
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 40
    num_layers: int = 40
    eps: float = 1e-6
    clip_dim: int = 1280

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @classmethod
    def wan_14b_i2v(cls) -> "WanDiTConfig":
        # /root/reference/wan_for_worldforge/wan/configs/wan_i2v_14B.py:27-36
        return cls()

    @classmethod
    def wan_1_3b_t2v(cls) -> "WanDiTConfig":
        return cls(model_type="t2v", in_dim=16, dim=1536, ffn_dim=8960,
                   num_heads=12, num_layers=30)

    @classmethod
    def tiny(cls, model_type: str = "i2v") -> "WanDiTConfig":
        in_dim = 36 if model_type == "i2v" else 16
        return cls(model_type=model_type, in_dim=in_dim, dim=128,
                   ffn_dim=256, num_heads=2, num_layers=2, text_len=16,
                   text_dim=64, freq_dim=32)


# ------------------------------------------------------------------ init


def _attn_init(key, dim, *, img_branch=False, dtype=jnp.float32):
    ks = P.split_keys(key, 6)
    p = {
        "q": P.dense_init(ks[0], dim, dim, dtype=dtype),
        "k": P.dense_init(ks[1], dim, dim, dtype=dtype),
        "v": P.dense_init(ks[2], dim, dim, dtype=dtype),
        "o": P.dense_init(ks[3], dim, dim, dtype=dtype),
        "norm_q": P.rms_norm_init(dim, dtype=dtype),
        "norm_k": P.rms_norm_init(dim, dtype=dtype),
    }
    if img_branch:
        p["k_img"] = P.dense_init(ks[4], dim, dim, dtype=dtype)
        p["v_img"] = P.dense_init(ks[5], dim, dim, dtype=dtype)
        p["norm_k_img"] = P.rms_norm_init(dim, dtype=dtype)
    return p


def init_wan_dit_layer(key, cfg: WanDiTConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, 5)
    d = cfg.dim
    return {
        "self_attn": _attn_init(ks[0], d, dtype=dtype),
        "cross_attn": _attn_init(ks[1], d,
                                 img_branch=(cfg.model_type in
                                             ("i2v", "flf2v")),
                                 dtype=dtype),
        "norm3": P.layer_norm_init(d, affine=True, dtype=dtype),
        "ffn": {
            "fc1": P.dense_init(ks[2], d, cfg.ffn_dim, dtype=dtype),
            "fc2": P.dense_init(ks[3], cfg.ffn_dim, d, dtype=dtype),
        },
        "modulation": (jax.random.normal(ks[4], (1, 6, d)) / d**0.5
                       ).astype(jnp.float32),  # kept fp32 (adaLN island)
    }


def init_wan_dit(key, cfg: WanDiTConfig, dtype=jnp.bfloat16) -> dict:
    ks = P.split_keys(key, 12)
    d = cfg.dim
    pin = cfg.in_dim * math.prod(cfg.patch_size)
    layers = [init_wan_dit_layer(ks[0] if i == 0 else jax.random.fold_in(ks[0], i),
                                 cfg, dtype=dtype)
              for i in range(cfg.num_layers)]
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    p = {
        "patch_embedding": P.dense_init(ks[1], pin, d, dtype=dtype),
        "text_embedding": {
            "fc1": P.dense_init(ks[2], cfg.text_dim, d, init="normal", dtype=dtype),
            "fc2": P.dense_init(ks[3], d, d, init="normal", dtype=dtype),
        },
        "time_embedding": {
            "fc1": P.dense_init(ks[4], cfg.freq_dim, d, init="normal",
                                dtype=jnp.float32),
            "fc2": P.dense_init(ks[5], d, d, init="normal", dtype=jnp.float32),
        },
        "time_projection": P.dense_init(ks[6], d, d * 6, dtype=jnp.float32),
        "blocks": blocks,
        "head": {
            "head": P.dense_init(ks[7], d, cfg.out_dim * math.prod(cfg.patch_size),
                                 init="zeros", dtype=dtype),
            "modulation": (jax.random.normal(ks[8], (1, 2, d)) / d**0.5
                           ).astype(jnp.float32),
        },
    }
    if cfg.model_type in ("i2v", "flf2v"):
        c = cfg.clip_dim
        p["img_emb"] = {
            "norm_in": P.layer_norm_init(c, dtype=dtype),
            "fc1": P.dense_init(ks[9], c, c, dtype=dtype),
            "fc2": P.dense_init(ks[10], c, d, dtype=dtype),
            "norm_out": P.layer_norm_init(d, dtype=dtype),
        }
        if cfg.model_type == "flf2v":
            # first+last frame: 2x257 tokens (model.py:15, 359-361)
            p["img_emb"]["emb_pos"] = jnp.zeros((1, 2 * CLIP_TOKENS, c),
                                                dtype)
    return p


def init_wan_dit_layerwise(key, cfg: WanDiTConfig, dtype=jnp.bfloat16,
                           layer_transform=None) -> dict:
    """Full DiT built LAYER BY LAYER on device: peak HBM = final stacked
    blocks + one transient layer — init_wan_dit materializes per-layer
    arrays AND their stacked copy simultaneously (2x peak), which cannot
    fit near-HBM-sized models on chip. Numerically identical to
    init_wan_dit (same fold_in key schedule).

    layer_transform(layer_pytree) -> pytree is applied per layer before it
    is written into the stack (e.g. quantize_tree for int8 serving)."""
    from functools import partial

    tf = layer_transform or (lambda t: t)
    ks = P.split_keys(key, 12)

    def mk_layer(k):
        return tf(init_wan_dit_layer(k, cfg, dtype=dtype))

    layer_keys = [ks[0] if i == 0 else jax.random.fold_in(ks[0], i)
                  for i in range(cfg.num_layers)]
    shapes = jax.eval_shape(mk_layer, layer_keys[0])
    blocks = jax.tree_util.tree_map(
        lambda a: jnp.zeros((cfg.num_layers,) + a.shape, a.dtype), shapes)

    @partial(jax.jit, donate_argnums=0)
    def write(blocks, i, k):
        lay = mk_layer(k)
        return jax.tree_util.tree_map(
            lambda B, x: jax.lax.dynamic_update_index_in_dim(
                B, x.astype(B.dtype), i, 0), blocks, lay)

    for i, lk in enumerate(layer_keys):
        blocks = write(blocks, jnp.int32(i), lk)

    small_cfg = dataclasses.replace(cfg, num_layers=1)
    p = tf(init_wan_dit(key, small_cfg, dtype=dtype))
    p["blocks"] = blocks
    return p


def init_wan_dit_int8(key, cfg: WanDiTConfig, dtype=jnp.bfloat16) -> dict:
    """Full DiT with W8-quantized stacked blocks, built layer by layer on
    device (see init_wan_dit_layerwise): the Wan-14B int8 blocks (~14 GB)
    fit a 16 GB v5e where the bf16 stacked blocks (~28 GB) cannot even be
    materialized to quantize from.

    Numerically identical to quantize_tree(init_wan_dit(key, cfg, dtype))
    (per-layer scales == stacked-axis scales)."""
    from worldforge_tpu.ops.quant import quantize_tree

    return init_wan_dit_layerwise(key, cfg, dtype,
                                  layer_transform=quantize_tree)


def init_wan_dit_w4(key, cfg: WanDiTConfig, dtype=jnp.bfloat16,
                    int4_keys=("fc1", "fc2"), int4_group: int = 128,
                    int6_keys=(), int6_group: int = 128) -> dict:
    """Mixed-precision capacity build: weight-only int4 on ``int4_keys``
    (default the FFN, 35% of layer params), W8A8 on the other big matmuls.
    This is what fits the i2v variant on a 16 GB chip — its k_img/v_img
    branches push all-int8 to ~16.1 GB (OOM); FFN-int4 lands ~13.6 GB.
    int4_keys=("*",) quantizes every big matmul to int4 (~8 GB).
    ``int6_keys`` selects the 6-bit rung instead (precedence over int4
    when both match): int6_keys=("fc1","fc2") + int4_keys=("*",) is the
    drift-bar recipe — int6 FFN + int4 attention, ~9.5 GB blocks."""
    from worldforge_tpu.ops.quant import quantize_tree

    def tf(tree):
        return quantize_tree(tree, int4_keys=int4_keys,
                             int4_group=int4_group,
                             int6_keys=int6_keys, int6_group=int6_group)

    return init_wan_dit_layerwise(key, cfg, dtype, layer_transform=tf)


# ------------------------------------------------------------------ pieces


def sinusoidal_embedding_1d(dim: int, t: jnp.ndarray) -> jnp.ndarray:
    """[cos | sin] sinusoid, freq 10000^(-i/half) (model.py:18-28). fp32
    (the reference computes fp64 then casts; fp32 is within 1e-7 here)."""
    half = dim // 2
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _heads(x, h):
    """Split the feature dim into heads: [..., D] -> [..., h, D/h]."""
    return x.reshape(x.shape[:-1] + (h, x.shape[-1] // h))


def _apply_rope_grid(x, cos, sin, grid3d, out_dtype=None):
    """RoPE on the spatial-grid view: x [B, F, H', W', h, d] with flat
    per-token tables cos/sin [F*H'*W', d/2] reshaped to the grid. Pure
    elementwise — under a (sp_h, sp_w)-sharded x the replicated tables are
    sliced by GSPMD with no collective; numerics identical to apply_rope on
    the flattened sequence (ops/rope.py:78-95)."""
    odtype = out_dtype or x.dtype
    b, f, gh, gw, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, f, gh, gw, h, d // 2, 2)
    xe, xo = xf[..., 0], xf[..., 1]
    c = cos.reshape(f, gh, gw, 1, d // 2)[None]
    si = sin.reshape(f, gh, gw, 1, d // 2)[None]
    ye = xe * c - xo * si
    yo = xe * si + xo * c
    return jnp.stack([ye, yo], axis=-1).reshape(x.shape).astype(odtype)


def _self_attention(p, cfg: WanDiTConfig, x, cos, sin, policy: Policy,
                    attn_impl="auto", mesh=None, grid3d=None):
    cdt = policy.compute_dtype
    xq = x.astype(cdt)
    if "w8" in p["q"] and not any(
            "lora_down" in p[k] for k in ("q", "k", "v")):
        # int8 serving: quantize the activations ONCE (LoRA-decorated
        # leaves take the generic P.dense path so adapter deltas apply)
        from worldforge_tpu.ops.quant import (dense_q8_pre,
                                              quantize_activations)
        x8, sx = quantize_activations(xq)
        q = P.rms_norm(p["norm_q"], dense_q8_pre(p["q"], x8, sx, cdt),
                       eps=cfg.eps)
        k = P.rms_norm(p["norm_k"], dense_q8_pre(p["k"], x8, sx, cdt),
                       eps=cfg.eps)
        v = dense_q8_pre(p["v"], x8, sx, cdt)
    else:
        q = P.rms_norm(p["norm_q"], P.dense(p["q"], xq), eps=cfg.eps)
        k = P.rms_norm(p["norm_k"], P.dense(p["k"], xq), eps=cfg.eps)
        v = P.dense(p["v"], xq)
    h = cfg.num_heads
    if x.ndim == 5:
        # 2D H x W context parallelism (xDiT's 2D USP analog): the stream
        # stays in its sharded [B, F, H', W', D] grid layout end to end —
        # heads-split and RoPE are local elementwise ops on that layout, and
        # attention scatters heads over BOTH spatial mesh axes
        # (parallel/cp2d.py). No flat<->grid reshape ever touches the
        # sharded token dims, so GSPMD never reshards between blocks.
        from worldforge_tpu.parallel.cp2d import ulysses_attention_2d
        q = _apply_rope_grid(_heads(q, h), cos, sin, grid3d)
        k = _apply_rope_grid(_heads(k, h), cos, sin, grid3d)
        o = ulysses_attention_2d(q, k, _heads(v, h), mesh=mesh,
                                 impl=attn_impl)
        return P.dense(p["o"], o.reshape(x.shape[:-1] + (cfg.dim,)))
    q, k = apply_rope_qk(_heads(q, h), _heads(k, h), cos, sin)
    if mesh is not None and mesh.shape.get("sp", 1) > 1:
        from worldforge_tpu.parallel.ulysses import ulysses_attention
        o = ulysses_attention(q, k, _heads(v, h), mesh=mesh, impl=attn_impl)
    else:
        o = attention(q, k, _heads(v, h), impl=attn_impl)
    o = o.reshape(x.shape[0], x.shape[1], cfg.dim)
    return P.dense(p["o"], o)


def _cross_attention(p, cfg: WanDiTConfig, x, context, img_ctx_len: int,
                     policy: Policy, attn_impl="auto", mesh=None):
    """context: [B, img_ctx_len + text_len, dim] (i2v) or [B, text_len, dim]."""
    cdt = policy.compute_dtype
    xq = x.astype(cdt)
    ctx = context.astype(cdt)
    h = cfg.num_heads

    if x.ndim == 5:
        # 2D-CP grid layout: per-token cross-attn to replicated text/CLIP
        # context runs shard-locally with zero collectives
        from worldforge_tpu.parallel.cp2d import cross_attention_2d
        attn_fn = lambda q, k, v: cross_attention_2d(q, k, v, mesh=mesh,
                                                     impl=attn_impl)
    elif mesh is not None and mesh.shape.get("sp", 1) > 1:
        from worldforge_tpu.parallel.ulysses import (
            sequence_local_cross_attention as xattn)
        attn_fn = lambda q, k, v: xattn(q, k, v, mesh=mesh, impl=attn_impl)
    else:
        attn_fn = lambda q, k, v: attention(q, k, v, impl=attn_impl)

    q = _heads(P.rms_norm(p["norm_q"], P.dense(p["q"], xq), eps=cfg.eps), h)
    if img_ctx_len and cfg.model_type in ("i2v", "flf2v"):
        ctx_img, ctx_txt = ctx[:, :img_ctx_len], ctx[:, img_ctx_len:]
    else:
        ctx_img, ctx_txt = None, ctx
    k = _heads(P.rms_norm(p["norm_k"], P.dense(p["k"], ctx_txt), eps=cfg.eps), h)
    v = _heads(P.dense(p["v"], ctx_txt), h)
    o = attn_fn(q, k, v)
    if ctx_img is not None:
        k_i = _heads(P.rms_norm(p["norm_k_img"], P.dense(p["k_img"], ctx_img),
                                eps=cfg.eps), h)
        v_i = _heads(P.dense(p["v_img"], ctx_img), h)
        o = o + attn_fn(q, k_i, v_i)
    o = o.reshape(x.shape[:-1] + (cfg.dim,))
    return P.dense(p["o"], o)


# fused adaLN-LayerNorm prologue (ops/fused_norm.py): "auto" -> Pallas on
# an unsharded TPU path, XLA chain elsewhere; "interpret" for CPU tests.
# Default OFF: measured no-op at layer scale (+0.2%, within noise — XLA
# already fuses the modulate chain; scripts/probe_fused_norm_ab.py,
# docs/PERF.md). Kept as a CI-covered capability for wider-HBM shapes.
_FUSED_NORM_MODE = "off"


def _modulated_ln(xf, sc, sh, eps, out_dtype, mesh):
    mode = _FUSED_NORM_MODE
    use_pallas = (mode == "interpret"
                  or (mode == "auto" and mesh is None
                      and jax.default_backend() == "tpu"))
    if use_pallas:
        from worldforge_tpu.ops.fused_norm import modulated_layer_norm
        return modulated_layer_norm(xf, sc, sh, eps=eps,
                                    out_dtype=out_dtype,
                                    interpret=mode == "interpret")
    h = P.layer_norm({}, xf, eps=eps, out_dtype=jnp.float32)
    return (h * (1.0 + sc) + sh).astype(out_dtype)


def _ffn_token_chunked(p, h3, token_chunk: int = 1):
    """Wan FFN with optional exact-math token tiling via lax.map (the
    LongCat token_chunk pattern, models/longcat/dit.py): shrinks the
    [N, ffn_dim] gate transient by the chunk factor — at 20,280 tokens the
    fp32 gate is 1.12 GB, the largest single temp in the fused guided
    program (which missed 16 GB by ~36 MB in round 3). Only the flat
    [B, N, C] layout chunks; the 2D-CP grid layout is already sharded."""
    def f(xc):
        return P.dense(p["fc2"], P.gelu_tanh(P.dense(p["fc1"], xc)))

    if token_chunk > 1 and h3.ndim == 3 and h3.shape[1] % token_chunk == 0:
        b, n, c = h3.shape
        xs = h3.reshape(b, token_chunk, n // token_chunk, c).swapaxes(0, 1)
        y = jax.lax.map(f, xs)
        return y.swapaxes(0, 1).reshape(b, n, -1)
    return f(h3)


def wan_dit_layer_forward(p, cfg: WanDiTConfig, x, e0, context, cos, sin,
                          img_ctx_len: int = 0,
                          policy: Policy = DEFAULT_POLICY,
                          attn_impl: str = "auto", mesh=None, grid3d=None,
                          token_chunk: int = 1):
    """One WanAttentionBlock. x: [B, L, dim] (fp32 residual stream) — or
    [B, F, H', W', dim] under 2D-CP, where the stream keeps its sharded grid
    layout between blocks. e0: [B, 6, dim] fp32, context: [B, Lc, dim]."""
    mod = (p["modulation"].astype(jnp.float32) + e0.astype(jnp.float32))
    bcast = (mod.shape[0],) + (1,) * (x.ndim - 2) + (mod.shape[-1],)
    sh_sa, sc_sa, g_sa, sh_ff, sc_ff, g_ff = [
        mod[:, i].reshape(bcast) for i in range(6)]

    xf = x.astype(jnp.float32)
    h1 = _modulated_ln(xf, sc_sa, sh_sa, cfg.eps, policy.compute_dtype,
                       mesh)
    y = _self_attention(p["self_attn"], cfg, h1,
                        cos, sin, policy, attn_impl, mesh, grid3d)
    xf = xf + y.astype(jnp.float32) * g_sa

    h2 = P.layer_norm(p["norm3"], xf, eps=cfg.eps, out_dtype=policy.compute_dtype)
    y = _cross_attention(p["cross_attn"], cfg, h2, context, img_ctx_len,
                         policy, attn_impl, mesh)
    xf = xf + y.astype(jnp.float32)

    h3 = _modulated_ln(xf, sc_ff, sh_ff, cfg.eps, policy.compute_dtype,
                       mesh)
    y = _ffn_token_chunked(p["ffn"], h3,
                           token_chunk if mesh is None else 1)
    xf = xf + y.astype(jnp.float32) * g_ff
    return xf


def patchify(x: jnp.ndarray, patch: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, C, F, H, W] -> [B, F' * H' * W', pt*ph*pw*C] with feature order
    (pt, ph, pw, c) matching a DHWIO conv kernel flatten."""
    b, c, f, hh, ww = x.shape
    pt, ph, pw = patch
    x = x.reshape(b, c, f // pt, pt, hh // ph, ph, ww // pw, pw)
    x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)  # b f' h' w' pt ph pw c
    return x.reshape(b, (f // pt) * (hh // ph) * (ww // pw), pt * ph * pw * c)


def unpatchify(x: jnp.ndarray, grid: Tuple[int, int, int],
               patch: Tuple[int, int, int], out_dim: int) -> jnp.ndarray:
    """[B, L, pt*ph*pw*C] -> [B, C, F, H, W]. Reference einsum
    'fhwpqrc->cfphqwr' (model.py:584-607)."""
    b = x.shape[0]
    f, hh, ww = grid
    pt, ph, pw = patch
    x = x[:, :f * hh * ww].reshape(b, f, hh, ww, pt, ph, pw, out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # b c f pt h ph w pw
    return x.reshape(b, out_dim, f * pt, hh * ph, ww * pw)


# ------------------------------------------------------------------ forward


def wan_dit_forward(params, cfg: WanDiTConfig, x, t, context,
                    clip_fea=None, y=None,
                    policy: Policy = DEFAULT_POLICY,
                    attn_impl: str = "auto",
                    remat: bool = False,
                    mesh=None, token_chunk: int = 1):
    """Full WanModel forward (model.py:493-582).

    x: [B, 16, F, H, W] noisy latents; y: [B, 20, F, H, W] i2v conditioning
    (mask 4ch + first-frame latents 16ch) concatenated on channels.
    t: [B] timesteps. context: [B, text_len, text_dim] padded text embeds.
    clip_fea: [B, 257, 1280] CLIP image tokens (i2v).
    Returns [B, out_dim, F, H, W] fp32.
    """
    if y is not None:
        x = jnp.concatenate([x, y], axis=1)
    b = x.shape[0]
    pt, ph, pw = cfg.patch_size
    grid = (x.shape[2] // pt, x.shape[3] // ph, x.shape[4] // pw)
    f, hh, ww = grid

    tokens = patchify(x.astype(policy.compute_dtype), cfg.patch_size)
    use_cp2d = (mesh is not None
                and mesh.shape.get("sp_h", 1) * mesh.shape.get("sp_w", 1) > 1)
    if use_cp2d:
        # enter the [B, F, H', W', D] grid layout BEFORE the embed dense:
        # tokens are still replicated here, so the reshape is free and the
        # grid constraint is a plain partition; the dense output then only
        # needs a per-shard feature all-gather (its weight is FSDP-sharded)
        # — every transition is a single-axis reshard, and the residual
        # stream stays in this layout for the whole scan (split after embed
        # / gather before unpatchify, longcat_video_dit.py:329-332,359-360),
        # so XLA never involuntarily rematerializes a flat<->grid reshard
        from worldforge_tpu.parallel.cp2d import split_cp_2d
        tokens = split_cp_2d(tokens.reshape(b, f, hh, ww, -1), mesh)
        h0 = split_cp_2d(P.dense(params["patch_embedding"], tokens,
                                 compute_dtype=policy.compute_dtype), mesh)
    else:
        h0 = P.dense(params["patch_embedding"], tokens,
                     compute_dtype=policy.compute_dtype)
        if (mesh is not None and mesh.size > 1
                and "sp" in mesh.axis_names):
            from jax.sharding import NamedSharding, PartitionSpec as PS
            h0 = jax.lax.with_sharding_constraint(
                h0, NamedSharding(mesh, PS("dp", "sp", None)))

    # time embeddings (fp32 island, model.py:546-550)
    te = sinusoidal_embedding_1d(cfg.freq_dim, t)
    te = P.dense(params["time_embedding"]["fc1"], te, compute_dtype=jnp.float32)
    e = P.dense(params["time_embedding"]["fc2"], jax.nn.silu(te),
                compute_dtype=jnp.float32)  # [B, dim]
    e0 = P.dense(params["time_projection"], jax.nn.silu(e),
                 compute_dtype=jnp.float32).reshape(b, 6, cfg.dim)

    # text context (padded to text_len upstream)
    ctx = P.dense(params["text_embedding"]["fc2"],
                  P.gelu_tanh(P.dense(params["text_embedding"]["fc1"],
                                      context.astype(policy.compute_dtype))))
    img_ctx_len = 0
    if clip_fea is not None and cfg.model_type in ("i2v", "flf2v"):
        ie = params["img_emb"]
        if "emb_pos" in ie:  # flf2v: first+last CLIP tokens get positional
            # embeddings before the projection (MLPProj, model.py:359-367)
            clip_fea = (clip_fea.astype(jnp.float32)
                        + ie["emb_pos"].astype(jnp.float32))
        ci = P.layer_norm(ie["norm_in"], clip_fea.astype(policy.compute_dtype),
                          eps=1e-5)
        ci = jax.nn.gelu(P.dense(ie["fc1"], ci.astype(policy.compute_dtype)),
                         approximate=False)
        ci = P.dense(ie["fc2"], ci)
        ci = P.layer_norm(ie["norm_out"], ci, eps=1e-5)
        ctx = jnp.concatenate([ci, ctx], axis=1)
        img_ctx_len = clip_fea.shape[1]

    cos, sin = rope_cos_sin(f, hh, ww, cfg.head_dim)

    def body(carry, layer):
        out = wan_dit_layer_forward(layer, cfg, carry, e0, ctx, cos, sin,
                                    img_ctx_len, policy, attn_impl, mesh,
                                    grid, token_chunk=token_chunk)
        if use_cp2d:
            # re-assert the grid sharding on the carry (a no-op reshard:
            # every op in the layer preserved it) so GSPMD cannot pick a
            # different layout for the scan carry
            from worldforge_tpu.parallel.cp2d import split_cp_2d
            out = split_cp_2d(out, mesh)
        return out, None

    if remat:
        body = jax.checkpoint(body)
    hN, _ = jax.lax.scan(body, h0.astype(jnp.float32), params["blocks"])

    # head (model.py:337-347) — per-token ops: under 2D-CP they run on the
    # still-sharded grid layout; the single gather happens after the head
    hm = params["head"]["modulation"].astype(jnp.float32) + e[:, None]
    bcast = (b,) + (1,) * (hN.ndim - 2) + (cfg.dim,)
    sh, sc = hm[:, 0].reshape(bcast), hm[:, 1].reshape(bcast)
    hN = P.layer_norm({}, hN, eps=cfg.eps, out_dtype=jnp.float32)
    hN = hN * (1.0 + sc) + sh
    out = P.dense(params["head"]["head"], hN, compute_dtype=jnp.float32)
    if use_cp2d:
        from worldforge_tpu.parallel.cp2d import gather_cp_2d
        out = gather_cp_2d(out, mesh).reshape(b, f * hh * ww, -1)
    return unpatchify(out, grid, cfg.patch_size, cfg.out_dim).astype(jnp.float32)
