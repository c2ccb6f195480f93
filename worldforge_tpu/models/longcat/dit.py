"""LongCat-Video 13.6B single-stream DiT, TPU-native.

Behavioral reference: /root/reference/longcat_for_worldforge/longcat_video/
modules/longcat_video_dit.py (+blocks.py, attention.py, rope_3d.py):

  - hidden 4096, depth 48, heads 32, patch (1,2,2), caption 4096
    (longcat_video_dit.py:130-151)
  - per-frame timestep adaLN: t [B,T] -> TimestepEmbedder [B,T,512]; each
    block's adaLN Linear(512 -> 6*4096) in fp32; shift/scale/gate applied
    per frame over x viewed [B, T, HW, C] (blocks.py:128-137, dit:103-124)
  - self-attn: fused qkv (bias), head-dim RMSNorm on q/k (fp32, eps 1e-6),
    3D RoPE (same interleaved-pair convention as Wan, rope_3d.py:41-119);
    cond/noise split: cond tokens attend only to cond, noise tokens attend
    to all (attention.py:124-135)
  - cross-attn: q_linear + fused kv_linear, head-dim RMSNorm q/k, varlen
    text (here: per-batch kv_lens mask); with cond latents the cond tokens
    receive ZERO cross-attn output (attention.py:255-276)
  - FFN SwiGLU with hidden = 256*ceil(2*4*C/3/256) = 11008 (blocks.py:17-39)
  - final layer: per-frame 2-way modulated LN + linear (blocks.py:140-163)
  - runtime LoRA (lora_utils.py): modeled as weight merge/unmerge (additive
    low-rank; mathematically identical for inference)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from worldforge_tpu.core.dtypes import Policy, DEFAULT_POLICY
from worldforge_tpu.core import params as P
from worldforge_tpu.ops.attention import attention
from worldforge_tpu.ops.rope import (apply_rope, apply_rope_qk,
    rope_cos_sin)


@dataclasses.dataclass(frozen=True)
class LongCatDiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 4096
    depth: int = 48
    num_heads: int = 32
    caption_channels: int = 4096
    mlp_ratio: int = 4
    adaln_tembed_dim: int = 512
    frequency_embedding_size: int = 256
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ffn_hidden(self) -> int:
        h = int(2 * (self.hidden_size * self.mlp_ratio) / 3)
        return 256 * ((h + 255) // 256)

    @classmethod
    def longcat_13b(cls) -> "LongCatDiTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "LongCatDiTConfig":
        return cls(hidden_size=64, depth=2, num_heads=2, caption_channels=32,
                   adaln_tembed_dim=32, frequency_embedding_size=16)


# ------------------------------------------------------------------ init


def init_longcat_layer(key, cfg: LongCatDiTConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, 10)
    c = cfg.hidden_size
    hd = cfg.head_dim
    return {
        "adaln": P.dense_init(ks[0], cfg.adaln_tembed_dim, 6 * c,
                              dtype=jnp.float32),
        "qkv": P.dense_init(ks[1], c, 3 * c, dtype=dtype),
        "q_norm": P.rms_norm_init(hd, dtype=jnp.float32),
        "k_norm": P.rms_norm_init(hd, dtype=jnp.float32),
        "attn_proj": P.dense_init(ks[2], c, c, dtype=dtype),
        "pre_crs_norm": P.layer_norm_init(c, dtype=dtype),
        "x_q": P.dense_init(ks[3], c, c, dtype=dtype),
        "x_kv": P.dense_init(ks[4], c, 2 * c, dtype=dtype),
        "x_q_norm": P.rms_norm_init(hd, dtype=jnp.float32),
        "x_k_norm": P.rms_norm_init(hd, dtype=jnp.float32),
        "x_proj": P.dense_init(ks[5], c, c, dtype=dtype),
        "w1": P.dense_init(ks[6], c, cfg.ffn_hidden, bias=False, dtype=dtype),
        "w3": P.dense_init(ks[7], c, cfg.ffn_hidden, bias=False, dtype=dtype),
        "w2": P.dense_init(ks[8], cfg.ffn_hidden, c, bias=False, dtype=dtype),
    }


def init_longcat_dit(key, cfg: LongCatDiTConfig, dtype=jnp.bfloat16) -> dict:
    ks = P.split_keys(key, cfg.depth + 8)
    layers = [init_longcat_layer(ks[i], cfg, dtype) for i in range(cfg.depth)]
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    p = _init_longcat_nonblock(ks, cfg, dtype)
    p["blocks"] = blocks
    return p


def _init_longcat_nonblock(ks, cfg: LongCatDiTConfig, dtype) -> dict:
    """Embedders/head built from the tail of the depth+8 key schedule
    (shared by the direct and layerwise builders so both yield identical
    params for the same key)."""
    c = cfg.hidden_size
    pin = cfg.in_channels * math.prod(cfg.patch_size)
    return {
        "x_embedder": P.dense_init(ks[-1], pin, c, dtype=dtype),
        "t_embedder": {
            "fc1": P.dense_init(ks[-2], cfg.frequency_embedding_size,
                                cfg.adaln_tembed_dim, dtype=jnp.float32),
            "fc2": P.dense_init(ks[-3], cfg.adaln_tembed_dim,
                                cfg.adaln_tembed_dim, dtype=jnp.float32),
        },
        "y_embedder": {
            "fc1": P.dense_init(ks[-4], cfg.caption_channels, c, dtype=dtype),
            "fc2": P.dense_init(ks[-5], c, c, dtype=dtype),
        },
        "final": {
            "adaln": P.dense_init(ks[-6], cfg.adaln_tembed_dim, 2 * c,
                                  dtype=jnp.float32),
            "linear": P.dense_init(ks[-7], c,
                                   math.prod(cfg.patch_size) * cfg.out_channels,
                                   dtype=dtype),
        },
    }


def init_longcat_dit_layerwise(key, cfg: LongCatDiTConfig,
                               dtype=jnp.bfloat16,
                               layer_transform=None) -> dict:
    """Full DiT built LAYER BY LAYER on device (same pattern as
    wan.dit.init_wan_dit_layerwise): peak HBM = final stacked blocks + one
    transient layer, so near-HBM-sized models fit where init_longcat_dit
    (per-layer arrays + stacked copy simultaneously) cannot. Numerically
    identical to init_longcat_dit (same key schedule).

    layer_transform(layer_pytree) -> pytree runs per layer before stacking
    (e.g. ops.quant.quantize_tree: LongCat-13.6B int8 blocks ~13.6 GB fit
    a 16 GB v5e where bf16 blocks at 27 GB cannot)."""
    from functools import partial

    tf = layer_transform or (lambda t: t)
    ks = P.split_keys(key, cfg.depth + 8)

    def mk_layer(k):
        return tf(init_longcat_layer(k, cfg, dtype))

    shapes = jax.eval_shape(mk_layer, ks[0])
    blocks = jax.tree_util.tree_map(
        lambda a: jnp.zeros((cfg.depth,) + a.shape, a.dtype), shapes)

    @partial(jax.jit, donate_argnums=0)
    def write(blocks, i, k):
        lay = mk_layer(k)
        return jax.tree_util.tree_map(
            lambda B, x: jax.lax.dynamic_update_index_in_dim(
                B, x.astype(B.dtype), i, 0), blocks, lay)

    for i in range(cfg.depth):
        blocks = write(blocks, jnp.int32(i), ks[i])

    p = tf(_init_longcat_nonblock(ks, cfg, dtype))
    p["blocks"] = blocks
    return p


def init_longcat_dit_int8(key, cfg: LongCatDiTConfig,
                          dtype=jnp.bfloat16) -> dict:
    """int8 W8A8 serving build (see init_longcat_dit_layerwise)."""
    from worldforge_tpu.ops.quant import quantize_tree

    return init_longcat_dit_layerwise(key, cfg, dtype,
                                      layer_transform=quantize_tree)


def init_longcat_dit_w4(key, cfg: LongCatDiTConfig, dtype=jnp.bfloat16,
                        int4_keys=("*",), int4_group: int = 128,
                        int6_keys=(), int6_group: int = 128) -> dict:
    """int4 (W4A8) capacity build, mirroring wan.dit.init_wan_dit_w4: the
    all-int4 13.6B blocks land ~6.8 GB — the build that leaves room for
    the VAE on a 16 GB chip (the scheduler calls the VAE every guided
    step, scheduling_flow_match_euler_discrete.py:860-889). ``int6_keys``
    upgrades matching leaves to the 6-bit rung (see wan.init_wan_dit_w4)."""
    from worldforge_tpu.ops.quant import quantize_tree

    def tf(tree):
        return quantize_tree(tree, int4_keys=int4_keys,
                             int4_group=int4_group,
                             int6_keys=int6_keys, int6_group=int6_group)

    return init_longcat_dit_layerwise(key, cfg, dtype, layer_transform=tf)


# ------------------------------------------------------------------ pieces


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """DiT sinusoidal embedding: exp(-log(P)*i/half) freqs, [cos | sin]
    (blocks.py:181-198). t: [N] (fractional ok)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _heads_hd(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h)


def _rms_hd(p, x, eps):
    """Head-dim RMSNorm over [B, S, H, D] last axis (RMSNorm_FP32 on
    head_dim, attention.py:41-43)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y * p["scale"].astype(jnp.float32)


def _modulate_per_frame(x, shift, scale, T, eps):
    """LN (no affine, fp32) then *(1+scale)+shift per frame.
    x: [B, N, C]; shift/scale: [B, T, C] (blocks.py:128-137)."""
    b, n, c = x.shape
    xf = P.layer_norm({}, x.astype(jnp.float32), eps=eps,
                      out_dtype=jnp.float32).reshape(b, T, n // T, c)
    y = xf * (1.0 + scale[:, :, None]) + shift[:, :, None]
    return y.reshape(b, n, c)


def _qkv_prologue(p, cfg, x_m, cos, sin, cdt, token_chunk: int = 1):
    """QKV projection + head-dim RMSNorm + RoPE -> bf16 q, k, v.

    token_chunk > 1 tiles the token axis via lax.map (row-wise identical
    math). The full q/k/v the attention kernel needs stay materialized;
    what shrinks by token_chunk is the fused [N, 3C] qkv buffer and the
    fp32 norm/RoPE transients — measured 1.4 GB + 2×960 MB at the 61440-
    token refine shape, the largest program allocations after the FFN
    gates were chunked (docs/PERF.md capacity notes)."""
    b, n, c = x_m.shape
    h = cfg.num_heads

    def pro(args):
        xc, cos_c, sin_c = args
        qkv = P.dense(p["qkv"], xc.astype(cdt))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rms_hd(p["q_norm"], _heads_hd(q, h), cfg.eps)
        k = _rms_hd(p["k_norm"], _heads_hd(k, h), cfg.eps)
        q, k = apply_rope_qk(q, k, cos_c, sin_c, out_dtype=cdt)
        return q, k, _heads_hd(v, h)

    if token_chunk > 1 and n % token_chunk == 0:
        nc = n // token_chunk
        xs = (x_m.reshape(b, token_chunk, nc, c).swapaxes(0, 1),
              cos.reshape(token_chunk, nc, *cos.shape[1:]),
              sin.reshape(token_chunk, nc, *sin.shape[1:]))
        q, k, v = jax.lax.map(pro, xs)
        fix = lambda t: t.swapaxes(0, 1).reshape(b, n, h, -1)
        return fix(q), fix(k), fix(v)
    return pro((x_m, cos, sin))


def _self_attention_lc(p, cfg, x_m, cos, sin, T, num_cond_latents,
                       policy, attn_impl, mesh=None, grid3d=None,
                       bsa_params=None, token_chunk: int = 1):
    b, n, c = x_m.shape
    cdt = policy.compute_dtype
    h = cfg.num_heads
    q, k, v = _qkv_prologue(p, cfg, x_m, cos, sin, cdt,
                            token_chunk if mesh is None else 1)

    if bsa_params is not None and grid3d is not None and grid3d[0] > 1:
        # block-sparse path (720p refine, attention.py:58-66); with an sp
        # mesh axis the ring-KV context-parallel variant is used
        if mesh is not None and mesh.shape.get("sp", 1) > 1:
            from worldforge_tpu.parallel.bsa_cp import bsa_attention_3d_cp

            def attn(q_, k_, v_):
                tq = q_.shape[1] // (grid3d[1] * grid3d[2])
                tk = k_.shape[1] // (grid3d[1] * grid3d[2])
                return bsa_attention_3d_cp(
                    q_, k_, v_, (tq, grid3d[1], grid3d[2]),
                    (tk, grid3d[1], grid3d[2]), mesh=mesh, **bsa_params)
        else:
            from worldforge_tpu.ops.bsa import bsa_attention_3d

            def attn(q_, k_, v_):
                tq = q_.shape[1] // (grid3d[1] * grid3d[2])
                tk = k_.shape[1] // (grid3d[1] * grid3d[2])
                ct = bsa_params.get("chunk_3d_shape_q", (4, 4, 8))[0]
                if tq % ct or tk % ct:
                    raise ValueError(
                        f"BSA needs the temporal grid divisible by the "
                        f"chunk t ({ct}); got Tq={tq}, Tk={tk}. The refine "
                        f"pipeline pads latents to 4-multiples "
                        f"(pipeline_longcat_video.py:1411-1428); BSA cannot "
                        f"combine with cond-latent splitting (the reference "
                        f"never does).")
                return bsa_attention_3d(
                    q_, k_, v_, (tq, grid3d[1], grid3d[2]),
                    (tk, grid3d[1], grid3d[2]), **bsa_params)
    else:
        sp = mesh.shape.get("sp", 1) if mesh is not None else 1
        nc_seg = num_cond_latents * (n // T) if num_cond_latents else 0
        # static guard: every attention segment's sequence AND the head
        # count must divide sp (shard_map hard-errors otherwise)
        if (sp > 1 and h % sp == 0 and (n - nc_seg) % sp == 0
                and nc_seg % sp == 0):
            from worldforge_tpu.parallel.ulysses import ulysses_attention
            attn = lambda q_, k_, v_: ulysses_attention(
                q_, k_, v_, mesh=mesh, impl=attn_impl)
        else:
            attn = lambda q_, k_, v_: attention(q_, k_, v_, impl=attn_impl)

    if num_cond_latents:
        nc = num_cond_latents * (n // T)
        # cond tokens attend only to cond; noise tokens attend to all
        # (attention.py:124-135)
        o_cond = attn(q[:, :nc], k[:, :nc], v[:, :nc])
        o_noise = attn(q[:, nc:], k, v)
        o = jnp.concatenate([o_cond, o_noise], axis=1)
    else:
        o = attn(q, k, v)
    return P.dense(p["attn_proj"], o.reshape(b, n, c).astype(cdt))


def _cross_attention_lc(p, cfg, x, ctx, kv_lens, T, num_cond_latents,
                        policy, attn_impl):
    b, n, c = x.shape
    cdt = policy.compute_dtype
    h = cfg.num_heads

    def run(xq):
        q = _rms_hd(p["x_q_norm"],
                    _heads_hd(P.dense(p["x_q"], xq.astype(cdt)), h),
                    cfg.eps).astype(cdt)
        kv = P.dense(p["x_kv"], ctx.astype(cdt))
        k, v = jnp.split(kv, 2, axis=-1)
        k = _rms_hd(p["x_k_norm"], _heads_hd(k, h), cfg.eps).astype(cdt)
        v = _heads_hd(v, h)
        o = attention(q, k, v, kv_lens=kv_lens, impl=attn_impl)
        return P.dense(p["x_proj"],
                       o.reshape(xq.shape[0], xq.shape[1], c).astype(cdt))

    if num_cond_latents:
        nc = num_cond_latents * (n // T)
        o_noise = run(x[:, nc:])
        return jnp.concatenate(
            [jnp.zeros((b, nc, c), o_noise.dtype), o_noise], axis=1)
    return run(x)


def swiglu_ffn(p, x_m, token_chunk: int = 1):
    """SwiGLU FFN (w2(silu(w1 x) * w3 x)), optionally token-chunked.

    token_chunk > 1 tiles the token axis via lax.map — row-wise identical
    math, but the two [N, ffn_hidden] gate transients shrink by token_chunk:
    the capacity lever that fits the full 48-layer int8 model in 16 GB HBM
    (the unchunked gates alone are ~1 GB at 480p, ~3 GB at the 720p refine
    shape). Falls back to the unchunked path when N is not divisible."""
    b, n, c = x_m.shape

    def _ffn(xc):
        return P.dense(p["w2"], jax.nn.silu(P.dense(p["w1"], xc))
                       * P.dense(p["w3"], xc))

    if token_chunk > 1 and n % token_chunk == 0:
        xs = x_m.reshape(b, token_chunk, n // token_chunk, c).swapaxes(0, 1)
        return jax.lax.map(_ffn, xs).swapaxes(0, 1).reshape(b, n, c)
    return _ffn(x_m)


def longcat_layer_forward(p, cfg: LongCatDiTConfig, x, t_emb, ctx, kv_lens,
                          cos, sin, T: int, num_cond_latents: int = 0,
                          policy: Policy = DEFAULT_POLICY,
                          attn_impl: str = "auto", mesh=None, grid3d=None,
                          bsa_params=None, token_chunk: int = 1):
    """x: [B, N, C] fp32 stream; t_emb: [B, T, adaln_dim] fp32;
    ctx: [B, M, C]."""
    b, n, c = x.shape
    mod = P.dense(p["adaln"], jax.nn.silu(t_emb.astype(jnp.float32)),
                  compute_dtype=jnp.float32)
    sh_a, sc_a, g_a, sh_f, sc_f, g_f = jnp.split(mod, 6, axis=-1)  # [B,T,C]

    xf = x.astype(jnp.float32)
    x_m = _modulate_per_frame(xf, sh_a, sc_a, T, cfg.eps)
    y = _self_attention_lc(p, cfg, x_m.astype(policy.compute_dtype), cos,
                           sin, T, num_cond_latents, policy, attn_impl,
                           mesh, grid3d, bsa_params,
                           token_chunk=token_chunk)
    yf = y.astype(jnp.float32).reshape(b, T, n // T, c)
    xf = xf + (g_a[:, :, None] * yf).reshape(b, n, c)

    h2 = P.layer_norm(p["pre_crs_norm"], xf, eps=cfg.eps,
                      out_dtype=policy.compute_dtype)
    xf = xf + _cross_attention_lc(p, cfg, h2, ctx, kv_lens, T,
                                  num_cond_latents, policy,
                                  attn_impl).astype(jnp.float32)

    x_m = _modulate_per_frame(xf, sh_f, sc_f, T, cfg.eps).astype(
        policy.compute_dtype)

    ff = swiglu_ffn(p, x_m, token_chunk if mesh is None else 1)
    ff = ff.astype(jnp.float32).reshape(b, T, n // T, c)
    xf = xf + (g_f[:, :, None] * ff).reshape(b, n, c)
    return xf


# ------------------------------------------------------------------ model


def longcat_dit_forward(params, cfg: LongCatDiTConfig, hidden_states,
                        timestep, encoder_hidden_states,
                        encoder_attention_mask=None,
                        num_cond_latents: int = 0,
                        policy: Policy = DEFAULT_POLICY,
                        attn_impl: str = "auto", mesh=None,
                        bsa_params=None,
                        remat: bool = False, token_chunk: int = 1):
    """hidden_states: [B, C_in, T, H, W]; timestep: [B] or [B, T'] (per-frame,
    the WF i2v path zeroes frame 0); encoder_hidden_states: [B, M, 4096];
    encoder_attention_mask: [B, M] (1=valid). Returns [B, C_out, T, H, W]
    fp32 (longcat_video_dit.py:280-370)."""
    from worldforge_tpu.models.wan.dit import patchify, unpatchify

    b, _, T, H, W = hidden_states.shape
    pt, ph, pw = cfg.patch_size
    nt, nh, nw = T // pt, H // ph, W // pw

    if timestep.ndim == 1:
        timestep = jnp.broadcast_to(timestep[:, None], (b, nt))

    x = P.dense(params["x_embedder"],
                patchify(hidden_states.astype(policy.compute_dtype),
                         cfg.patch_size),
                compute_dtype=policy.compute_dtype)
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as PS
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PS("dp", "sp", None)))

    te = timestep_embedding(timestep.reshape(-1),
                            cfg.frequency_embedding_size)
    te = P.dense(params["t_embedder"]["fc1"], te, compute_dtype=jnp.float32)
    te = P.dense(params["t_embedder"]["fc2"], jax.nn.silu(te),
                 compute_dtype=jnp.float32)
    t_emb = te.reshape(b, nt, cfg.adaln_tembed_dim)

    ctx = P.dense(params["y_embedder"]["fc2"], P.gelu_tanh(
        P.dense(params["y_embedder"]["fc1"],
                encoder_hidden_states.astype(policy.compute_dtype))))
    kv_lens = (encoder_attention_mask.sum(axis=1).astype(jnp.int32)
               if encoder_attention_mask is not None else None)

    cos, sin = rope_cos_sin(nt, nh, nw, cfg.head_dim)

    def body(carry, layer):
        out = longcat_layer_forward(layer, cfg, carry, t_emb, ctx, kv_lens,
                                    cos, sin, nt, num_cond_latents, policy,
                                    attn_impl, mesh, (nt, nh, nw),
                                    bsa_params, token_chunk=token_chunk)
        return out, None

    if remat:
        body = jax.checkpoint(body)
    xN, _ = jax.lax.scan(body, x.astype(jnp.float32), params["blocks"])

    # final layer (blocks.py:140-163)
    fmod = P.dense(params["final"]["adaln"],
                   jax.nn.silu(t_emb.astype(jnp.float32)),
                   compute_dtype=jnp.float32)
    sh, sc = jnp.split(fmod, 2, axis=-1)
    xN = _modulate_per_frame(xN, sh, sc, nt, cfg.eps)
    out = P.dense(params["final"]["linear"], xN, compute_dtype=jnp.float32)
    return unpatchify(out, (nt, nh, nw), cfg.patch_size,
                      cfg.out_channels).astype(jnp.float32)


# ----------------------------------------------------------- KV cache


def longcat_dit_cache_cond(params, cfg: LongCatDiTConfig, cond_latents,
                           policy: Policy = DEFAULT_POLICY,
                           cache_dtype=jnp.float32, mesh=None):
    """Run the DiT over CLEAN conditioning latents only (timestep 0, cross-
    attn skipped) and return per-layer (k, v) caches of the cond tokens —
    pre-RoPE, post-QK-norm, matching Attention.forward(return_kv=True)
    (attention.py:120-122; pipeline _cache_clean_latents :336-348).

    Returns (kv_cache [L, 2, B, Sc, H, D]) stacked for scan.

    cache_dtype: fp32 matches the reference bit-for-bit (the joint-forward
    exact-match gate in tests/test_longcat_vc.py); bf16 HALVES the cache —
    on a 16 GB chip the production vc config's fp32 cache alone is 9.1 GB
    (48L x 2 x 6240 tokens x 4096 x 4B) and cannot coexist with the int4
    DiT (measured RESOURCE_EXHAUSTED, round 4), while the bf16 cache
    (4.6 GB) fits; drift is gated in tests/test_longcat_vc.py (the
    attention consuming the cache runs bf16 q/k/v anyway — only the
    fp32->bf16 rounding BEFORE RoPE differs)."""
    from worldforge_tpu.models.wan.dit import patchify

    b, _, T, H, W = cond_latents.shape
    pt, ph, pw = cfg.patch_size
    nt, nh, nw = T // pt, H // ph, W // pw

    x = P.dense(params["x_embedder"],
                patchify(cond_latents.astype(policy.compute_dtype),
                         cfg.patch_size),
                compute_dtype=policy.compute_dtype)
    sp = mesh.shape.get("sp", 1) if mesh is not None else 1
    sp_on = (sp > 1 and (nt * nh * nw) % sp == 0
             and cfg.num_heads % sp == 0)
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as PS
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PS("dp", "sp" if sp_on else None,
                                      None)))

    te = timestep_embedding(jnp.zeros((b * nt,), jnp.float32),
                            cfg.frequency_embedding_size)
    te = P.dense(params["t_embedder"]["fc1"], te, compute_dtype=jnp.float32)
    te = P.dense(params["t_embedder"]["fc2"], jax.nn.silu(te),
                 compute_dtype=jnp.float32)
    t_emb = te.reshape(b, nt, cfg.adaln_tembed_dim)

    cos, sin = rope_cos_sin(nt, nh, nw, cfg.head_dim)
    h = cfg.num_heads
    cdt = policy.compute_dtype

    def body(carry, layer):
        xf = carry
        mod = P.dense(layer["adaln"], jax.nn.silu(t_emb),
                      compute_dtype=jnp.float32)
        sh_a, sc_a, g_a, sh_f, sc_f, g_f = jnp.split(mod, 6, axis=-1)
        x_m = _modulate_per_frame(xf, sh_a, sc_a, nt, cfg.eps).astype(cdt)
        qkv = P.dense(layer["qkv"], x_m)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rms_hd(layer["q_norm"], _heads_hd(q, h), cfg.eps)
        k = _rms_hd(layer["k_norm"], _heads_hd(k, h), cfg.eps)
        v_h = _heads_hd(v, h)
        kv = jnp.stack([k.astype(cache_dtype), v_h.astype(cache_dtype)])
        if sp_on:
            from jax.sharding import NamedSharding, PartitionSpec as PS
            kv = jax.lax.with_sharding_constraint(
                kv, NamedSharding(mesh, PS(None, "dp", "sp", None, None)))
        # continue the forward so later layers cache the right activations
        qr, kr = apply_rope_qk(q, k, cos, sin, out_dtype=cdt)
        if sp_on:
            from worldforge_tpu.parallel.ulysses import ulysses_attention
            o = ulysses_attention(qr, kr, v_h.astype(cdt), mesh=mesh)
        else:
            o = attention(qr, kr, v_h.astype(cdt))
        o = P.dense(layer["attn_proj"],
                    o.reshape(xf.shape[0], xf.shape[1], cfg.hidden_size)
                    .astype(cdt))
        of = o.astype(jnp.float32).reshape(xf.shape[0], nt, -1,
                                           cfg.hidden_size)
        xf = xf + (g_a[:, :, None] * of).reshape(xf.shape)
        # skip_crs_attn=True: no cross attention during caching (:336-348)
        x_m2 = _modulate_per_frame(xf, sh_f, sc_f, nt, cfg.eps).astype(cdt)
        ff = P.dense(layer["w2"], jax.nn.silu(P.dense(layer["w1"], x_m2))
                     * P.dense(layer["w3"], x_m2))
        ff = ff.astype(jnp.float32).reshape(xf.shape[0], nt, -1,
                                            cfg.hidden_size)
        xf = xf + (g_f[:, :, None] * ff).reshape(xf.shape)
        return xf, kv

    _, kv_cache = jax.lax.scan(body, x.astype(jnp.float32),
                               params["blocks"])
    return kv_cache  # [L, 2, B, Sc, H, D]


def longcat_dit_forward_with_cache(params, cfg: LongCatDiTConfig,
                                   hidden_states, timestep,
                                   encoder_hidden_states, kv_cache,
                                   cond_grid, encoder_attention_mask=None,
                                   policy: Policy = DEFAULT_POLICY,
                                   attn_impl: str = "auto", mesh=None):
    """Denoise NOISE latents with cond-token KV caches
    (Attention.forward_with_kv_cache, attention.py:149-181: RoPE re-applied
    over the concatenated (T_cond + T) grid; cross-attn on noise tokens
    only but without zero-fill since cond tokens are absent here).

    hidden_states: [B, C, T, H, W] (noise part only); cond_grid: (Tc,) cond
    latent frames; kv_cache: [L, 2, B, Sc, H, D].

    mesh: with an sp axis >1, noise tokens AND the cached cond tokens are
    sequence-sharded and every self-attention runs through the Ulysses
    all-to-all path (q over the noise tokens, k/v over cache||fresh —
    both global sequence lengths must divide sp, heads must divide sp);
    the multi-chip vc serving layout."""
    from worldforge_tpu.models.wan.dit import patchify, unpatchify

    b, _, T, H, W = hidden_states.shape
    pt, ph, pw = cfg.patch_size
    nt, nh, nw = T // pt, H // ph, W // pw
    tc = cond_grid[0]
    n_cond = tc * nh * nw

    if timestep.ndim == 1:
        timestep = jnp.broadcast_to(timestep[:, None], (b, nt))

    x = P.dense(params["x_embedder"],
                patchify(hidden_states.astype(policy.compute_dtype),
                         cfg.patch_size),
                compute_dtype=policy.compute_dtype)
    sp = mesh.shape.get("sp", 1) if mesh is not None else 1
    n_noise = nt * nh * nw
    # static guard: Ulysses needs every attention operand's sequence AND
    # the head count divisible by sp (shard_map hard-errors otherwise)
    sp_on = (sp > 1 and n_noise % sp == 0 and (n_cond + n_noise) % sp == 0
             and cfg.num_heads % sp == 0)
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as PS
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PS("dp", "sp" if sp_on else None,
                                      None)))
        if sp_on:
            kv_cache = jax.lax.with_sharding_constraint(
                kv_cache, NamedSharding(
                    mesh, PS(None, None, "dp", "sp", None, None)))
    te = timestep_embedding(timestep.reshape(-1),
                            cfg.frequency_embedding_size)
    te = P.dense(params["t_embedder"]["fc1"], te, compute_dtype=jnp.float32)
    te = P.dense(params["t_embedder"]["fc2"], jax.nn.silu(te),
                 compute_dtype=jnp.float32)
    t_emb = te.reshape(b, nt, cfg.adaln_tembed_dim)

    ctx = P.dense(params["y_embedder"]["fc2"], P.gelu_tanh(
        P.dense(params["y_embedder"]["fc1"],
                encoder_hidden_states.astype(policy.compute_dtype))))
    kv_lens = (encoder_attention_mask.sum(axis=1).astype(jnp.int32)
               if encoder_attention_mask is not None else None)

    cos_full, sin_full = rope_cos_sin(tc + nt, nh, nw, cfg.head_dim)
    cos_q, sin_q = cos_full[n_cond:], sin_full[n_cond:]
    h = cfg.num_heads
    cdt = policy.compute_dtype

    def body(carry, inputs):
        layer, kv = inputs
        xf = carry
        mod = P.dense(layer["adaln"], jax.nn.silu(t_emb),
                      compute_dtype=jnp.float32)
        sh_a, sc_a, g_a, sh_f, sc_f, g_f = jnp.split(mod, 6, axis=-1)
        x_m = _modulate_per_frame(xf, sh_a, sc_a, nt, cfg.eps).astype(cdt)
        qkv = P.dense(layer["qkv"], x_m)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rms_hd(layer["q_norm"], _heads_hd(q, h), cfg.eps)
        k = _rms_hd(layer["k_norm"], _heads_hd(k, h), cfg.eps)
        v_h = _heads_hd(v, h)
        k_full = jnp.concatenate([kv[0].astype(jnp.float32), k], axis=1)
        v_full = jnp.concatenate([kv[1].astype(cdt), v_h.astype(cdt)],
                                 axis=1)
        q = apply_rope(q, cos_q, sin_q, out_dtype=cdt)
        k_full = apply_rope(k_full, cos_full, sin_full, out_dtype=cdt)
        if sp_on:
            from worldforge_tpu.parallel.ulysses import ulysses_attention
            o = ulysses_attention(q, k_full, v_full, mesh=mesh,
                                  impl=attn_impl)
        else:
            o = attention(q, k_full, v_full, impl=attn_impl)
        o = P.dense(layer["attn_proj"],
                    o.reshape(b, nt * nh * nw, cfg.hidden_size).astype(cdt))
        of = o.astype(jnp.float32).reshape(b, nt, -1, cfg.hidden_size)
        xf = xf + (g_a[:, :, None] * of).reshape(xf.shape)

        h2 = P.layer_norm(layer["pre_crs_norm"], xf, eps=cfg.eps,
                          out_dtype=cdt)
        xf = xf + _cross_attention_lc(layer, cfg, h2, ctx, kv_lens, nt, 0,
                                      policy, attn_impl).astype(jnp.float32)

        x_m2 = _modulate_per_frame(xf, sh_f, sc_f, nt, cfg.eps).astype(cdt)
        ff = P.dense(layer["w2"], jax.nn.silu(P.dense(layer["w1"], x_m2))
                     * P.dense(layer["w3"], x_m2))
        ff = ff.astype(jnp.float32).reshape(b, nt, -1, cfg.hidden_size)
        xf = xf + (g_f[:, :, None] * ff).reshape(xf.shape)
        return xf, None

    xN, _ = jax.lax.scan(body, x.astype(jnp.float32),
                         (params["blocks"], kv_cache))

    fmod = P.dense(params["final"]["adaln"], jax.nn.silu(t_emb),
                   compute_dtype=jnp.float32)
    sh, sc = jnp.split(fmod, 2, axis=-1)
    xN = _modulate_per_frame(xN, sh, sc, nt, cfg.eps)
    out = P.dense(params["final"]["linear"], xN, compute_dtype=jnp.float32)
    return unpatchify(out, (nt, nh, nw), cfg.patch_size,
                      cfg.out_channels).astype(jnp.float32)


# ------------------------------------------------------------------ LoRA


def merge_lora(params: dict, lora: Dict[str, dict], scale: float = 1.0):
    """Merge additive low-rank adapters into the weights: w += scale *
    multiplier * (alpha/dim) * down @ up. ``lora`` maps a '/'-joined param
    path to {down [in,r], up [r,out], alpha, multiplier}. Returns a new
    params tree (reference toggles LoRA at runtime via forward patching,
    longcat_video_dit.py:197-270; merging is the inference-equivalent)."""
    import copy
    out = jax.tree_util.tree_map(lambda x: x, params)

    for path, adapter in lora.items():
        keys = path.split("/")
        node = out
        for k in keys[:-1]:
            node[k] = dict(node[k]) if isinstance(node[k], dict) else node[k]
            node = node[k]
        leaf = node[keys[-1]]
        down, up = adapter["down"], adapter["up"]
        alpha_scale = adapter.get("alpha", down.shape[1]) / down.shape[1]
        delta = (down.astype(jnp.float32) @ up.astype(jnp.float32)
                 * adapter.get("multiplier", 1.0) * alpha_scale * scale)
        node[keys[-1]] = dict(leaf)
        node[keys[-1]]["w"] = (leaf["w"].astype(jnp.float32)
                               + delta).astype(leaf["w"].dtype)
    return out


def unmerge_lora(params: dict, lora: Dict[str, dict], scale: float = 1.0):
    return merge_lora(params, lora, scale=-scale)
