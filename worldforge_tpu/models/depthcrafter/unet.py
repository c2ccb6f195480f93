"""SVD spatio-temporal UNet (DepthCrafter's denoiser), JAX.

The reference vendors only a thin subclass
(/root/reference/DepthCrafter/DepthCrafter/depthcrafter/unet.py:8-142 — it
reshapes per-frame CLIP embeddings [B,T,1024] -> [B*T,1,1024]); the base
architecture is diffusers' UNetSpatioTemporalConditionModel (pip dependency,
re-implemented here TPU-first with channels-last layouts):

  - conv_in (8 -> 320); sinusoidal time embedding ([cos|sin], dim 320) ->
    MLP 1280; added_time_ids (fps, motion_bucket, noise_aug) -> 3x256
    sinusoids -> MLP 1280, summed into the timestep embedding
  - 4 down blocks (320, 640, 1280, 1280; 3 cross-attn + 1 plain), mirrored
    up blocks with skip concatenation, mid block
  - every res stage is a SpatioTemporalResBlock: spatial ResnetBlock2D +
    temporal ResnetBlock (k=(3,1,1)) blended by a learned AlphaBlender
    (alpha = sigmoid(mix), spatial/temporal switch flag)
  - every attention stage is a TransformerSpatioTemporalModel: spatial
    basic transformer block (self + cross + GEGLU ff) and a temporal block
    over frames (ff_in residual, self-attn over time, cross-attn to the
    FIRST frame's CLIP context, ff) with sinusoidal frame-position
    embeddings; blended by an AlphaBlender

Parameter names/shapes mirror the diffusers state dict so checkpoint
conversion is mechanical (convert_depthcrafter.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from worldforge_tpu.core import params as P
from worldforge_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class SVDUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    addition_time_embed_dim: int = 256
    projection_dim: int = 768  # 3 ids x 256
    transformer_layers: int = 1
    norm_eps: float = 1e-5

    @property
    def temb_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @classmethod
    def svd(cls) -> "SVDUNetConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "SVDUNetConfig":
        return cls(block_out_channels=(8, 16, 16, 16),
                   num_attention_heads=(1, 2, 2, 2), layers_per_block=1,
                   cross_attention_dim=16, addition_time_embed_dim=8,
                   projection_dim=24)


# ---------------------------------------------------------------- pieces


def sinusoidal_timestep_embedding(t, dim, max_period=10000.0,
                                  flip_sin_to_cos=True,
                                  downscale_freq_shift=0.0):
    """diffusers Timesteps: exp(-ln(P) * i / (half - shift)) freqs;
    flip_sin_to_cos=True -> [cos | sin]."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                           axis=-1)


def _conv(key, cin, cout, k, dtype):
    return P.conv_init(key, cin, cout, (k, k), dtype=dtype)


def _conv2d(p, x, stride=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    kh = p["w"].shape[0]
    pad = [(kh // 2, kh // 2)] * 2 if stride == 1 else [(1, 1), (1, 1)]
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype),
                                     (stride, stride), pad,
                                     dimension_numbers=dn)
    return y + p["b"].astype(y.dtype)


def _conv_t(p, x):
    """Temporal conv (3,1,1) over [BHW?, F, C]-style: x [N, F, H, W, C]."""
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), (1, 1, 1),
                                     [(1, 1), (0, 0), (0, 0)],
                                     dimension_numbers=dn)
    return y + p["b"].astype(y.dtype)


# ------------------------------------------------------- res blocks


def _res2d_init(key, cin, cout, temb, dtype):
    ks = P.split_keys(key, 4)
    p = {
        "norm1": P.group_norm_init(cin, dtype),
        "conv1": _conv(ks[0], cin, cout, 3, dtype),
        "time_emb_proj": P.dense_init(ks[1], temb, cout, dtype=dtype),
        "norm2": P.group_norm_init(cout, dtype),
        "conv2": _conv(ks[2], cout, cout, 3, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv(ks[3], cin, cout, 1, dtype)
    return p


def _res2d(p, x, temb, eps):
    """ResnetBlock2D: x [N,H,W,C], temb [N, temb_dim] or None."""
    h = jax.nn.silu(P.group_norm(p["norm1"], x, eps=eps))
    h = _conv2d(p["conv1"], h)
    if temb is not None and "time_emb_proj" in p:
        t = P.dense(p["time_emb_proj"], jax.nn.silu(temb))
        h = h + t[:, None, None, :]
    h = jax.nn.silu(P.group_norm(p["norm2"], h, eps=eps))
    h = _conv2d(p["conv2"], h)
    skip = _conv2d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    return h + skip


def _res_temporal_init(key, c, temb, dtype):
    ks = P.split_keys(key, 3)
    return {
        "norm1": P.group_norm_init(c, dtype),
        "conv1": P.conv_init(ks[0], c, c, (3, 1, 1), dtype=dtype),
        "time_emb_proj": P.dense_init(ks[1], temb, c, dtype=dtype),
        "norm2": P.group_norm_init(c, dtype),
        "conv2": P.conv_init(ks[2], c, c, (3, 1, 1), dtype=dtype),
    }


def _res_temporal(p, x, temb, eps):
    """TemporalResnetBlock: x [B, F, H, W, C], temb [B, F, temb_dim]|None."""
    b, f, hh, ww, c = x.shape
    flat = x.reshape(b * f, hh, ww, c)
    h = jax.nn.silu(P.group_norm(p["norm1"], flat, eps=eps)).reshape(x.shape)
    h = _conv_t(p["conv1"], h)
    if temb is not None and "time_emb_proj" in p:
        t = P.dense(p["time_emb_proj"], jax.nn.silu(temb))
        h = h + t[:, :, None, None, :]
    hf = h.reshape(b * f, hh, ww, c)
    hf = jax.nn.silu(P.group_norm(p["norm2"], hf, eps=eps)).reshape(x.shape)
    h = _conv_t(p["conv2"], hf)
    return h + x


def _alpha_blend(p, x_spatial, x_temporal, switch: bool):
    """AlphaBlender 'learned_with_images' for video (image_only_indicator
    all-zero): alpha = sigmoid(mix_factor); if switch: alpha = 1 - alpha;
    x = alpha*x_spatial + (1-alpha)*x_temporal."""
    alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32))
    if switch:
        alpha = 1.0 - alpha
    return (alpha * x_spatial.astype(jnp.float32)
            + (1.0 - alpha) * x_temporal.astype(jnp.float32)
            ).astype(x_spatial.dtype)


def _st_res_init(key, cin, cout, temb, dtype):
    ks = P.split_keys(key, 2)
    p = {
        "spatial_res_block": _res2d_init(ks[0], cin, cout, max(temb, 1),
                                         dtype),
        "temporal_res_block": _res_temporal_init(ks[1], cout, max(temb, 1),
                                                 dtype),
        "time_mixer": {"mix_factor": jnp.asarray([0.5], jnp.float32)},
    }
    if temb <= 0:  # no timestep conditioning (temporal VAE decoder)
        p["spatial_res_block"].pop("time_emb_proj")
        p["temporal_res_block"].pop("time_emb_proj")
    return p


def _st_res(p, x, temb, num_frames, eps):
    """SpatioTemporalResBlock: x [B*F, H, W, C], temb [B*F, D] or None."""
    h_sp = _res2d(p["spatial_res_block"], x, temb, eps)
    bf, hh, ww, c = h_sp.shape
    b = bf // num_frames
    h5 = h_sp.reshape(b, num_frames, hh, ww, c)
    temb5 = temb.reshape(b, num_frames, -1) if temb is not None else None
    h_tp = _res_temporal(p["temporal_res_block"], h5, temb5, eps)
    out = _alpha_blend(p["time_mixer"], h5, h_tp, switch=True)
    return out.reshape(bf, hh, ww, c)


# ------------------------------------------------------- transformers


def _attn_init(key, dim, ctx_dim, dtype):
    ks = P.split_keys(key, 4)
    return {
        "to_q": P.dense_init(ks[0], dim, dim, bias=False, dtype=dtype),
        "to_k": P.dense_init(ks[1], ctx_dim, dim, bias=False, dtype=dtype),
        "to_v": P.dense_init(ks[2], ctx_dim, dim, bias=False, dtype=dtype),
        "to_out": P.dense_init(ks[3], dim, dim, dtype=dtype),
    }


def _attn(p, x, ctx, heads):
    b, s, d = x.shape
    q = P.dense(p["to_q"], x).reshape(b, s, heads, d // heads)
    k = P.dense(p["to_k"], ctx).reshape(b, ctx.shape[1], heads, d // heads)
    v = P.dense(p["to_v"], ctx).reshape(b, ctx.shape[1], heads, d // heads)
    o = attention(q, k, v).reshape(b, s, d)
    return P.dense(p["to_out"], o)


def _geglu_init(key, dim, dtype):
    ks = P.split_keys(key, 2)
    return {"proj": P.dense_init(ks[0], dim, dim * 8, dtype=dtype),
            "out": P.dense_init(ks[1], dim * 4, dim, dtype=dtype)}


def _geglu(p, x):
    h = P.dense(p["proj"], x)
    a, g = jnp.split(h, 2, axis=-1)
    return P.dense(p["out"], a * jax.nn.gelu(g, approximate=False))


def _basic_block_init(key, dim, ctx_dim, dtype):
    ks = P.split_keys(key, 3)
    return {
        "norm1": P.layer_norm_init(dim, dtype=dtype),
        "attn1": _attn_init(ks[0], dim, dim, dtype),
        "norm2": P.layer_norm_init(dim, dtype=dtype),
        "attn2": _attn_init(ks[1], dim, ctx_dim, dtype),
        "norm3": P.layer_norm_init(dim, dtype=dtype),
        "ff": _geglu_init(ks[2], dim, dtype),
    }


def _basic_block(p, x, ctx, heads):
    """BasicTransformerBlock — LayerNorm eps is torch's nn.LayerNorm
    default 1e-5 (diffusers attention.py BasicTransformerBlock norm_eps),
    NOT this repo's 1e-6 house default."""
    h = P.layer_norm(p["norm1"], x, eps=1e-5)
    x = x + _attn(p["attn1"], h, h, heads)
    x = x + _attn(p["attn2"], P.layer_norm(p["norm2"], x, eps=1e-5), ctx,
                  heads)
    return x + _geglu(p["ff"], P.layer_norm(p["norm3"], x, eps=1e-5))


def _temporal_block_init(key, dim, ctx_dim, dtype):
    ks = P.split_keys(key, 4)
    return {
        "norm_in": P.layer_norm_init(dim, dtype=dtype),
        "ff_in": _geglu_init(ks[0], dim, dtype),
        "norm1": P.layer_norm_init(dim, dtype=dtype),
        "attn1": _attn_init(ks[1], dim, dim, dtype),
        "norm2": P.layer_norm_init(dim, dtype=dtype),
        "attn2": _attn_init(ks[2], dim, ctx_dim, dtype),
        "norm3": P.layer_norm_init(dim, dtype=dtype),
        "ff": _geglu_init(ks[3], dim, dtype),
    }


def _temporal_block(p, x, time_ctx, heads):
    """TemporalBasicTransformerBlock: x [B*HW, F, C]. LayerNorm eps 1e-5
    (torch nn.LayerNorm default — diffusers uses plain nn.LayerNorm(dim)
    here)."""
    x = x + _geglu(p["ff_in"], P.layer_norm(p["norm_in"], x, eps=1e-5))
    h = P.layer_norm(p["norm1"], x, eps=1e-5)
    x = x + _attn(p["attn1"], h, h, heads)
    x = x + _attn(p["attn2"], P.layer_norm(p["norm2"], x, eps=1e-5),
                  time_ctx, heads)
    return x + _geglu(p["ff"], P.layer_norm(p["norm3"], x, eps=1e-5))


def _st_transformer_init(key, c, heads, ctx_dim, layers, dtype):
    ks = P.split_keys(key, 2 * layers + 4)
    return {
        "norm": P.group_norm_init(c, dtype),
        "proj_in": P.dense_init(ks[0], c, c, dtype=dtype),
        "blocks": [_basic_block_init(ks[1 + i], c, ctx_dim, dtype)
                   for i in range(layers)],
        "temporal_blocks": [_temporal_block_init(ks[1 + layers + i], c,
                                                 ctx_dim, dtype)
                            for i in range(layers)],
        "time_pos_embed": {
            "fc1": P.dense_init(ks[-2], c, c * 4, dtype=dtype),
            "fc2": P.dense_init(ks[-3], c * 4, c, dtype=dtype)},
        "time_mixer": {"mix_factor": jnp.asarray([0.5], jnp.float32)},
        "proj_out": P.dense_init(ks[-1], c, c, dtype=dtype),
    }


def _map_chunked(fn, n, *arrs):
    """Run fn over `n` equal chunks of the leading axis via lax.map —
    EXACT math (every row is independent through fn), but XLA allocates
    the transformer-block transients (q/k/v, GEGLU dim*8 inner) per chunk
    instead of for the whole batch. The capacity lever that lets the SVD
    UNet compile the published 1024x576 high-res windows on 16 GB
    (docs/PERF.md round-3: 110/72/48-frame windows rejected at compile —
    the full-res GEGLU inner alone is ~5 GB at 110f). Same pattern as the
    LongCat token-chunked FFN. The requested count rounds UP to the
    nearest divisor of the leading axis (the spatial blocks chunk over
    B*F while the temporal blocks chunk over B*H*W — one knob must serve
    both); axes with no divisor >= n run unchunked."""
    lead = arrs[0].shape[0]
    if n > 1 and lead % n:
        d = next((d for d in range(n, lead + 1) if lead % d == 0), 1)
        n = d if d <= 4 * n else 1  # prime-ish lead: don't serialize rows
    if n <= 1 or lead % n:
        return fn(*arrs)
    split = tuple(a.reshape(n, lead // n, *a.shape[1:]) for a in arrs)
    out = jax.lax.map(lambda t: fn(*t), split)
    return out.reshape(lead, *out.shape[2:])


def _st_transformer(p, x, ctx, num_frames, heads, eps, chunks=1):
    """TransformerSpatioTemporalModel: x [B*F, H, W, C], ctx [B*F, L, D]."""
    bf, hh, ww, c = x.shape
    b = bf // num_frames
    residual = x

    # temporal cross-attn context = FIRST frame's conditioning per batch,
    # broadcast to every spatial location (diffusers semantics)
    ctx_first = ctx.reshape(b, num_frames, *ctx.shape[1:])[:, 0]  # [B, L, D]
    time_ctx = jnp.broadcast_to(ctx_first[:, None],
                                (b, hh * ww, ctx.shape[1], ctx.shape[2]))
    time_ctx = time_ctx.reshape(b * hh * ww, ctx.shape[1], ctx.shape[2])

    h = P.group_norm(p["norm"], x, eps=1e-6)
    h = P.dense(p["proj_in"], h.reshape(bf, hh * ww, c))

    # frame position embeddings
    fpos = sinusoidal_timestep_embedding(
        jnp.arange(num_frames, dtype=jnp.float32), c)
    fpos = P.dense(p["time_pos_embed"]["fc2"], jax.nn.silu(
        P.dense(p["time_pos_embed"]["fc1"], fpos)))  # [F, C]

    for blk, tblk in zip(p["blocks"], p["temporal_blocks"]):
        h = _map_chunked(
            lambda hc, cc, _blk=blk: _basic_block(_blk, hc, cc, heads),
            chunks, h, ctx)
        ht = h.reshape(b, num_frames, hh * ww, c).transpose(0, 2, 1, 3)
        ht = ht.reshape(b * hh * ww, num_frames, c)
        ht = ht + fpos[None]
        ht = _map_chunked(
            lambda hc, cc, _blk=tblk: _temporal_block(_blk, hc, cc, heads),
            chunks, ht, time_ctx)
        ht = ht.reshape(b, hh * ww, num_frames, c).transpose(0, 2, 1, 3)
        ht = ht.reshape(bf, hh * ww, c)
        h = _alpha_blend(p["time_mixer"], h, ht, switch=False)

    h = P.dense(p["proj_out"], h).reshape(bf, hh, ww, c)
    return h + residual


# ------------------------------------------------------- top level


def init_svd_unet(key, cfg: SVDUNetConfig, dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 256))
    boc = cfg.block_out_channels
    temb = cfg.temb_dim
    params = {
        "conv_in": _conv(next(ks), cfg.in_channels, boc[0], 3, dtype),
        "time_embedding": {
            "fc1": P.dense_init(next(ks), boc[0], temb, dtype=dtype),
            "fc2": P.dense_init(next(ks), temb, temb, dtype=dtype)},
        "add_embedding": {
            "fc1": P.dense_init(next(ks), cfg.projection_dim, temb,
                                dtype=dtype),
            "fc2": P.dense_init(next(ks), temb, temb, dtype=dtype)},
        "down_blocks": [],
        "up_blocks": [],
        "conv_norm_out": P.group_norm_init(boc[0], dtype),
        "conv_out": _conv(next(ks), boc[0], cfg.out_channels, 3, dtype),
    }

    n = len(boc)
    for i in range(n):
        cin = boc[max(i - 1, 0)]
        cout = boc[i]
        has_attn = i < n - 1  # last down block is plain
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(_st_res_init(
                next(ks), cin if j == 0 else cout, cout, temb, dtype))
            if has_attn:
                blk["attentions"].append(_st_transformer_init(
                    next(ks), cout, cfg.num_attention_heads[i],
                    cfg.cross_attention_dim, cfg.transformer_layers, dtype))
        if i < n - 1:
            blk["downsampler"] = _conv(next(ks), cout, cout, 3, dtype)
        params["down_blocks"].append(blk)

    params["mid_block"] = {
        "resnets": [_st_res_init(next(ks), boc[-1], boc[-1], temb, dtype),
                    _st_res_init(next(ks), boc[-1], boc[-1], temb, dtype)],
        "attentions": [_st_transformer_init(
            next(ks), boc[-1], cfg.num_attention_heads[-1],
            cfg.cross_attention_dim, cfg.transformer_layers, dtype)],
    }

    rev = list(reversed(boc))
    for i in range(n):
        cout = rev[i]
        prev = rev[max(i - 1, 0)]
        has_attn = i > 0  # first up block is plain (mirrors down)
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            skip = rev[min(i + 1, n - 1)] if j == cfg.layers_per_block \
                else cout
            cin = (prev if j == 0 else cout) + skip
            blk["resnets"].append(_st_res_init(next(ks), cin, cout, temb,
                                               dtype))
            if has_attn:
                blk["attentions"].append(_st_transformer_init(
                    next(ks), cout, cfg.num_attention_heads[n - 1 - i],
                    cfg.cross_attention_dim, cfg.transformer_layers, dtype))
        if i < n - 1:
            blk["upsampler"] = _conv(next(ks), cout, cout, 3, dtype)
        params["up_blocks"].append(blk)
    return params


def svd_unet_forward(params, cfg: SVDUNetConfig, sample, timestep,
                     encoder_hidden_states, added_time_ids,
                     attn_chunks: int = 1):
    """sample: [B, F, C_in, H, W]; timestep: scalar or [B];
    encoder_hidden_states: [B, F, 1, 1024] per-frame CLIP tokens
    (DepthCrafter unet.py:61 flattens [B,T,1024] -> [B*T,1,1024]);
    added_time_ids: [B, 3]. Returns [B, F, C_out, H, W].

    attn_chunks: exact-math capacity knob — every spatio-temporal
    transformer block runs over that many leading-axis chunks via lax.map
    (see _map_chunked). 1 = the original single-pass program; ~8-16 is
    what lets the published 1024x576 high-res windows compile on a 16 GB
    v5e (the reference needs 26 GB for this config, README.md:180-184)."""
    b, f, cin, H, W = sample.shape
    eps = cfg.norm_eps

    t = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
    t_emb = sinusoidal_timestep_embedding(t, cfg.block_out_channels[0])
    emb = P.dense(params["time_embedding"]["fc2"], jax.nn.silu(
        P.dense(params["time_embedding"]["fc1"], t_emb)))
    ids = sinusoidal_timestep_embedding(
        added_time_ids.reshape(-1), cfg.addition_time_embed_dim)
    ids = ids.reshape(b, -1)
    aug = P.dense(params["add_embedding"]["fc2"], jax.nn.silu(
        P.dense(params["add_embedding"]["fc1"], ids)))
    emb = emb + aug                                # [B, temb]
    emb = jnp.repeat(emb, f, axis=0)               # [B*F, temb]

    ctx = encoder_hidden_states.reshape(b * f, *encoder_hidden_states.shape[2:])

    x = sample.reshape(b * f, cin, H, W).transpose(0, 2, 3, 1)
    x = _conv2d(params["conv_in"], x)

    res_stack = [x]
    n = len(cfg.block_out_channels)
    for i, blk in enumerate(params["down_blocks"]):
        for j, res in enumerate(blk["resnets"]):
            x = _st_res(res, x, emb, f, eps)
            if blk["attentions"]:
                x = _st_transformer(blk["attentions"][j], x, ctx, f,
                                    cfg.num_attention_heads[i], eps,
                                    chunks=attn_chunks)
            res_stack.append(x)
        if "downsampler" in blk:
            x = _conv2d(blk["downsampler"], x, stride=2)
            res_stack.append(x)

    mid = params["mid_block"]
    x = _st_res(mid["resnets"][0], x, emb, f, eps)
    x = _st_transformer(mid["attentions"][0], x, ctx, f,
                        cfg.num_attention_heads[-1], eps,
                        chunks=attn_chunks)
    x = _st_res(mid["resnets"][1], x, emb, f, eps)

    for i, blk in enumerate(params["up_blocks"]):
        for j, res in enumerate(blk["resnets"]):
            skip = res_stack.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = _st_res(res, x, emb, f, eps)
            if blk["attentions"]:
                x = _st_transformer(blk["attentions"][j], x, ctx, f,
                                    cfg.num_attention_heads[n - 1 - i], eps,
                                    chunks=attn_chunks)
        if "upsampler" in blk:
            bf2, hh, ww, c = x.shape
            x = jax.image.resize(x, (bf2, hh * 2, ww * 2, c), "nearest")
            x = _conv2d(blk["upsampler"], x)

    x = jax.nn.silu(P.group_norm(params["conv_norm_out"], x, eps=eps))
    x = _conv2d(params["conv_out"], x)
    return x.transpose(0, 3, 1, 2).reshape(b, f, cfg.out_channels, H, W)
