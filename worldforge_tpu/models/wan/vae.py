"""Wan causal 3D video VAE (z=16, stride t4 x s8), TPU-native.

Behavioral reference: /root/reference/wan_for_worldforge/wan/modules/vae.py
(WanVAE_; the active WF path uses the numerically identical diffusers
AutoencoderKLWan). Architecture: dim=96, dim_mult=[1,2,4,4],
num_res_blocks=2, attn_scales=[], temperal_downsample=[False,True,True]
(vae.py:592-604).

The reference's canonical path is *streaming* (feat-cache, 1+4k frame chunks,
vae.py:516-568). This implementation computes the mathematically equivalent
single pass:

  - CausalConv3d == front zero-pad 2 (k=3) on time + SAME spatial pad
    (vae.py:17-36; the chunked cache of the last 2 frames reproduces exactly
    this padding).
  - downsample3d (encoder): frame 0 passes through unchanged; output frame
    j>=1 is time_conv over input frames [2j-2, 2j-1, 2j] (stride-2 valid conv
    over x[0:], vae.py:143-159 streaming recurrence). T -> 1 + (T-1)//2.
  - upsample3d (decoder): frame 0 emits 1 frame (no time_conv, the 'Rep'
    branch, vae.py:103-137); each later frame i>=1 emits 2 frames from
    time_conv over [z[i-2], z[i-1], z[i]] (z[-1]=0), whose 2*C output
    channels split into (frame 2i-1, frame 2i). T -> 1 + 2*(T-1).
  - RMS_norm = F.normalize(x, dim=C) * sqrt(C) * gamma (vae.py:39-54).
  - AttentionBlock: per-frame single-head spatial attention at the lowest
    scale (vae.py:223-262).

Layout is channels-last [B, T, H, W, C] internally (TPU-friendly convs);
the public API uses the reference's [B, C, T, H, W].
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.ops.attention import attention

# Per-channel latent statistics (model metadata, vae.py:629-639).
WAN_LATENTS_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], dtype=np.float32)
WAN_LATENTS_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temporal_upsample(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.temporal_downsample))

    @classmethod
    def wan_2_1(cls) -> "WanVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "WanVAEConfig":
        return cls(dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1)


# --------------------------------------------------------------- primitives


# conv3d lowering: "3d" = native lax 3D conv; "2d" = decompose the k_t
# temporal taps into k_t temporally-shifted 2D convs summed (identical
# math, different XLA lowering — TPU's Conv2D emitter is often faster
# than Conv3D at VAE channel widths); "pallas"/"pallas_interpret" =
# ops/conv3d.py halo-tile MXU kernel (bf16 taps, fp32 acc) for the
# stride-1 3x3x3 case, other cases fall back to "3d". Switched after an
# on-chip A/B; tests/test_vae_conv2d.py pins equivalence.
_CONV3D_MODE = "3d"


def _causal_conv3d(p, x, *, stride_t: int = 1, kt: int = 3,
                   spatial_same: bool = True, front_pad: Optional[int] = None):
    """x: [B,T,H,W,C]; kernel p['w']: [kt,kh,kw,in,out]. Temporal padding is
    causal: (kt-1) zeros in front by default."""
    if front_pad is None:
        front_pad = p["w"].shape[0] - 1
    if front_pad:
        x = jnp.pad(x, ((0, 0), (front_pad, 0), (0, 0), (0, 0), (0, 0)))
    if _CONV3D_MODE == "2d" and p["w"].shape[0] > 1 and p["w"].shape[1] > 1:
        return _causal_conv3d_as_2d(p, x, stride_t=stride_t,
                                    spatial_same=spatial_same)
    if (_CONV3D_MODE.startswith("pallas") and p["w"].shape[:3] == (3, 3, 3)
            and stride_t == 1 and spatial_same and x.shape[1] >= 3):
        from worldforge_tpu.ops.conv3d import conv3d_causal_pallas
        return conv3d_causal_pallas(
            x, p["w"], p.get("b"), out_dtype=x.dtype,
            interpret=_CONV3D_MODE == "pallas_interpret")
    kh = p["w"].shape[1]
    pad_s = "SAME" if spatial_same and kh > 1 else "VALID"
    # temporal padding already applied -> VALID on T
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    pad = [(0, 0)] + ([(kh // 2, kh // 2)] * 2 if pad_s == "SAME" else [(0, 0)] * 2)
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype),
                                     window_strides=(stride_t, 1, 1),
                                     padding=pad, dimension_numbers=dn)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _causal_conv3d_as_2d(p, x, *, stride_t: int, spatial_same: bool):
    """Same contract as the native branch of _causal_conv3d AFTER temporal
    padding: y[t] = sum_kt conv2d(x[t*stride_t + kt], w[kt]). x: [B,Tp,H,W,C]
    (already front-padded), kernel [kt,kh,kw,in,out]."""
    ktaps, kh = p["w"].shape[0], p["w"].shape[1]
    b, tp, hh, ww, c = x.shape
    t_out = (tp - ktaps) // stride_t + 1
    dn = None
    pad = ([(kh // 2, kh // 2)] * 2 if spatial_same and kh > 1
           else [(0, 0)] * 2)
    y = None
    for k in range(ktaps):
        xs = x[:, k:k + (t_out - 1) * stride_t + 1:stride_t]
        flat = xs.reshape(b * t_out, hh, ww, c)
        if dn is None:
            dn = jax.lax.conv_dimension_numbers(
                flat.shape, p["w"].shape[1:], ("NHWC", "HWIO", "NHWC"))
        yk = jax.lax.conv_general_dilated(
            flat, p["w"][k].astype(x.dtype), window_strides=(1, 1),
            padding=pad, dimension_numbers=dn)
        y = yk if y is None else y + yk
    y = y.reshape(b, t_out, y.shape[1], y.shape[2], y.shape[3])
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _conv2d(p, x, *, stride: int = 1, padding="SAME"):
    """x: [N,H,W,C], kernel [kh,kw,in,out]."""
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype),
                                     window_strides=(stride, stride),
                                     padding=padding, dimension_numbers=dn)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _rms_norm_c(p, x, eps: float = 1e-12):
    """F.normalize(x, dim=C)*sqrt(C)*gamma over the last axis (vae.py:39-54)."""
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    y = xf / jnp.maximum(n, eps) * math.sqrt(x.shape[-1])
    return (y * p["gamma"].astype(jnp.float32)).astype(x.dtype)


# --------------------------------------------------------------- blocks


def _res_block_init(key, cin, cout, dtype):
    ks = P.split_keys(key, 3)
    p = {
        "norm1": {"gamma": jnp.ones((cin,), dtype)},
        "conv1": P.conv_init(ks[0], cin, cout, (3, 3, 3), dtype=dtype),
        "norm2": {"gamma": jnp.ones((cout,), dtype)},
        "conv2": P.conv_init(ks[1], cout, cout, (3, 3, 3), dtype=dtype),
    }
    if cin != cout:
        p["shortcut"] = P.conv_init(ks[2], cin, cout, (1, 1, 1), dtype=dtype)
    return p


def _res_block(p, x):
    h = _rms_norm_c(p["norm1"], x)
    h = _causal_conv3d(p["conv1"], jax.nn.silu(h))
    h = _rms_norm_c(p["norm2"], h)
    h = _causal_conv3d(p["conv2"], jax.nn.silu(h))
    s = _causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    return h + s


def _attn_block_init(key, c, dtype):
    ks = P.split_keys(key, 2)
    return {
        "norm": {"gamma": jnp.ones((c,), dtype)},
        "qkv": P.conv_init(ks[0], c, c * 3, (1, 1), dtype=dtype),
        "proj": {"w": jnp.zeros((1, 1, c, c), dtype),
                 "b": jnp.zeros((c,), dtype)},  # zero-init (vae.py:238)
    }


def _attn_block(p, x):
    """Per-frame single-head spatial attention (vae.py:240-262)."""
    b, t, h, w, c = x.shape
    xn = _rms_norm_c(p["norm"], x)
    flat = xn.reshape(b * t, h, w, c)
    qkv = _conv2d(p["qkv"], flat).reshape(b * t, h * w, 3, 1, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [bt, hw, 1, c]
    o = attention(q, k, v)  # single head
    o = o.reshape(b * t, h, w, c)
    o = _conv2d(p["proj"], o)
    return x + o.reshape(b, t, h, w, c)


def _downsample_init(key, c, temporal, dtype):
    ks = P.split_keys(key, 2)
    p = {"conv": P.conv_init(ks[0], c, c, (3, 3), dtype=dtype)}
    if temporal:
        p["time_conv"] = P.conv_init(ks[1], c, c, (3, 1, 1), dtype=dtype)
    return p


def _downsample(p, x, temporal: bool):
    b, t, h, w, c = x.shape
    # spatial: ZeroPad2d(right=1, bottom=1) + 3x3 stride-2 valid (vae.py:87-94)
    flat = x.reshape(b * t, h, w, c)
    flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(flat.shape, p["conv"]["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(flat, p["conv"]["w"].astype(x.dtype),
                                     window_strides=(2, 2), padding="VALID",
                                     dimension_numbers=dn)
    y = y + p["conv"]["b"].astype(y.dtype)
    h2, w2 = y.shape[1], y.shape[2]
    y = y.reshape(b, t, h2, w2, c)
    if temporal and t > 1:
        # frame 0 identity; frame j>=1 = conv(y[2j-2 : 2j+1]) (streaming
        # recurrence, vae.py:143-159)
        first = y[:, :1]
        rest = _causal_conv3d(p["time_conv"], y, stride_t=2, front_pad=0)
        y = jnp.concatenate([first, rest], axis=1)
    return y


def _upsample_init(key, c, temporal, dtype):
    ks = P.split_keys(key, 2)
    p = {"conv": P.conv_init(ks[0], c, c // 2, (3, 3), dtype=dtype)}
    if temporal:
        p["time_conv"] = P.conv_init(ks[1], c, c * 2, (3, 1, 1), dtype=dtype)
    return p


def _upsample(p, x, temporal: bool):
    b, t, h, w, c = x.shape
    if temporal and t > 1:
        # frame 0: no temporal expansion ('Rep' branch vae.py:103-137);
        # frame i>=1: time_conv over [m[i-2], m[i-1], m[i]] with m[0]=0 and
        # m[-1]=0 — the streaming cache replaces frame 0 by zeros in every
        # window (the 'Rep' sentinel path stores cat([zeros, x1]) as cache,
        # vae.py:120-126), so frame 0 never feeds the time conv. Output 2C
        # channels = 2 output frames.
        m = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, 1:]], axis=1)
        xp = jnp.pad(m, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        y2 = _causal_conv3d(p["time_conv"], xp, front_pad=0)
        # xp has t+1 frames; valid conv k=3 -> t-1 outputs, for i=1..t-1
        frames = [x[:, :1]]
        a, bb = jnp.split(y2, 2, axis=-1)  # first half ch = frame 2i-1
        inter = jnp.stack([a, bb], axis=2).reshape(b, 2 * (t - 1), h, w, c)
        frames.append(inter)
        x = jnp.concatenate(frames, axis=1)
        t = x.shape[1]
    # spatial nearest-exact 2x + 3x3 conv c -> c/2 (vae.py:76-83). Note: a
    # subpixel rewrite (four 2x2 convs on the source grid, 4/9 FLOPs, no 4x
    # intermediate) measured SLOWER on v5e (4.16 s vs 3.33 s full decode) —
    # XLA's 2x2 convs + output interleave cost more than the saved FLOPs.
    flat = x.reshape(b * t, h, w, x.shape[-1])
    up = jnp.repeat(jnp.repeat(flat, 2, axis=1), 2, axis=2)
    y = _conv2d(p["conv"], up)
    return y.reshape(b, t, 2 * h, 2 * w, y.shape[-1])


# --------------------------------------------------------------- model


def init_wan_vae(key, cfg: WanVAEConfig = WanVAEConfig(),
                 dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 64))
    d = cfg.dim
    dims = [d * u for u in (1,) + tuple(cfg.dim_mult)]
    z2 = cfg.z_dim * 2

    enc: dict = {"conv_in": P.conv_init(next(ks), 3, dims[0], (3, 3, 3),
                                        dtype=dtype)}
    stages = []
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        blocks = []
        c = cin
        for _ in range(cfg.num_res_blocks):
            blocks.append(_res_block_init(next(ks), c, cout, dtype))
            c = cout
        st = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            st["down"] = _downsample_init(next(ks), cout,
                                          cfg.temporal_downsample[i], dtype)
        stages.append(st)
    enc["stages"] = stages
    cmid = dims[-1]
    enc["mid"] = {
        "res1": _res_block_init(next(ks), cmid, cmid, dtype),
        "attn": _attn_block_init(next(ks), cmid, dtype),
        "res2": _res_block_init(next(ks), cmid, cmid, dtype),
    }
    enc["norm_out"] = {"gamma": jnp.ones((cmid,), dtype)}
    enc["conv_out"] = P.conv_init(next(ks), cmid, z2, (3, 3, 3), dtype=dtype)

    dec_dims = [d * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    dec: dict = {"conv_in": P.conv_init(next(ks), cfg.z_dim, dec_dims[0],
                                        (3, 3, 3), dtype=dtype)}
    dec["mid"] = {
        "res1": _res_block_init(next(ks), dec_dims[0], dec_dims[0], dtype),
        "attn": _attn_block_init(next(ks), dec_dims[0], dtype),
        "res2": _res_block_init(next(ks), dec_dims[0], dec_dims[0], dtype),
    }
    stages = []
    for i, (cin, cout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2  # preceding upsample halved channels (vae.py:401-404)
        blocks = []
        c = cin
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_res_block_init(next(ks), c, cout, dtype))
            c = cout
        st = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            st["up"] = _upsample_init(next(ks), cout,
                                      cfg.temporal_upsample[i], dtype)
        stages.append(st)
    dec["stages"] = stages
    dec["norm_out"] = {"gamma": jnp.ones((dec_dims[-1],), dtype)}
    dec["conv_out"] = P.conv_init(next(ks), dec_dims[-1], 3, (3, 3, 3),
                                  dtype=dtype)

    return {
        "encoder": enc,
        "conv1": P.conv_init(next(ks), z2, z2, (1, 1, 1), dtype=dtype),
        "conv2": P.conv_init(next(ks), cfg.z_dim, cfg.z_dim, (1, 1, 1),
                             dtype=dtype),
        "decoder": dec,
    }


def _encoder(p, cfg: WanVAEConfig, x):
    h = _causal_conv3d(p["conv_in"], x)
    for i, st in enumerate(p["stages"]):
        for blk in st["blocks"]:
            h = _res_block(blk, h)
        if "down" in st:
            h = _downsample(st["down"], h, cfg.temporal_downsample[i])
    h = _res_block(p["mid"]["res1"], h)
    h = _attn_block(p["mid"]["attn"], h)
    h = _res_block(p["mid"]["res2"], h)
    h = jax.nn.silu(_rms_norm_c(p["norm_out"], h))
    return _causal_conv3d(p["conv_out"], h)


def _decoder(p, cfg: WanVAEConfig, z):
    h = _causal_conv3d(p["conv_in"], z)
    h = _res_block(p["mid"]["res1"], h)
    h = _attn_block(p["mid"]["attn"], h)
    h = _res_block(p["mid"]["res2"], h)
    for i, st in enumerate(p["stages"]):
        for blk in st["blocks"]:
            h = _res_block(blk, h)
        if "up" in st:
            h = _upsample(st["up"], h, cfg.temporal_upsample[i])
    h = jax.nn.silu(_rms_norm_c(p["norm_out"], h))
    return _causal_conv3d(p["conv_out"], h)


def _to_channels_last(x):  # [B,C,T,H,W] -> [B,T,H,W,C]
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def _to_channels_first(x):
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def vae_encode(params, cfg: WanVAEConfig, video,
               mean=None, std=None) -> jnp.ndarray:
    """video [B,3,T,H,W] in [-1,1] -> normalized latents [B,z,T',H/8,W/8]
    (deterministic: the mu head, matching WanVAE_.encode vae.py:516-542).

    Compute dtype follows the PARAM dtype: fp32 params (the reference's
    dtype, infer_worldforge.py:179-197) run fp32 activations; bf16 params
    (the 16 GB guided-serving deviation, docs/SERVING.md) run bf16
    activations — without the entry cast, fp32 inputs promote every conv
    to fp32 and the activation savings of a bf16 VAE never materialize
    (measured: the guided fused program missed 16 GB by 170 MB on fp32
    temps). Drift gated in tests/test_guided_drift.py::test_bf16_vae_fuse_drift."""
    x = _to_channels_last(video).astype(params["conv1"]["w"].dtype)
    out = _encoder(params["encoder"], cfg, x)
    out = _causal_conv3d(params["conv1"], out)
    mu = out[..., :cfg.z_dim]
    if mean is None and cfg.z_dim == 16:
        mean, std = jnp.asarray(WAN_LATENTS_MEAN), jnp.asarray(WAN_LATENTS_STD)
    if mean is not None:
        mu = (mu - mean.astype(mu.dtype)) / std.astype(mu.dtype)
    return _to_channels_first(mu)


def vae_decode(params, cfg: WanVAEConfig, latents,
               mean=None, std=None) -> jnp.ndarray:
    """normalized latents [B,z,T',H',W'] -> video [B,3,T,H,W] in [-1,1].
    Compute dtype follows the param dtype (see vae_encode)."""
    z = _to_channels_last(latents)
    if mean is None and cfg.z_dim == 16:
        mean, std = jnp.asarray(WAN_LATENTS_MEAN), jnp.asarray(WAN_LATENTS_STD)
    if mean is not None:
        z = z * std.astype(z.dtype) + mean.astype(z.dtype)
    z = z.astype(params["conv2"]["w"].dtype)
    z = _causal_conv3d(params["conv2"], z)
    x = _decoder(params["decoder"], cfg, z)
    return jnp.clip(_to_channels_first(x), -1.0, 1.0)
