"""Streaming Wan-VAE encode/decode: lax.scan over temporal chunks with
carried causal-conv caches (SURVEY.md §7 hard part 1).

The reference streams with a feat-cache (vae.py:516-568: encode in chunks of
[1, 4, 4, ...] input frames, decode 1 latent frame at a time, each causal
conv caching its last 2 input frames). The single-pass implementation in
vae.py is mathematically equivalent but materializes full-length activations
(~7.5 GB fp32 at 49x480p top stage); this version holds one chunk per step:
iteration 0 runs as its own program (1 frame everywhere), iterations 1..T-1
run under lax.scan with the conv caches as carry.

Equivalence to the single pass (itself parity-tested against the reference
torch streaming code) is asserted in tests/test_vae_stream.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from worldforge_tpu.core import params as P
from worldforge_tpu.models.wan.vae import (WanVAEConfig, WAN_LATENTS_MEAN,
                                           WAN_LATENTS_STD, _attn_block,
                                           _rms_norm_c, _conv2d)

CACHE_T = 2


# ---------------------------------------------------------------- cells
#
# Every temporal-causal op becomes a "cell": (params, x, cache) ->
# (y, new_cache). Caches are zero-initialized (== the reference's front
# zero padding / 'Rep' sentinel semantics).


def _cconv_cell(p, x, cache):
    """Causal conv3d k=(3,kh,kw): conv over [cache(2) || x], cache out =
    last 2 frames of the padded input. Routed through vae._causal_conv3d
    (front_pad=0: the cache IS the causal padding) so the 2D-decomposition
    switch (vae._CONV3D_MODE) covers the streaming path too."""
    from worldforge_tpu.models.wan.vae import _causal_conv3d
    xin = jnp.concatenate([cache, x], axis=1)
    y = _causal_conv3d(p, xin, front_pad=0)
    return y, xin[:, -CACHE_T:]


def _conv1_cell(p, x, cache):
    """1x1x1 causal conv: temporally pointwise, no cache needed."""
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), (1, 1, 1),
                                     [(0, 0)] * 3, dimension_numbers=dn)
    return y + p["b"].astype(y.dtype), cache


def _res_cell(p, x, caches):
    c1, c2 = caches
    h = _rms_norm_c(p["norm1"], x)
    h, c1 = _cconv_cell(p["conv1"], jax.nn.silu(h), c1)
    h = _rms_norm_c(p["norm2"], h)
    h, c2 = _cconv_cell(p["conv2"], jax.nn.silu(h), c2)
    if "shortcut" in p:
        s, _ = _conv1_cell(p["shortcut"], x, None)
    else:
        s = x
    return h + s, (c1, c2)


def _down_cell(p, x, cache, temporal, is_first):
    """Encoder Resample: spatial stride-2 (per frame), then — when temporal
    and not the first chunk — time_conv over [cache(1) || x] stride 2.
    First chunk: identity in time, cache = last frame (vae.py:143-159)."""
    b, t, h, w, c = x.shape
    flat = x.reshape(b * t, h, w, c)
    flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(flat.shape, p["conv"]["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(flat, p["conv"]["w"].astype(x.dtype),
                                     (2, 2), "VALID", dimension_numbers=dn)
    y = (y + p["conv"]["b"].astype(y.dtype)).reshape(
        b, t, (h + 1) // 2, (w + 1) // 2, c)
    if not temporal:
        return y, cache
    if is_first:
        return y, y[:, -1:]
    xin = jnp.concatenate([cache, y], axis=1)  # [B, t+1, ...]
    dn3 = jax.lax.conv_dimension_numbers(xin.shape, p["time_conv"]["w"].shape,
                                         ("NDHWC", "DHWIO", "NDHWC"))
    z = jax.lax.conv_general_dilated(xin, p["time_conv"]["w"].astype(x.dtype),
                                     (2, 1, 1), [(0, 0)] * 3,
                                     dimension_numbers=dn3)
    z = z + p["time_conv"]["b"].astype(z.dtype)
    return z, y[:, -1:]


def _up_cell(p, x, cache, temporal, is_first):
    """Decoder Resample: when temporal and not the first latent frame,
    time_conv over [cache(2) || x] -> 2C channels -> 2 frames; first frame
    passes through ('Rep', vae.py:103-137; zero cache == the 'Rep' zero
    padding). Then nearest-2x spatial + conv C -> C/2."""
    b, t, h, w, c = x.shape
    if temporal and not is_first:
        xin = jnp.concatenate([cache, x], axis=1)
        dn3 = jax.lax.conv_dimension_numbers(
            xin.shape, p["time_conv"]["w"].shape, ("NDHWC", "DHWIO", "NDHWC"))
        z = jax.lax.conv_general_dilated(
            xin, p["time_conv"]["w"].astype(x.dtype), (1, 1, 1),
            [(0, 0)] * 3, dimension_numbers=dn3)
        z = z + p["time_conv"]["b"].astype(z.dtype)  # [B, t, ..., 2C]
        a, bb = jnp.split(z, 2, axis=-1)
        x2 = jnp.stack([a, bb], axis=2).reshape(b, 2 * t, h, w, c)
        new_cache = xin[:, -CACHE_T:]
    else:
        x2 = x
        # 'Rep' sentinel == all-zero cache: frame 0 never enters the time
        # conv windows (vae.py:120-126; see vae.py _upsample derivation)
        new_cache = jnp.zeros_like(cache) if temporal else cache
    t2 = x2.shape[1]
    flat = x2.reshape(b * t2, h, w, c)
    up = jnp.repeat(jnp.repeat(flat, 2, axis=1), 2, axis=2)
    y = _conv2d(p["conv"], up)
    return y.reshape(b, t2, 2 * h, 2 * w, y.shape[-1]), new_cache


# ---------------------------------------------------------------- caches


def _zeros_cache(b, h, w, c, n=CACHE_T, dtype=jnp.float32):
    return jnp.zeros((b, n, h, w, c), dtype)


def init_encoder_caches(params, cfg: WanVAEConfig, b, h, w,
                        dtype=jnp.float32) -> Dict:
    d = cfg.dim
    dims = [d * u for u in (1,) + tuple(cfg.dim_mult)]
    caches = {"conv_in": _zeros_cache(b, h, w, 3, dtype=dtype)}
    ch, cw = h, w
    stages = []
    for i, st in enumerate(params["stages"]):
        cin = dims[i]
        cout = dims[i + 1]
        blocks = []
        c = cin
        for blk in st["blocks"]:
            # conv1 cache holds the block INPUT (c channels), conv2 the
            # intermediate (cout)
            blocks.append((_zeros_cache(b, ch, cw, c, dtype=dtype),
                           _zeros_cache(b, ch, cw, cout, dtype=dtype)))
            c = cout
        sd = {"blocks": blocks}
        if "down" in st:
            ch, cw = (ch + 1) // 2, (cw + 1) // 2
            sd["down"] = _zeros_cache(b, ch, cw, cout, n=1, dtype=dtype)
        stages.append(sd)
    cm = dims[-1]
    caches["stages"] = stages
    caches["mid"] = {
        "res1": (_zeros_cache(b, ch, cw, cm, dtype=dtype),
                 _zeros_cache(b, ch, cw, cm, dtype=dtype)),
        "res2": (_zeros_cache(b, ch, cw, cm, dtype=dtype),
                 _zeros_cache(b, ch, cw, cm, dtype=dtype)),
    }
    caches["conv_out"] = _zeros_cache(b, ch, cw, cm, dtype=dtype)
    return caches


def init_decoder_caches(params, cfg: WanVAEConfig, b, h, w,
                        dtype=jnp.float32) -> Dict:
    """h, w: latent spatial size."""
    d = cfg.dim
    dec_dims = [d * u for u in (cfg.dim_mult[-1],) + tuple(
        reversed(cfg.dim_mult))]
    caches = {"conv_in": _zeros_cache(b, h, w, cfg.z_dim, dtype=dtype)}
    cm = dec_dims[0]
    caches["mid"] = {
        "res1": (_zeros_cache(b, h, w, cm, dtype=dtype),
                 _zeros_cache(b, h, w, cm, dtype=dtype)),
        "res2": (_zeros_cache(b, h, w, cm, dtype=dtype),
                 _zeros_cache(b, h, w, cm, dtype=dtype)),
    }
    ch, cw = h, w
    stages = []
    for i, st in enumerate(params["stages"]):
        cout = dec_dims[i + 1]
        cin = dec_dims[i] // 2 if i in (1, 2, 3) else dec_dims[i]
        blocks = []
        c = cin
        for _ in st["blocks"]:
            blocks.append((_zeros_cache(b, ch, cw, c, dtype=dtype),
                           _zeros_cache(b, ch, cw, cout, dtype=dtype)))
            c = cout
        sd = {"blocks": blocks}
        if "up" in st:
            sd["up"] = _zeros_cache(b, ch, cw, cout, dtype=dtype)
            ch, cw = ch * 2, cw * 2
        stages.append(sd)
    caches["stages"] = stages
    caches["conv_out"] = _zeros_cache(b, ch, cw, dec_dims[-1], dtype=dtype)
    return caches


# ---------------------------------------------------------------- passes


def _encoder_chunk(params, cfg: WanVAEConfig, x, caches, is_first: bool):
    c = dict(caches)
    h, c["conv_in"] = _cconv_cell(params["conv_in"], x, caches["conv_in"])
    stages = []
    for i, st in enumerate(params["stages"]):
        sc = dict(caches["stages"][i])
        blocks = []
        for j, blk in enumerate(st["blocks"]):
            h, bc = _res_cell(blk, h, caches["stages"][i]["blocks"][j])
            blocks.append(bc)
        sc["blocks"] = blocks
        if "down" in st:
            h, dc = _down_cell(st["down"], h, caches["stages"][i]["down"],
                               cfg.temporal_downsample[i], is_first)
            sc["down"] = dc
        stages.append(sc)
    c["stages"] = stages
    mid = {}
    h, mid["res1"] = _res_cell(params["mid"]["res1"], h,
                               caches["mid"]["res1"])
    h = _attn_block(params["mid"]["attn"], h)
    h, mid["res2"] = _res_cell(params["mid"]["res2"], h,
                               caches["mid"]["res2"])
    c["mid"] = mid
    h = jax.nn.silu(_rms_norm_c(params["norm_out"], h))
    h, c["conv_out"] = _cconv_cell(params["conv_out"], h, caches["conv_out"])
    return h, c


def _decoder_chunk(params, cfg: WanVAEConfig, z, caches, is_first: bool):
    c = dict(caches)
    h, c["conv_in"] = _cconv_cell(params["conv_in"], z, caches["conv_in"])
    mid = {}
    h, mid["res1"] = _res_cell(params["mid"]["res1"], h,
                               caches["mid"]["res1"])
    h = _attn_block(params["mid"]["attn"], h)
    h, mid["res2"] = _res_cell(params["mid"]["res2"], h,
                               caches["mid"]["res2"])
    c["mid"] = mid
    stages = []
    for i, st in enumerate(params["stages"]):
        sc = dict(caches["stages"][i])
        blocks = []
        for j, blk in enumerate(st["blocks"]):
            h, bc = _res_cell(blk, h, caches["stages"][i]["blocks"][j])
            blocks.append(bc)
        sc["blocks"] = blocks
        if "up" in st:
            h, uc = _up_cell(st["up"], h, caches["stages"][i]["up"],
                             cfg.temporal_upsample[i], is_first)
            sc["up"] = uc
        stages.append(sc)
    c["stages"] = stages
    h = jax.nn.silu(_rms_norm_c(params["norm_out"], h))
    h, c["conv_out"] = _cconv_cell(params["conv_out"], h, caches["conv_out"])
    return h, c


# ---------------------------------------------------------------- API


def vae_encode_streaming(params, cfg: WanVAEConfig, video,
                         mean=None, std=None) -> jnp.ndarray:
    """Streaming equivalent of vae_encode: video [B,3,T,H,W] (T = 1+4k) ->
    normalized latents. Chunks: [1, 4, 4, ...] input frames
    (vae.py:516-534)."""
    b, _, t, h, w = video.shape
    # compute dtype follows the param dtype (see vae.py::vae_encode)
    x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(
        params["conv1"]["w"].dtype)
    caches = init_encoder_caches(params["encoder"], cfg, b, h, w, x.dtype)

    out0, caches = _encoder_chunk(params["encoder"], cfg, x[:, :1], caches,
                                  is_first=True)
    n_chunks = (t - 1) // 4
    if n_chunks:
        chunks = x[:, 1:].reshape(b, n_chunks, 4, h, w, 3)
        chunks = jnp.moveaxis(chunks, 1, 0)  # [n, B, 4, H, W, 3]

        def step(caches, chunk):
            y, caches = _encoder_chunk(params["encoder"], cfg, chunk,
                                       caches, is_first=False)
            return caches, y

        caches, outs = jax.lax.scan(step, caches, chunks)
        outs = jnp.moveaxis(outs, 0, 1).reshape(b, -1, *outs.shape[3:])
        enc = jnp.concatenate([out0, outs], axis=1)
    else:
        enc = out0

    from worldforge_tpu.models.wan.vae import _causal_conv3d
    out = _causal_conv3d(params["conv1"], enc)
    mu = out[..., :cfg.z_dim]
    if mean is None and cfg.z_dim == 16:
        mean, std = jnp.asarray(WAN_LATENTS_MEAN), jnp.asarray(WAN_LATENTS_STD)
    if mean is not None:
        mu = (mu - mean.astype(mu.dtype)) / std.astype(mu.dtype)
    return jnp.transpose(mu, (0, 4, 1, 2, 3))


def vae_decode_streaming(params, cfg: WanVAEConfig, latents,
                         mean=None, std=None, chunk: int = 1) -> jnp.ndarray:
    """Streaming equivalent of vae_decode: ``chunk`` latent frames per scan
    step (the reference decodes 1 at a time, vae.py:544-568; any chunk size
    is mathematically identical — the conv caches carry the same state).
    Larger chunks trade activation memory for per-step overhead; measured on
    a 16 GB v5e chunk=2 was NET SLOWER (4.0 s vs 3.3 s full decode — memory
    pressure beats the conv-tiling gain), so the knob is for big-HBM hosts.
    chunk must divide t-1; falls back to 1 otherwise."""
    b, _, t, h, w = latents.shape
    if chunk < 1 or (t - 1) % chunk:
        chunk = 1
    z = jnp.transpose(latents, (0, 2, 3, 4, 1))
    if mean is None and cfg.z_dim == 16:
        mean, std = jnp.asarray(WAN_LATENTS_MEAN), jnp.asarray(WAN_LATENTS_STD)
    if mean is not None:
        z = z * std.astype(z.dtype) + mean.astype(z.dtype)
    # compute dtype follows the param dtype (see vae.py::vae_encode)
    z = z.astype(params["conv2"]["w"].dtype)
    from worldforge_tpu.models.wan.vae import _causal_conv3d
    z = _causal_conv3d(params["conv2"], z)

    caches = init_decoder_caches(params["decoder"], cfg, b, h, w, z.dtype)
    out0, caches = _decoder_chunk(params["decoder"], cfg, z[:, :1], caches,
                                  is_first=True)
    if t > 1:
        n = (t - 1) // chunk
        frames = z[:, 1:].reshape(b, n, chunk, h, w, z.shape[-1])
        frames = jnp.moveaxis(frames, 1, 0)  # [n, B, chunk, h, w, C]

        def step(caches, zf):
            y, caches = _decoder_chunk(params["decoder"], cfg, zf, caches,
                                       is_first=False)
            return caches, y

        caches, outs = jax.lax.scan(step, caches, frames)
        outs = jnp.moveaxis(outs, 0, 1).reshape(b, -1, *outs.shape[3:])
        dec = jnp.concatenate([out0, outs], axis=1)
    else:
        dec = out0
    dec = jnp.clip(jnp.transpose(dec, (0, 4, 1, 2, 3)), -1.0, 1.0)
    return dec
