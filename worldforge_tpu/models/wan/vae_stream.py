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


def _cconv_cell(p, x, cache, spatial_chunks: int = 1):
    """Causal conv3d k=(3,kh,kw): conv over [cache(2) || x], cache out =
    last 2 frames of the padded input. Routed through vae._causal_conv3d
    (front_pad=0: the cache IS the causal padding) so the 2D-decomposition
    switch (vae._CONV3D_MODE) covers the streaming path too."""
    xin = jnp.concatenate([cache, x], axis=1)
    y = _conv3d_strips(p, xin, spatial_chunks)
    return y, xin[:, -CACHE_T:]


# ------------------------------------------------- H-strip spatial tiling
#
# The streaming scan bounds TEMPORAL activation memory to one chunk, but
# at 720p the per-chunk spatial conv transients still peak at 12.65 GiB
# of HLO temps (measured, scripts/probe_720p_guided_capacity.py) — the
# reason the guided-720p fuse cannot execute next to a resident DiT on
# 16 GB. Every decoder op is spatially local (RMS norm is per-position
# over channels, vae.py:39-54; convs have halo kh//2; the only global-
# spatial op — mid-block attention — runs at latent resolution and stays
# untiled), so the spatial work tiles EXACTLY over H strips.
#
# Memory discipline (measured on chip): a first lax.map + full-pad +
# stack implementation made temps WORSE (14.54 vs 12.65 GiB) — the pad
# and the [n, ...]->[..., H, ...] restack each materialize another
# full-size buffer. This implementation adds ZERO full-size temporaries:
# strips are gathered with clipped-index jnp.take + border mask (no
# padded copy; the zero mask at true borders reproduces SAME padding
# exactly), W/bottom padding happens inside the conv op, and outputs are
# written in place into one carried buffer via
# fori_loop + dynamic_update_slice. Equivalence is exact — gated in
# tests/test_vae_stream.py.


def _gather_h(x, lo, size):
    """Rows [lo, lo+size) of axis 2 with zeros outside [0, H) — the
    strip-halo gather that needs no padded full-array copy."""
    H = x.shape[2]
    idx = lo + jnp.arange(size)
    xg = jnp.take(x, jnp.clip(idx, 0, H - 1), axis=2)
    mask = ((idx >= 0) & (idx < H)).astype(x.dtype)
    return xg * mask[None, None, :, None, None]


def _conv3d_validH(p, x):
    """conv3d with VALID temporal (pad already in x via the cache),
    VALID H (the strip halo provides it), SAME W (padded inside the op)."""
    kw = p["w"].shape[2]
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1, 1),
        [(0, 0), (0, 0), (kw // 2, kw // 2)], dimension_numbers=dn)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _conv3d_strips(p, xin, n: int):
    """Spatial conv over [B,T',H,W,C] in n H-strips with halo kh//2.
    Falls back to the single-pass lowering when n<=1, H%n!=0, or the
    kernel is spatially pointwise."""
    from worldforge_tpu.models.wan.vae import _causal_conv3d
    kt, kh = p["w"].shape[0], p["w"].shape[1]
    H = xin.shape[2]
    if n <= 1 or kh == 1 or H % n:
        return _causal_conv3d(p, xin, front_pad=0)
    hs = H // n
    r = kh // 2
    b, tp = xin.shape[0], xin.shape[1]
    out = jnp.zeros((b, tp - (kt - 1), H, xin.shape[3], p["w"].shape[-1]),
                    xin.dtype)

    def body(i, out):
        lo = i * hs
        xg = _gather_h(xin, lo - r, hs + 2 * r)
        y = _conv3d_validH(p, xg)             # [B, T', hs, W, Cout]
        return jax.lax.dynamic_update_slice_in_dim(out, y, lo, axis=2)

    return jax.lax.fori_loop(0, n, body, out)


def _down_spatial_strips(p, x, n: int):
    """Encoder spatial downsample (ZeroPad2d(right=1, bottom=1) + 3x3
    stride-2 VALID, vae.py:87-94) in n H-strips. Output strip of hso rows
    consumes input rows [2*lo, 2*lo + 2*hso + 1) — no left halo (the
    stride-2 window for output row o starts exactly at input row 2o); the
    bottom and right zero pads come from the gather mask / the conv op."""
    b, t, h, w, c = x.shape
    hso = (h // 2) // n
    w2 = (w + 1) // 2
    out = jnp.zeros((b, t, n * hso, w2, c), x.dtype)

    def body(i, out):
        lo = i * hso
        xg = _gather_h(x, 2 * lo, 2 * hso + 1)        # bottom pad = mask
        flat = xg.reshape(b * t, 2 * hso + 1, w, c)
        dn = jax.lax.conv_dimension_numbers(
            flat.shape, p["conv"]["w"].shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            flat, p["conv"]["w"].astype(x.dtype), (2, 2),
            [(0, 0), (0, 1)], dimension_numbers=dn)
        y = y + p["conv"]["b"].astype(y.dtype)        # [b*t, hso, w2, c]
        y = y.reshape(b, t, hso, w2, c)
        return jax.lax.dynamic_update_slice_in_dim(out, y, lo, axis=2)

    return jax.lax.fori_loop(0, n, body, out)


def _up_spatial_strips(p, x2, n: int):
    """nearest-2x + 3x3 conv (C -> C/2) in n H-strips. Strip i consumes x
    rows [i*hs-1, (i+1)*hs+1) (halo 1, zero at borders via the gather
    mask) -> nearest-up rows [2i*hs-2, 2(i+1)*hs+2) -> slice the halo-1
    window -> VALID-H conv -> output rows [2i*hs, 2(i+1)*hs). Identical
    dot products to SAME conv over the full upsampled array."""
    b, t2, h, w, c = x2.shape
    hs = h // n
    kw = p["w"].shape[1]
    cout = p["w"].shape[-1]
    out = jnp.zeros((b, t2, 2 * h, 2 * w, cout), x2.dtype)

    def body(i, out):
        lo = i * hs
        xg = _gather_h(x2, lo - 1, hs + 2)
        flat = xg.reshape(b * t2, hs + 2, w, c)
        up = jnp.repeat(jnp.repeat(flat, 2, axis=1), 2, axis=2)
        up = up[:, 1:2 * hs + 3]               # the halo-1 output window
        dn_ = jax.lax.conv_dimension_numbers(
            up.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            up, p["w"].astype(up.dtype), (1, 1),
            [(0, 0), (kw // 2, kw // 2)], dimension_numbers=dn_)
        y = y + p["b"].astype(y.dtype)
        y = y.reshape(b, t2, 2 * hs, 2 * w, cout)
        return jax.lax.dynamic_update_slice_in_dim(out, y, 2 * lo, axis=2)

    return jax.lax.fori_loop(0, n, body, out)


def _conv1_cell(p, x, cache):
    """1x1x1 causal conv: temporally pointwise, no cache needed."""
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), (1, 1, 1),
                                     [(0, 0)] * 3, dimension_numbers=dn)
    return y + p["b"].astype(y.dtype), cache


def _res_cell(p, x, caches, spatial_chunks: int = 1):
    c1, c2 = caches
    h = _rms_norm_c(p["norm1"], x)
    h, c1 = _cconv_cell(p["conv1"], jax.nn.silu(h), c1, spatial_chunks)
    h = _rms_norm_c(p["norm2"], h)
    h, c2 = _cconv_cell(p["conv2"], jax.nn.silu(h), c2, spatial_chunks)
    if "shortcut" in p:
        s, _ = _conv1_cell(p["shortcut"], x, None)
    else:
        s = x
    return h + s, (c1, c2)


def _down_cell(p, x, cache, temporal, is_first, spatial_chunks: int = 1):
    """Encoder Resample: spatial stride-2 (per frame), then — when temporal
    and not the first chunk — time_conv over [cache(1) || x] stride 2.
    First chunk: identity in time, cache = last frame (vae.py:143-159)."""
    b, t, h, w, c = x.shape
    if (spatial_chunks > 1 and h % 2 == 0
            and (h // 2) % spatial_chunks == 0):
        y = _down_spatial_strips(p, x, spatial_chunks)
    else:
        flat = x.reshape(b * t, h, w, c)
        flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
        dn = jax.lax.conv_dimension_numbers(flat.shape, p["conv"]["w"].shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(flat, p["conv"]["w"].astype(x.dtype),
                                         (2, 2), "VALID",
                                         dimension_numbers=dn)
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


def _up_cell(p, x, cache, temporal, is_first, spatial_chunks: int = 1):
    """Decoder Resample: when temporal and not the first latent frame,
    time_conv over [cache(2) || x] -> 2C channels -> 2 frames; first frame
    passes through ('Rep', vae.py:103-137; zero cache == the 'Rep' zero
    padding). Then nearest-2x spatial + conv C -> C/2 (H-strip-tiled when
    spatial_chunks>1 — the time conv is spatially pointwise and stays
    full-size)."""
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
    if spatial_chunks > 1 and h % spatial_chunks == 0:
        return _up_spatial_strips(p["conv"], x2, spatial_chunks), new_cache
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


def _encoder_chunk(params, cfg: WanVAEConfig, x, caches, is_first: bool,
                   spatial_chunks: int = 1):
    c = dict(caches)
    h, c["conv_in"] = _cconv_cell(params["conv_in"], x, caches["conv_in"],
                                  spatial_chunks)
    stages = []
    for i, st in enumerate(params["stages"]):
        sc = dict(caches["stages"][i])
        blocks = []
        for j, blk in enumerate(st["blocks"]):
            h, bc = _res_cell(blk, h, caches["stages"][i]["blocks"][j],
                              spatial_chunks)
            blocks.append(bc)
        sc["blocks"] = blocks
        if "down" in st:
            h, dc = _down_cell(st["down"], h, caches["stages"][i]["down"],
                               cfg.temporal_downsample[i], is_first,
                               spatial_chunks)
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


def _decoder_chunk(params, cfg: WanVAEConfig, z, caches, is_first: bool,
                   spatial_chunks: int = 1):
    c = dict(caches)
    # conv_in + mid run at latent resolution — cheap, untiled (the mid
    # attention is globally spatial and must see the full frame anyway)
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
            h, bc = _res_cell(blk, h, caches["stages"][i]["blocks"][j],
                              spatial_chunks)
            blocks.append(bc)
        sc["blocks"] = blocks
        if "up" in st:
            h, uc = _up_cell(st["up"], h, caches["stages"][i]["up"],
                             cfg.temporal_upsample[i], is_first,
                             spatial_chunks)
            sc["up"] = uc
        stages.append(sc)
    c["stages"] = stages
    h = jax.nn.silu(_rms_norm_c(params["norm_out"], h))
    h, c["conv_out"] = _cconv_cell(params["conv_out"], h, caches["conv_out"],
                                   spatial_chunks)
    return h, c


# ---------------------------------------------------------------- API


def vae_encode_streaming(params, cfg: WanVAEConfig, video,
                         mean=None, std=None,
                         spatial_chunks: int = 1) -> jnp.ndarray:
    """Streaming equivalent of vae_encode: video [B,3,T,H,W] (T = 1+4k) ->
    normalized latents. Chunks: [1, 4, 4, ...] input frames
    (vae.py:516-534). spatial_chunks: H-strip tiling of the spatial convs
    (exact; see the decode twin) — the encoder's untiled 720p transients
    are 8.43 GiB, also over budget next to a resident DiT."""
    b, _, t, h, w = video.shape
    # compute dtype follows the param dtype (see vae.py::vae_encode)
    x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(
        params["conv1"]["w"].dtype)
    caches = init_encoder_caches(params["encoder"], cfg, b, h, w, x.dtype)

    out0, caches = _encoder_chunk(params["encoder"], cfg, x[:, :1], caches,
                                  is_first=True,
                                  spatial_chunks=spatial_chunks)
    n_chunks = (t - 1) // 4
    if n_chunks:
        chunks = x[:, 1:].reshape(b, n_chunks, 4, h, w, 3)
        chunks = jnp.moveaxis(chunks, 1, 0)  # [n, B, 4, H, W, 3]

        def step(caches, chunk):
            y, caches = _encoder_chunk(params["encoder"], cfg, chunk,
                                       caches, is_first=False,
                                       spatial_chunks=spatial_chunks)
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
                         mean=None, std=None, chunk: int = 1,
                         spatial_chunks: int = 1) -> jnp.ndarray:
    """Streaming equivalent of vae_decode: ``chunk`` latent frames per scan
    step (the reference decodes 1 at a time, vae.py:544-568; any chunk size
    is mathematically identical — the conv caches carry the same state).
    Larger chunks trade activation memory for per-step overhead; measured on
    a 16 GB v5e chunk=2 was NET SLOWER (4.0 s vs 3.3 s full decode — memory
    pressure beats the conv-tiling gain), so the knob is for big-HBM hosts.
    chunk must divide t-1; falls back to 1 otherwise.

    spatial_chunks>1 additionally tiles each stage's spatial convs over
    that many H strips (exact math — see the H-strip section above): the
    per-chunk conv transients shrink ~spatial_chunks-fold, the capacity
    knob for 720p decode next to a resident DiT. Stages whose H is not
    divisible fall back to single-pass individually; pick a divisor of
    the LATENT height (e.g. 6 for 480p h=60, 6/9/10 for 720p h=90) so
    every stage tiles."""
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
                                  is_first=True,
                                  spatial_chunks=spatial_chunks)
    if t > 1:
        n = (t - 1) // chunk
        frames = z[:, 1:].reshape(b, n, chunk, h, w, z.shape[-1])
        frames = jnp.moveaxis(frames, 1, 0)  # [n, B, chunk, h, w, C]

        def step(caches, zf):
            y, caches = _decoder_chunk(params["decoder"], cfg, zf, caches,
                                       is_first=False,
                                       spatial_chunks=spatial_chunks)
            return caches, y

        caches, outs = jax.lax.scan(step, caches, frames)
        outs = jnp.moveaxis(outs, 0, 1).reshape(b, -1, *outs.shape[3:])
        dec = jnp.concatenate([out0, outs], axis=1)
    else:
        dec = out0
    dec = jnp.clip(jnp.transpose(dec, (0, 4, 1, 2, 3)), -1.0, 1.0)
    return dec
