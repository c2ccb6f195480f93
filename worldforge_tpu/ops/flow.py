"""Batched pyramidal Lucas-Kanade optical flow (jit, on-device).

Replaces the reference's per-channel CPU Farneback flow
(/root/reference/wan_for_worldforge/utils/scheduling_unipc_multistep_clean.py
:156-248), which pulls every latent channel to host per guided step (16
channels x 2 tensors x T frame pairs). Here all (B*C*(T-1)) frame pairs are
solved as one batched TPU computation.

The algorithm (coarse-to-fine iterative LK with Gaussian window sums) is a
standard published method; numerics differ from Farneback, so FLF channel
*selection sets* are validated with tolerance, not bit equality (SURVEY.md
§7 hard part 4).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _sep_blur(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable blur over the last two axes of [N, H, W]."""
    kx = jnp.asarray(k)[None, None, :, None]  # HWIO for 1D conv on W
    n, h, w = x.shape
    xi = x[:, :, :, None]  # NHWC
    dn = jax.lax.conv_dimension_numbers(xi.shape, (len(k), 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    pad = len(k) // 2
    y = jax.lax.conv_general_dilated(xi, jnp.asarray(k)[:, None, None, None],
                                     (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=dn)
    y = jax.lax.conv_general_dilated(y, jnp.asarray(k)[None, :, None, None],
                                     (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=dn)
    return y[..., 0]


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Blur + 2x decimation on [N, H, W]."""
    k = _gauss_kernel1d(1.0, 2)
    y = _sep_blur(x, k)
    return y[:, ::2, ::2]


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w), method="bilinear")


def _grad(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference spatial gradients of [N, H, W]."""
    gx = (jnp.roll(x, -1, axis=2) - jnp.roll(x, 1, axis=2)) * 0.5
    gy = (jnp.roll(x, -1, axis=1) - jnp.roll(x, 1, axis=1)) * 0.5
    return gx, gy


def _warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp img [N,H,W] by flow (u, v): sample at (x+u, y+v)."""
    n, h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = jnp.clip(xx[None] + u, 0.0, w - 1.0)
    sy = jnp.clip(yy[None] + v, 0.0, h - 1.0)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    x1 = jnp.minimum(x0 + 1, w - 1.0); y1 = jnp.minimum(y0 + 1, h - 1.0)
    wx = sx - x0; wy = sy - y0

    def gather(yi, xi):
        idx = (yi.astype(jnp.int32) * w + xi.astype(jnp.int32))
        flat = img.reshape(n, h * w)
        # vmap row gather: take_along_axis with same-jit computed indices
        # hits a 10-100x slower XLA gather lowering on TPU (same fix as
        # farneback.py::_update_matrices)
        return jax.vmap(lambda f, ix: f[ix])(
            flat, idx.reshape(n, h * w)).reshape(n, h, w)

    i00 = gather(y0, x0); i01 = gather(y0, x1)
    i10 = gather(y1, x0); i11 = gather(y1, x1)
    return (i00 * (1 - wx) * (1 - wy) + i01 * wx * (1 - wy)
            + i10 * (1 - wx) * wy + i11 * wx * wy)


def _lk_level(i1, i2, u, v, win_kernel, iters: int):
    gx, gy = _grad(i1)
    blur = functools.partial(_sep_blur, k=win_kernel)
    sxx = blur(gx * gx); syy = blur(gy * gy); sxy = blur(gx * gy)
    det = sxx * syy - sxy * sxy
    inv = 1.0 / (det + 1e-6)
    for _ in range(iters):
        w2 = _warp(i2, u, v)
        it = w2 - i1
        sxt = blur(gx * it); syt = blur(gy * it)
        du = -(syy * sxt - sxy * syt) * inv
        dv = -(sxx * syt - sxy * sxt) * inv
        u = u + jnp.clip(du, -2.0, 2.0)
        v = v + jnp.clip(dv, -2.0, 2.0)
    return u, v


@functools.partial(jax.jit, static_argnames=("levels", "iters", "win_radius"))
def optical_flow(i1: jnp.ndarray, i2: jnp.ndarray, *, levels: int = 3,
                 iters: int = 3, win_radius: int = 3) -> jnp.ndarray:
    """Flow from i1 to i2. i1, i2: [N, H, W] fp32 grayscale (any scale).
    Returns [N, 2, H, W] with channel 0 = u (x-flow), 1 = v (y-flow),
    matching cv2.calcOpticalFlowFarneback's (dx, dy) channel order."""
    i1 = i1.astype(jnp.float32)
    i2 = i2.astype(jnp.float32)
    win = _gauss_kernel1d(2.0, win_radius)

    pyr = [(i1, i2)]
    for _ in range(levels - 1):
        if min(pyr[-1][0].shape[1:]) < 8:
            break
        pyr.append((_downsample2(pyr[-1][0]), _downsample2(pyr[-1][1])))

    u = jnp.zeros_like(pyr[-1][0])
    v = jnp.zeros_like(pyr[-1][0])
    for li in range(len(pyr) - 1, -1, -1):
        a, b = pyr[li]
        if u.shape != a.shape:
            sy = a.shape[1] / u.shape[1]
            sx = a.shape[2] / u.shape[2]
            u = _resize_bilinear(u, a.shape[1], a.shape[2]) * sx
            v = _resize_bilinear(v, a.shape[1], a.shape[2]) * sy
        u, v = _lk_level(a, b, u, v, win, iters)
    return jnp.stack([u, v], axis=1)


def video_channel_flows(video: jnp.ndarray, *, method: str = "farneback",
                        levels: int = 3, iters: int = 3) -> jnp.ndarray:
    """Per-channel frame-pair flows for a latent video [B, C, T, H, W]
    (normalized to [0,1] per tensor like the reference's per-tensor global
    min/max scaling, scheduling_unipc:384-389). Returns [B, C, T-1, 2, H, W].

    method="farneback" (default) runs ops/farneback.py — the reference's
    exact algorithm (cv2 parity <1e-3), including its uint8 frame
    quantization (scheduling_unipc:175-176). method="lk" keeps the faster
    pyramidal Lucas-Kanade approximation.
    """
    return video_channel_flows_pair(video, method=method, levels=levels,
                                    iters=iters)[0]


def _norm_frame_pairs(video: jnp.ndarray, quantize: bool):
    """Per-tensor global min/max normalization + frame pairing.
    Returns (i1, i2) of shape [B*C*(T-1), H, W]."""
    b, c, t, h, w = video.shape
    vf = video.astype(jnp.float32)
    vmin = jnp.min(vf)
    vrange = jnp.max(vf) - vmin + 1e-8
    vf = (vf - vmin) / vrange * 255.0
    if quantize:
        vf = jnp.floor(vf)  # (v*255).astype(uint8) truncation
    frames = vf.reshape(b * c, t, h, w)
    i1 = frames[:, :-1].reshape(b * c * (t - 1), h, w)
    i2 = frames[:, 1:].reshape(b * c * (t - 1), h, w)
    return i1, i2


def video_channel_flows_pair(*videos: jnp.ndarray, method: str = "farneback",
                             levels: int = 3, iters: int = 3):
    """Per-channel frame-pair flows for one or more same-shape videos,
    batched through a single device call (each video normalized by its own
    global min/range, as the reference does for pred vs ref). Returns a
    tuple of [B, C, T-1, 2, H, W] arrays, one per input."""
    b, c, t, h, w = videos[0].shape
    quant = method == "farneback"
    pairs = [_norm_frame_pairs(v, quant) for v in videos]
    i1 = jnp.concatenate([p[0] for p in pairs])
    i2 = jnp.concatenate([p[1] for p in pairs])
    if method == "farneback":
        from worldforge_tpu.ops.farneback import farneback_flow
        fl = farneback_flow(i1, i2, levels=levels,
                            iterations=iters).transpose(0, 3, 1, 2)
    else:
        fl = optical_flow(i1, i2, levels=levels, iters=iters)
    n = b * c * (t - 1)
    return tuple(fl[i * n:(i + 1) * n].reshape(b, c, t - 1, 2, h, w)
                 for i in range(len(videos)))
