"""Farneback dense optical flow, cv2-exact, batched on device (jit).

The reference's FLF channel selector runs cv2.calcOpticalFlowFarneback on
every latent channel on the host CPU
(/root/reference/wan_for_worldforge/utils/scheduling_unipc_multistep_clean.py
:218-222: pyr_scale=0.5, levels=3, winsize=15, iterations=3, poly_n=5,
poly_sigma=1.2, flags=0;
/root/reference/longcat_for_worldforge/longcat_video/modules/
scheduling_flow_match_euler_discrete.py:133-137 uses the same call).
That is 16 channels x 2 tensors x (T-1) frame pairs of host work per guided
step. Here the same algorithm runs as ONE batched jitted TPU computation
over all frame pairs, with numerics matched to OpenCV (parity ~1e-3 px,
see tests/test_farneback.py):

- polynomial expansion: separable Gaussian-weighted least squares with
  replicate borders, the (1, x, y, x^2, y^2, xy) basis and the sparse
  inverse-Gram coefficients (ig11/ig03/ig33/ig55);
- displacement update: bilinear warp of the second expansion, A averaging
  (0.5 / cross-term 0.25), out-of-border fallback, the 5-px border
  down-weighting ramp (0.14, 0.14, 0.4472, ...);
- flow solve: 15x15 replicate-padded box blur of the 2x2 normal equations,
  determinant regularizer +1e-3;
- pyramid: levels capped so every level stays >= 32 px (latent-sized inputs
  therefore run single-level), per-level Gaussian presmooth of the full-res
  image with sigma = (1/scale - 1)/2 (OpenCV small-kernel table at sigma=0)
  followed by INTER_LINEAR resize (half-pixel centers, no anti-aliasing),
  flow upsampled and scaled by 1/pyr_scale between levels.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --- kernels (host, float64 -> float32, matching OpenCV's tables) ---------

_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125,
                 0.21875, 0.109375, 0.03125], np.float32),
}


def _gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """OpenCV getGaussianKernel semantics (incl. the small-kernel table)."""
    if sigma <= 0 and ksize <= 7:
        return _SMALL_GAUSSIAN_TAB[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x ** 2) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _poly_exp_kernels(n: int, sigma: float):
    """Applicability kernels g/xg/xxg and the inverse-Gram coefficients."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-x * x / (2 * sigma * sigma))
    # OpenCV normalizes in float32 then promotes; replicate that rounding.
    g = (g / g.sum()).astype(np.float32).astype(np.float64)
    xg = x * g
    xxg = x * x * g
    G = np.zeros((6, 6))
    G[0, 0] = (g[:, None] * g[None, :]).sum()
    G[1, 1] = (g[:, None] * (g * x * x)[None, :]).sum()
    G[3, 3] = (g[:, None] * (g * x ** 4)[None, :]).sum()
    G[5, 5] = ((g * x * x)[:, None] * (g * x * x)[None, :]).sum()
    G[2, 2] = G[1, 1]
    G[0, 3] = G[0, 4] = G[3, 0] = G[4, 0] = G[1, 1]
    G[4, 4] = G[3, 3]
    G[3, 4] = G[4, 3] = G[5, 5]
    invG = np.linalg.inv(G)
    coeffs = (invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5])
    return (g.astype(np.float32), xg.astype(np.float32),
            xxg.astype(np.float32), coeffs)


# --- device helpers --------------------------------------------------------


def _corr1d(x: jnp.ndarray, k: np.ndarray, axis: int) -> jnp.ndarray:
    """1-D correlation along `axis` (1=H, 2=W) of [N,H,W], replicate border."""
    n = (len(k) - 1) // 2
    pad = [(0, 0), (0, 0), (0, 0)]
    pad[axis] = (n, n)
    xp = jnp.pad(x, pad, mode="edge")[:, :, :, None]  # NHWC, C=1
    if axis == 1:
        kern = jnp.asarray(k)[:, None, None, None]
    else:
        kern = jnp.asarray(k)[None, :, None, None]
    dn = jax.lax.conv_dimension_numbers(xp.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xp, kern, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    return y[..., 0]


def _poly_exp(img: jnp.ndarray, g, xg, xxg, coeffs) -> jnp.ndarray:
    """Polynomial expansion of [N,H,W] -> [N,H,W,5] channels
    (b_y, b_x, a_yy, a_xx, a_xy) in OpenCV's storage order."""
    ig11, ig03, ig33, ig55 = coeffs
    b0 = _corr1d(img, g, axis=1)          # even in y
    b1 = _corr1d(img, xg, axis=1)         # odd in y (xg is odd)
    b2 = _corr1d(img, xxg, axis=1)        # even in y
    B1 = _corr1d(b0, g, axis=2)
    B2 = _corr1d(b0, xg, axis=2)
    B4 = _corr1d(b0, xxg, axis=2)
    B3 = _corr1d(b1, g, axis=2)
    B6 = _corr1d(b1, xg, axis=2)
    B5 = _corr1d(b2, g, axis=2)
    r = jnp.stack([
        B3 * ig11,                         # b_y
        B2 * ig11,                         # b_x
        B1 * ig03 + B5 * ig33,             # a_yy
        B1 * ig03 + B4 * ig33,             # a_xx
        B6 * ig55,                         # a_xy
    ], axis=-1)
    return r.astype(jnp.float32)


def _border_scale(h: int, w: int) -> np.ndarray:
    """5-px edge down-weighting ramp applied to the normal equations."""
    bw = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)
    sy = np.ones(h, np.float32)
    sx = np.ones(w, np.float32)
    for i in range(min(5, (h + 1) // 2)):
        sy[i] *= bw[i]
        sy[h - 1 - i] *= bw[i]
    for i in range(min(5, (w + 1) // 2)):
        sx[i] *= bw[i]
        sx[w - 1 - i] *= bw[i]
    return sy[:, None] * sx[None, :]


def _update_matrices(R0: jnp.ndarray, R1: jnp.ndarray, flow: jnp.ndarray,
                     border: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel 2x2 normal equations M = (G11,G12,G22,h1,h2) [N,H,W,5]."""
    n, h, w = flow.shape[:3]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx = flow[..., 0]
    dy = flow[..., 1]
    fx = xx[None] + dx
    fy = yy[None] + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    fxf = fx - x1
    fyf = fy - y1
    inb = (x1 >= 0) & (x1 < w - 1) & (y1 >= 0) & (y1 < h - 1)
    x1c = jnp.clip(x1, 0, w - 2).astype(jnp.int32)
    y1c = jnp.clip(y1, 0, h - 2).astype(jnp.int32)

    flat = R1.reshape(n, h * w, 5)

    def gather(yi, xi):
        # vmap'd row gather: ~10x faster than take_along_axis with a
        # broadcast channel index on TPU (fused index computation pushes
        # XLA's gather onto a slow path)
        idx = (yi * w + xi).reshape(n, h * w)
        return jax.vmap(lambda f, ix: f[ix])(flat, idx).reshape(n, h, w, 5)

    a00 = ((1 - fxf) * (1 - fyf))[..., None]
    a01 = (fxf * (1 - fyf))[..., None]
    a10 = ((1 - fxf) * fyf)[..., None]
    a11 = (fxf * fyf)[..., None]
    samp = (a00 * gather(y1c, x1c) + a01 * gather(y1c, x1c + 1)
            + a10 * gather(y1c + 1, x1c) + a11 * gather(y1c + 1, x1c + 1))

    r2 = jnp.where(inb, samp[..., 0], 0.0)
    r3 = jnp.where(inb, samp[..., 1], 0.0)
    r4 = jnp.where(inb, (R0[..., 2] + samp[..., 2]) * 0.5, R0[..., 2])
    r5 = jnp.where(inb, (R0[..., 3] + samp[..., 3]) * 0.5, R0[..., 3])
    r6 = jnp.where(inb, (R0[..., 4] + samp[..., 4]) * 0.25, R0[..., 4] * 0.5)
    r2 = (R0[..., 0] - r2) * 0.5
    r3 = (R0[..., 1] - r3) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    sc = border[None]
    r2 = r2 * sc
    r3 = r3 * sc
    r4 = r4 * sc
    r5 = r5 * sc
    r6 = r6 * sc
    return jnp.stack([r4 * r4 + r6 * r6,
                      (r4 + r5) * r6,
                      r5 * r5 + r6 * r6,
                      r4 * r2 + r6 * r3,
                      r6 * r2 + r5 * r3], axis=-1)


def _box_blur(M: jnp.ndarray, m: int) -> jnp.ndarray:
    """Replicate-padded (2m+1)^2 box sum over [N,H,W,5]."""
    ones_h = np.ones(2 * m + 1, np.float32)
    n, h, w, c = M.shape
    x = M.transpose(0, 3, 1, 2).reshape(n * c, h, w)
    y = _corr1d(x, ones_h, axis=1)
    y = _corr1d(y, ones_h, axis=2)
    return y.reshape(n, c, h, w).transpose(0, 2, 3, 1)


def _update_flow(M: jnp.ndarray, block_size: int) -> jnp.ndarray:
    m = block_size // 2
    scale = 1.0 / (block_size * block_size)
    S = _box_blur(M, m) * scale
    g11, g12, g22, h1, h2 = (S[..., i] for i in range(5))
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    return jnp.stack([(g11 * h2 - g12 * h1) * idet,
                      (g22 * h1 - g12 * h2) * idet], axis=-1)


def _resize_linear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """cv2 INTER_LINEAR (half-pixel centers, clamped, no anti-aliasing)
    over the H, W axes of [N, H0, W0, C]."""
    n, h0, w0, c = x.shape
    sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (h0 / h) - 0.5
    sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (w0 / w) - 0.5
    y0 = jnp.clip(jnp.floor(sy), 0, h0 - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx), 0, w0 - 1).astype(jnp.int32)
    wy = jnp.clip(sy - y0, 0.0, 1.0)
    wx = jnp.clip(sx - x0, 0.0, 1.0)
    y1 = jnp.minimum(y0 + 1, h0 - 1)
    x1 = jnp.minimum(x0 + 1, w0 - 1)
    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] \
        + x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] \
        + x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]


# --- top level --------------------------------------------------------------


def _pyramid_plan(h: int, w: int, pyr_scale: float, levels: int,
                  min_size: int = 32) -> List[Tuple[int, int, float]]:
    """(h_k, w_k, scale_k) coarsest-first, with OpenCV's >=32px level cap."""
    k, scale = 0, 1.0
    while k < levels:
        scale *= pyr_scale
        if w * scale < min_size or h * scale < min_size:
            break
        k += 1
    plan = []
    for lvl in range(k, -1, -1):
        s = pyr_scale ** lvl
        plan.append((int(round(h * s)), int(round(w * s)), s))
    return plan


@functools.partial(jax.jit, static_argnames=(
    "pyr_scale", "levels", "winsize", "iterations", "poly_n", "poly_sigma"))
def farneback_flow(i1: jnp.ndarray, i2: jnp.ndarray, *,
                   pyr_scale: float = 0.5, levels: int = 3,
                   winsize: int = 15, iterations: int = 3,
                   poly_n: int = 5, poly_sigma: float = 1.2) -> jnp.ndarray:
    """cv2.calcOpticalFlowFarneback(flags=0) over a batch.

    i1, i2: [N, H, W] float32 on the uint8 value scale (0..255); the caller
    quantizes (reference converts to uint8 before the flow call).
    Returns [N, H, W, 2] with channels (dx, dy)."""
    i1 = i1.astype(jnp.float32)
    i2 = i2.astype(jnp.float32)
    n, h, w = i1.shape
    g, xg, xxg, coeffs = _poly_exp_kernels(poly_n, poly_sigma)

    flow = None
    for (hk, wk, scale) in _pyramid_plan(h, w, pyr_scale, levels):
        sigma_s = (1.0 / scale - 1.0) * 0.5
        ksz = max(int(round(sigma_s * 5)) | 1, 3)
        smooth = _gaussian_kernel(ksz, sigma_s)
        imgs = []
        for img in (i1, i2):
            pad = len(smooth) // 2
            f = jnp.pad(img, [(0, 0), (pad, pad), (pad, pad)],
                        mode="reflect")[:, :, :, None]
            kh = jnp.asarray(smooth)[:, None, None, None]
            kw = jnp.asarray(smooth)[None, :, None, None]
            dn = jax.lax.conv_dimension_numbers(f.shape, kh.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            f = jax.lax.conv_general_dilated(f, kh, (1, 1), [(0, 0), (0, 0)],
                                             dimension_numbers=dn,
                                             precision=jax.lax.Precision.HIGHEST)
            f = jax.lax.conv_general_dilated(f, kw, (1, 1), [(0, 0), (0, 0)],
                                             dimension_numbers=dn,
                                             precision=jax.lax.Precision.HIGHEST)
            if (hk, wk) != (h, w):
                f = _resize_linear(f, hk, wk)
            imgs.append(f[..., 0])
        R0 = _poly_exp(imgs[0], g, xg, xxg, coeffs)
        R1 = _poly_exp(imgs[1], g, xg, xxg, coeffs)
        if flow is None:
            flow = jnp.zeros((n, hk, wk, 2), jnp.float32)
        elif flow.shape[1:3] != (hk, wk):
            flow = _resize_linear(flow, hk, wk) * (1.0 / pyr_scale)
        border = jnp.asarray(_border_scale(hk, wk))
        M = _update_matrices(R0, R1, flow, border)
        for it in range(iterations):
            flow = _update_flow(M, winsize)
            if it < iterations - 1:
                M = _update_matrices(R0, R1, flow, border)
    return flow
