"""Bilinear sampling / resize primitives with torch-matching conventions.

align_corners=True semantics match F.interpolate/grid_sample
(vggt heads + track modules use them throughout); implemented as explicit
gathers + fused lerp weights — jit/TPU friendly, no grid_sample kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(grid: jnp.ndarray, xy: jnp.ndarray,
                    padding: str = "border") -> jnp.ndarray:
    """align_corners=True bilinear sampling (vggt heads/track_modules/
    utils.py:124-190). grid [M, H, W, C]; xy [M, K, 2] pixel (x, y).
    padding 'border' clamps, 'zeros' zeroes out-of-range contributions."""
    m, h, w, c = grid.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, wy = x - x0, y - y0

    def gather(xi, yi):
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda g, yy, xx: g[yy, xx])(grid, yc, xc)  # [M,K,C]
        if padding == "zeros":
            ok = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
            vals = vals * ok[..., None].astype(vals.dtype)
        return vals

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def resize_align_corners(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """align_corners=True bilinear resize of [B, H, W, C] (torch
    F.interpolate(mode='bilinear', align_corners=True))."""
    b, ih, iw, c = x.shape
    if (ih, iw) == (h, w):
        return x
    ys = jnp.linspace(0.0, ih - 1.0, h)
    xs = jnp.linspace(0.0, iw - 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)[None]
    pts = jnp.broadcast_to(pts, (b, h * w, 2))
    return bilinear_sample(x, pts, padding="border").reshape(b, h, w, c)


def interp1d_align_corners(x: jnp.ndarray, n_out: int, axis: int
                           ) -> jnp.ndarray:
    """Linear align_corners=True resample along one axis (torch
    F.interpolate(mode='linear'/'trilinear', align_corners=True) is
    separable, so 3D resizes compose from this)."""
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    p = jnp.linspace(0.0, n_in - 1.0, n_out)
    i0 = jnp.floor(p).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    w1 = (p - i0).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = n_out
    w1 = w1.reshape(shape)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    return x0 * (1.0 - w1) + x1 * w1


def resize3d_align_corners(x: jnp.ndarray, t: int, h: int, w: int
                           ) -> jnp.ndarray:
    """align_corners=True trilinear resize of [B, C, T, H, W] (torch
    F.interpolate(mode='trilinear', align_corners=True))."""
    x = interp1d_align_corners(x, t, axis=2)
    x = interp1d_align_corners(x, h, axis=3)
    return interp1d_align_corners(x, w, axis=4)
