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
