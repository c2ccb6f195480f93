"""Z-buffer point-splat rasterizers (JAX, jit) — the TPU replacement for the
pytorch3d CUDA rasterizer and the reference's numpy scatter.

Two variants, matching the two reference paths:

  * ``splat_nearest`` — VGGT warp: round each point to its nearest pixel,
    nearest-in-z wins (utils_warp.py:903-945 sorts far->near and lets the
    last write win == min-z; we use a deterministic segment-min instead).

  * ``splat_disk`` — DepthCrafter warp: each point covers the pixels whose
    centers lie within a pytorch3d-style NDC radius (0.005 over the short
    side mapped to [-1, 1]); nearest point per pixel wins; then a 5x5
    morphological open on the mask (DepthCrafter/utils.py:103-171,
    pytorch3d PointsRasterizer radius=0.005, points_per_pixel=10 with
    fragments.idx[...,0]). A pure-numpy oracle exists in the reference at
    DepthCrafter/utils.py:173-237.

Implementation: scatter by linear pixel index; jax.ops.segment_min finds the
winning depth; the winner's color is recovered by matching depth (ties are
broken deterministically via the point index folded into the mantissa-free
integer compare).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


_BIG = jnp.float32(3.0e38)
_BIG_I = jnp.int32(2 ** 31 - 1)


def _winner_take_all(flat_idx: jnp.ndarray, z: jnp.ndarray,
                     colors: jnp.ndarray, valid: jnp.ndarray,
                     num_pixels: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Min-z scatter: returns (color [P, C], zbuf [P], mask [P]).

    Two-pass deterministic argmin: segment-min on z, then segment-min on
    point index among the z-winners (ties -> lowest point index, matching a
    first-wins sequential z-buffer)."""
    n = z.shape[0]
    idx = jnp.where(valid, flat_idx, num_pixels)  # invalid -> overflow bucket
    zm = jnp.where(valid, z.astype(jnp.float32), _BIG)
    zbuf = jax.ops.segment_min(zm, idx, num_segments=num_pixels + 1)
    zbuf = zbuf[:num_pixels]
    is_win = valid & (zm == zbuf[jnp.clip(flat_idx, 0, num_pixels - 1)])
    pid = jnp.arange(n, dtype=jnp.int32)
    win_pid = jax.ops.segment_min(jnp.where(is_win, pid, _BIG_I), idx,
                                  num_segments=num_pixels + 1)[:num_pixels]
    mask = zbuf < _BIG
    color = colors[jnp.where(mask, win_pid, 0)]
    color = jnp.where(mask[:, None], color, 0.0)
    zbuf = jnp.where(mask, zbuf, jnp.inf)
    return color, zbuf, mask


@functools.partial(jax.jit, static_argnames=("h", "w", "round_first"))
def splat_nearest(points_cam: jnp.ndarray, colors: jnp.ndarray,
                  intrinsic: jnp.ndarray, valid: jnp.ndarray, *,
                  h: int, w: int, round_first: bool = False):
    """VGGT-style splat. points_cam [3, N] in the target camera frame,
    colors [N, C], valid [N] bool. Returns (image [H,W,C], mask [H,W],
    depth [H,W]).

    Border semantics differ between the two reference renderers:
      * round_first=False (default) — bounds-check the FLOAT coordinates,
        then round and clip (utils_warp.py:921-927): a point at u=W-0.4
        clips into the last column.
      * round_first=True — round to the nearest pixel first, then
        bounds-check the integers with no clip (the DepthCrafter CPU
        renderer, DepthCrafter/utils.py:199-212): u=-0.4 lands in column 0,
        u=W-0.4 falls out of frame."""
    z = points_cam[2]
    ok = valid & (jnp.abs(z) > 1e-6)
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1.0)
    uvw = intrinsic.astype(jnp.float32) @ (points_cam / safe_z[None])
    u = jnp.round(uvw[0]).astype(jnp.int32)
    v = jnp.round(uvw[1]).astype(jnp.int32)
    if round_first:
        inb = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    else:
        inb = (uvw[0] >= 0) & (uvw[0] < w) & (uvw[1] >= 0) & (uvw[1] < h)
    ok = ok & inb
    u = jnp.clip(u, 0, w - 1)
    v = jnp.clip(v, 0, h - 1)
    color, zbuf, mask = _winner_take_all(v * w + u, z, colors, ok, h * w)
    img = color.reshape(h, w, -1)
    m = mask.reshape(h, w)
    depth = jnp.where(m, zbuf.reshape(h, w), jnp.nan)
    return img, m, depth


def render_points_nearest(points: np.ndarray, features: np.ndarray,
                          extrinsic: np.ndarray, intrinsic: np.ndarray,
                          h: int, w: int):
    """CPU-fallback point renderer matching the reference's numpy renderer
    (DepthCrafter/utils.py:173-237 project_points_to_image_numpy):
    nearest-pixel min-z splat with round-then-bounds-check borders, 3x3
    morphological CLOSE on the mask, griddata-linear colors at the pixels
    the CLOSE adds (the reference interpolates the whole grid up front;
    only the closed-in crack pixels survive with those values — z-winners
    overwrite everything else and off-mask pixels are zeroed).
    Returns (image [H,W,C] float32, mask [H,W] uint8)."""
    import jax.numpy as jnp_  # local: host helper, jit'd splat inside
    pc = (extrinsic[:3, :3] @ points.T + extrinsic[:3, 3][:, None])
    img_j, mask0_j, _ = splat_nearest(
        jnp_.asarray(pc, jnp_.float32), jnp_.asarray(features, jnp_.float32),
        jnp_.asarray(intrinsic, jnp_.float32),
        jnp_.ones(points.shape[0], bool), h=h, w=w, round_first=True)
    import cv2
    mask0 = np.asarray(mask0_j)
    mask = cv2.morphologyEx(mask0.astype(np.uint8), cv2.MORPH_CLOSE,
                            np.ones((3, 3), np.uint8))
    img = np.asarray(img_j).copy()
    crack = (mask > 0) & ~mask0
    if crack.any():
        from scipy.interpolate import griddata
        # same uv set as the reference (float64 projection, np.round)
        z = pc[2]
        u = np.round(intrinsic[0, 0] * (pc[0] / z) + intrinsic[0, 2]
                     ).astype(int)
        v = np.round(intrinsic[1, 1] * (pc[1] / z) + intrinsic[1, 2]
                     ).astype(int)
        ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        cy, cx = np.nonzero(crack)
        vals = griddata(np.stack((u[ok], v[ok]), axis=-1), features[ok],
                        np.stack((cx, cy), axis=-1).astype(np.float32),
                        method="linear", fill_value=0)
        img[cy, cx] = np.clip(vals, 0, 1).astype(np.float32)
    img[mask == 0] = 0
    return img, mask


def _disk_offsets(radius_px: float):
    r = int(np.ceil(radius_px + 0.5))
    offs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            offs.append((dy, dx))
    return offs


@functools.partial(jax.jit, static_argnames=("h", "w", "radius_ndc"))
def splat_disk(points: jnp.ndarray, colors: jnp.ndarray,
               extrinsic: jnp.ndarray, intrinsic: jnp.ndarray, *,
               h: int, w: int, radius_ndc: float = 0.005):
    """DepthCrafter-style splat. points [N, 3] world, extrinsic 4x4 used as
    OpenCV w2c (warp_depthcrafter.py passes the trajectory matrix directly),
    colors [N, C]. Each point covers pixels whose centers fall within the
    NDC radius; min-z point per pixel wins."""
    pc = (extrinsic[:3, :3].astype(jnp.float32) @ points.T.astype(jnp.float32)
          + extrinsic[:3, 3].astype(jnp.float32)[:, None])  # [3, N]
    z = pc[2]
    ok0 = z > 1e-6
    safe_z = jnp.where(ok0, z, 1.0)
    uvw = intrinsic.astype(jnp.float32) @ (pc / safe_z[None])
    uf, vf = uvw[0], uvw[1]

    radius_px = radius_ndc * min(h, w) / 2.0
    num_pixels = h * w
    n = points.shape[0]
    offsets = _disk_offsets(radius_px)

    # gather (flat_idx, z, pid) for every (point, offset) pair, then one
    # two-pass winner-take-all over the expanded set
    idx_all, z_all, pid_all, ok_all = [], [], [], []
    pid = jnp.arange(n, dtype=jnp.int32)
    for dy, dx in offsets:
        px = jnp.floor(uf).astype(jnp.int32) + dx
        py = jnp.floor(vf).astype(jnp.int32) + dy
        dist2 = (uf - px.astype(jnp.float32)) ** 2 + \
                (vf - py.astype(jnp.float32)) ** 2
        cover = dist2 <= radius_px ** 2
        inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        okk = ok0 & cover & inb
        idx_all.append(jnp.where(okk, py * w + jnp.clip(px, 0, w - 1),
                                 num_pixels))
        z_all.append(z)
        pid_all.append(pid)
        ok_all.append(okk)

    idx_c = jnp.concatenate(idx_all)
    z_c = jnp.concatenate(z_all)
    ok_c = jnp.concatenate(ok_all)
    zm = jnp.where(ok_c, z_c.astype(jnp.float32), _BIG)
    zbuf = jax.ops.segment_min(zm, idx_c, num_segments=num_pixels + 1)
    is_win = ok_c & (zm == zbuf[jnp.clip(idx_c, 0, num_pixels - 1)])
    pid_c = jnp.concatenate(pid_all)
    win_pid = jax.ops.segment_min(jnp.where(is_win, pid_c, _BIG_I), idx_c,
                                  num_segments=num_pixels + 1)[:num_pixels]
    mask = zbuf[:num_pixels] < _BIG
    color = jnp.where(mask[:, None], colors[jnp.where(mask, win_pid, 0)], 0.0)
    return color.reshape(h, w, -1), mask.reshape(h, w)


def morph_open(mask: np.ndarray, ksize: int = 5) -> np.ndarray:
    """Binary morphological open (erode then dilate) with a ksize x ksize
    ones kernel — the post-splat cleanup (DepthCrafter/utils.py:167-170).
    Uses cv2 when available for bit-parity with the reference's border
    handling; scipy fallback otherwise."""
    try:
        import cv2
        return cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_OPEN,
                                np.ones((ksize, ksize), np.uint8)
                                ).astype(mask.dtype)
    except ImportError:
        from scipy import ndimage
        st = np.ones((ksize, ksize), bool)
        return ndimage.binary_opening(mask.astype(bool), structure=st).astype(
            mask.dtype)
