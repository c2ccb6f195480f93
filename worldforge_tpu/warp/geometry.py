"""Pinhole geometry: unprojection / transforms / projection (JAX).

Behavioral reference: vggt/modules/utils_warp.py:859-945 (warp core) and
vggt/vggt/utils/geometry.py:15-292 (unproject/project helpers),
DepthCrafter/warp_depthcrafter.py:255-287 (fixed-K unprojection).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def pixel_grid(h: int, w: int) -> jnp.ndarray:
    """Homogeneous pixel coords [3, H*W] = (x, y, 1) row-major."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(x)
    return jnp.stack([x.ravel(), y.ravel(), ones.ravel()], axis=0)


def unproject_depth(depth: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """depth [H, W] + K [3,3] -> camera-frame points [3, H*W]
    (utils_warp.py:859-876: K^-1 @ pix * depth)."""
    h, w = depth.shape
    pix = pixel_grid(h, w)
    rays = jnp.linalg.inv(intrinsic.astype(jnp.float32)) @ pix
    return rays * depth.astype(jnp.float32).ravel()[None, :]


def cam_to_world(points_cam: jnp.ndarray, extrinsic_w2c: jnp.ndarray
                 ) -> jnp.ndarray:
    """points [3, N] from the *source* camera frame to world via the inverse
    of a w2c extrinsic (utils_warp.py:869-876)."""
    R = extrinsic_w2c[:3, :3].astype(jnp.float32)
    t = extrinsic_w2c[:3, 3].astype(jnp.float32)
    return R.T @ points_cam - (R.T @ t)[:, None]


def world_to_cam(points_world: jnp.ndarray, extrinsic_w2c: jnp.ndarray
                 ) -> jnp.ndarray:
    R = extrinsic_w2c[:3, :3].astype(jnp.float32)
    t = extrinsic_w2c[:3, 3].astype(jnp.float32)
    return R @ points_world + t[:, None]


def project(points_cam: jnp.ndarray, intrinsic: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[3, N] camera points -> (uv [2, N], z [N])."""
    z = points_cam[2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1.0)
    uvw = intrinsic.astype(jnp.float32) @ (points_cam / safe_z[None])
    return uvw[:2], z


def dc_unproject(inv_depth: jnp.ndarray, f: float = 525.0) -> jnp.ndarray:
    """DepthCrafter unprojection (warp_depthcrafter.py:206-271): fixed
    intrinsics f=525, c=(W/2, H/2); input is 1/(depth+0.1). Returns
    points [N, 3] in the source camera frame (== world, identity pose)."""
    h, w = inv_depth.shape
    ii, jj = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    d = inv_depth.astype(jnp.float32)
    x = (jj - 0.5 * w) * d / f
    y = (ii - 0.5 * h) * d / f
    return jnp.stack([x.ravel(), y.ravel(), d.ravel()], axis=-1)


def dc_intrinsic(h: int, w: int, f: float = 525.0) -> np.ndarray:
    return np.array([[f, 0.0, 0.5 * w], [0.0, f, 0.5 * h], [0.0, 0.0, 1.0]],
                    np.float32)
