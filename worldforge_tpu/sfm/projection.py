"""World -> camera -> pixel projection with optional lens distortion.

Behavioral reference: vggt/vggt/dependency/projection.py:12-185
(img_from_cam / project_3D_points, numpy and torch twins — one JAX
implementation here). Extrinsics are world-to-camera [R|t] (3x4),
intrinsics are K (3x3), distortion params follow sfm/distortion.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from worldforge_tpu.sfm.distortion import apply_distortion


def img_from_cam(intrinsics: jnp.ndarray, points_cam: jnp.ndarray,
                 extra_params: Optional[jnp.ndarray] = None,
                 default: float = 0.0) -> jnp.ndarray:
    """[B,3,3] K, [B,3,N] camera points -> [B,N,2] pixels
    (projection.py:12-48)."""
    z = points_cam[:, 2:3, :]
    uv = (points_cam / z)[:, :2, :]
    if extra_params is not None:
        uu, vv = apply_distortion(extra_params, uv[:, 0], uv[:, 1])
        uv = jnp.stack([uu, vv], axis=1)
    ones = jnp.ones_like(uv[:, :1, :])
    h = jnp.concatenate([uv, ones], axis=1)
    p2d = jnp.einsum("bij,bjn->bin", intrinsics, h)[:, :2]
    p2d = jnp.nan_to_num(p2d, nan=default)
    return p2d.transpose(0, 2, 1)


def project_3d_points(points3d: jnp.ndarray, extrinsics: jnp.ndarray,
                      intrinsics: Optional[jnp.ndarray] = None,
                      extra_params: Optional[jnp.ndarray] = None,
                      default: float = 0.0,
                      only_points_cam: bool = False
                      ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """[N,3] world points + [B,3,4] w2c extrinsics -> ([B,N,2] pixels,
    [B,3,N] camera points) (projection.py:50-139; the reference upcasts to
    float64 — under JAX's default x64-disabled config this runs fp32,
    which the parity test bounds at <1e-4 relative)."""
    pts = points3d.astype(jnp.float32)
    ext = extrinsics.astype(jnp.float32)
    n = pts.shape[0]
    h = jnp.concatenate([pts, jnp.ones((n, 1), pts.dtype)], axis=1)  # [N,4]
    points_cam = jnp.einsum("bij,nj->bin", ext, h)                   # [B,3,N]
    if only_points_cam:
        return None, points_cam
    if intrinsics is None:
        raise ValueError("intrinsics required unless only_points_cam")
    p2d = img_from_cam(intrinsics.astype(jnp.float32), points_cam,
                       extra_params, default)
    return p2d, points_cam
