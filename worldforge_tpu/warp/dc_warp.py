"""Video 4D warp: per-frame inverse-depth point clouds splatted along a
camera trajectory.

Behavioral reference: run_warping
(/root/reference/DepthCrafter/warp_depthcrafter.py:140-301): fixed intrinsics
f=525 c=(W/2,H/2), per-frame points from 1/(depth+0.1), look_at_depth_value =
median(1/(depth[0]+0.1)) * look_at_depth, trajectory matrices applied
directly as the splat's w2c, pytorch3d-equivalent disk splat + 5x5 morph
open, optional depth-edge point filtering (skipped on frame 0).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.warp.cameras import dc_camera_seq
from worldforge_tpu.warp.edge_filter import edge_point_mask
from worldforge_tpu.warp.geometry import dc_intrinsic, dc_unproject
from worldforge_tpu.warp.splat import morph_open, splat_disk


def warp_video(
    frames: np.ndarray,              # [T, H, W, 3] float in [0,1]
    depth: np.ndarray,               # [T, H, W] normalized depth
    *,
    direction: str = "up",
    degree: float = 30.0,
    look_at_depth: float = 0.9,
    stable: bool = False,
    stable_frame: int = 17,
    zoom: str = "none",
    rate: float = 1.0,
    circle_radius: Optional[float] = None,
    enable_edge_filter: bool = False,
    edge_threshold: float = 0.1,
    edge_dilation: int = 3,
    depth_jump_threshold: float = 0.3,
    neighbor_check_radius: int = 2,
    focal: float = 525.0,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Returns (rendered_frames [H,W,3] float32, masks [H,W,1] uint8)."""
    T, H, W, _ = frames.shape
    K = dc_intrinsic(H, W, focal)

    inv0 = 1.0 / (depth[0] + 0.1)
    look_at_value = float(np.median(inv0)) * look_at_depth
    cams = dc_camera_seq(direction, degree, T, look_at_value, stable=stable,
                         stable_frame=stable_frame, zoom=zoom, rate=rate,
                         circle_radius=circle_radius)

    rendered, masks = [], []
    K_j = jnp.asarray(K)
    for idx in range(T):
        inv_d = 1.0 / (depth[idx] + 0.1)
        pts = dc_unproject(jnp.asarray(inv_d), f=focal)  # [N, 3]
        rgb = jnp.asarray(frames[idx].reshape(-1, 3), jnp.float32)
        if enable_edge_filter and idx > 0:
            keep = edge_point_mask(inv_d.astype(np.float64), edge_threshold,
                                   edge_dilation, depth_jump_threshold,
                                   neighbor_check_radius)
            # static shapes under jit: zero out dropped points by pushing
            # them behind the camera instead of compacting the array
            keep_j = jnp.asarray(keep)
            pts = jnp.where(keep_j[:, None], pts,
                            jnp.asarray([0.0, 0.0, -1.0]))
        img_j, mask_j = splat_disk(pts, rgb, jnp.asarray(cams[idx],
                                                         jnp.float32),
                                   K_j, h=H, w=W)
        img = np.array(img_j)  # writable copy
        mask = morph_open(np.asarray(mask_j).astype(np.uint8), 5)
        img[mask == 0] = 0
        rendered.append(img.astype(np.float32))
        masks.append(mask[..., None])
    return rendered, masks
