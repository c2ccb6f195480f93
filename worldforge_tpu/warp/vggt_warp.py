"""Single-image 3D warp: unproject -> camera trajectory -> splat -> fill.

Behavioral reference: warp_single_img
(/root/reference/vggt/modules/utils_warp.py:724-1000). TPU-first split:
the per-pixel unprojection and ALL frames' project+z-buffer-splat run as one
jit-compiled, frame-batched JAX computation; per-frame crack filling (small
morphology + scalar hole loops) stays on host, as in the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.warp.cameras import vggt_camera_seq
from worldforge_tpu.warp.cracks import (DEFAULT_CRACK_PARAMS,
                                        depth_aware_crack_filling,
                                        fill_small_cracks)
from worldforge_tpu.warp.geometry import cam_to_world, unproject_depth
from worldforge_tpu.warp.splat import splat_nearest


def _filter_depth_by_confidence(depth: np.ndarray,
                                conf: Optional[np.ndarray],
                                conf_threshold: float):
    """Percentile confidence filtering (utils_warp.py:774-806).

    Matches the reference's three branches exactly: with conf and
    threshold != 1.0, percentile-filter and NaN the rejected pixels; with
    conf and threshold == 1.0 the depth map is kept un-NaN'd
    (utils_warp.py:784-786); without conf, invalid (NaN/<=0) pixels are
    NaN'd."""
    filtered = depth.astype(np.float32).copy()
    if conf is not None and conf_threshold == 1.0:
        mask = ~np.isnan(filtered) & (filtered > 0)
    elif conf is not None:
        thr = np.percentile(conf.flatten(), (1 - conf_threshold) * 100)
        mask = conf > thr
        filtered[~mask] = np.nan
    else:
        mask = ~np.isnan(filtered) & (filtered > 0)
        filtered[~mask] = np.nan
    mean_depth = np.nanmean(filtered[mask]) if mask.any() else 1.0
    return filtered, mask, float(mean_depth)


def warp_single_image(
    extrinsic: np.ndarray,            # [3,4] or [4,4] w2c
    intrinsic: np.ndarray,            # [3,3]
    image: np.ndarray,                # [H,W,3] float in [0,1] or uint8
    depth_map: np.ndarray,            # [H,W]
    depth_conf: Optional[np.ndarray] = None,
    *,
    direction: str = "right",
    degree: float = 15.0,
    conf_threshold: float = 0.5,
    frame_num: int = 24,
    look_at_depth: float = 1.0,
    fill_cracks: bool = True,
    crack_params: Optional[Dict] = None,
    depth_segments: int = 5,
    disable_depth_aware_fill: bool = False,
) -> Tuple[List[np.ndarray], List[np.ndarray], List[Dict]]:
    """Returns (warped_images uint8, warped_masks {0,1} uint8, camera_info).
    Frame 0 is the original image with an all-ones mask (utils_warp:846-857).
    """
    # Keep colors at the INPUT scale through the splat (the reference never
    # normalizes, utils_warp.py:753-761); unit_scale tracks whether a *255
    # is due at uint8-output time (utils_warp.py:846, 949-952).
    img = image.astype(np.float32)
    unit_scale = img.max() <= 1.0
    H, W, C = img.shape

    filtered_depth, _, mean_depth = _filter_depth_by_confidence(
        depth_map, depth_conf, conf_threshold)
    adjusted_depth = mean_depth * look_at_depth

    cams = vggt_camera_seq(extrinsic, direction, degree, frame_num,
                           adjusted_depth)

    # unproject once; world points (utils_warp.py:859-876)
    depth_j = jnp.asarray(np.nan_to_num(filtered_depth, nan=0.0))
    valid = jnp.asarray(~np.isnan(filtered_depth) &
                        (np.nan_to_num(filtered_depth) > 0)).ravel()
    pts_cam = unproject_depth(depth_j, jnp.asarray(intrinsic))
    e44 = np.eye(4)
    e44[:3] = extrinsic[:3] if extrinsic.shape[0] >= 3 else extrinsic
    pts_world = cam_to_world(pts_cam, jnp.asarray(e44))
    colors = jnp.asarray(img.reshape(-1, C))

    @jax.jit
    def splat_all(cams_j):
        def one(cam):
            pc = cam[:3, :3] @ pts_world + cam[:3, 3][:, None]
            return splat_nearest(pc, colors, jnp.asarray(intrinsic,
                                                         jnp.float32),
                                 valid, h=H, w=W)
        return jax.vmap(one)(cams_j)

    imgs_j, masks_j, depths_j = splat_all(jnp.asarray(cams[1:],
                                                      jnp.float32))
    imgs_np = np.asarray(imgs_j)
    masks_np = np.asarray(masks_j)
    depths_np = np.asarray(depths_j)

    params = {**DEFAULT_CRACK_PARAMS, **(crack_params or {})}

    warped_images = [(img * 255).astype(np.uint8) if unit_scale
                     else img.astype(np.uint8)]
    warped_masks = [np.ones((H, W), np.uint8)]
    infos = [{"type": "original", "camera_name": "original",
              "direction": direction, "angle": 0.0}]

    for i in range(len(cams) - 1):
        # the reference quantizes the splatted frame to uint8 BEFORE crack
        # filling (utils_warp.py:949-956) — filled colors are means over the
        # quantized values, so the round-trip is load-bearing for parity
        wi8 = ((imgs_np[i] * 255).astype(np.uint8) if unit_scale
               else imgs_np[i].astype(np.uint8))
        bm = masks_np[i].astype(np.uint8)
        wd = depths_np[i]
        if fill_cracks:
            wi = wi8.astype(np.float32) / 255.0
            use_depth_aware = (not disable_depth_aware_fill
                               and np.sum(~np.isnan(wd)) > 100)
            if use_depth_aware:
                fi, fm, _ = depth_aware_crack_filling(
                    wi, bm, wd, params, num_segments=depth_segments)
            else:
                fi, fm = fill_small_cracks(
                    wi, bm, filtered_depth, depth_conf=depth_conf,
                    depth_threshold=params["depth_threshold"],
                    max_crack_size=params["max_crack_size"],
                    min_valid_neighbors=params["min_valid_neighbors"])
            wi8, bm = (fi * 255).astype(np.uint8), fm
        warped_images.append(wi8)
        warped_masks.append(bm.astype(np.uint8))
        angle = degree * (i + 2) / frame_num
        infos.append({"type": "single_view_warped", "direction": direction,
                      "angle": angle,
                      "camera_name": f"{direction}_{angle:.2f}_deg"})
    return warped_images, warped_masks, infos
