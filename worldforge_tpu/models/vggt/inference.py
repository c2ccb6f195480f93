"""VGGT inference entry: image(s) -> depth + camera (run_warp stage 1).

Behavioral reference: vggt/run_warp.py:199-292 (model fwd, camera head,
pose conversion, depth head, resize back to original resolution).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.models.vggt.heads import (CameraHeadConfig, DPTHeadConfig,
                                              camera_head_forward,
                                              dpt_head_forward,
                                              init_camera_head, init_dpt_head)
from worldforge_tpu.models.vggt.model import (VGGTConfig,
                                              init_vggt_aggregator,
                                              vggt_aggregator_forward)
from worldforge_tpu.models.vggt.utils import (load_and_preprocess_images,
                                              pose_encoding_to_extri_intri)


def _point_cfg(cfg: VGGTConfig) -> DPTHeadConfig:
    """World-point DPT head (vggt.py:48-55): 4 channels (xyz + conf),
    inv_log activation."""
    return DPTHeadConfig(dim_in=cfg.embed_dim * 2,
                         patch_size=cfg.patch_size, output_dim=4,
                         activation="inv_log", conf_activation="expp1")


def init_vggt_full(key, cfg: VGGTConfig, dtype=jnp.float32,
                   enable_point: bool = False,
                   enable_track: bool = False) -> dict:
    ks = jax.random.split(key, 5)
    d2 = cfg.embed_dim * 2
    params = {
        "aggregator": init_vggt_aggregator(ks[0], cfg, dtype),
        "camera_head": init_camera_head(
            ks[1], CameraHeadConfig(dim_in=d2,
                                    num_heads=cfg.num_heads), dtype),
        "depth_head": init_dpt_head(
            ks[2], DPTHeadConfig(dim_in=d2, patch_size=cfg.patch_size),
            dtype),
    }
    if enable_point:
        params["point_head"] = init_dpt_head(ks[3], _point_cfg(cfg), dtype)
    if enable_track:
        from worldforge_tpu.models.vggt.track import (TrackHeadConfig,
                                                      init_track_head)
        params["track_head"] = init_track_head(
            ks[4], TrackHeadConfig(dim_in=d2, patch_size=cfg.patch_size),
            dtype)
    return params


def vggt_forward(params, cfg: VGGTConfig, images: jnp.ndarray,
                 query_points: Optional[jnp.ndarray] = None):
    """images [B, S, 3, H, W] in [0,1] -> dict with pose_enc [B,S,9],
    depth [B,S,H,W,1], depth_conf [B,S,H,W]; world_points(+conf) when a
    point head is present; track (coords, vis, conf) when a track head is
    present and query_points [B,N,2] given (vggt.py:57-96)."""
    taps = vggt_aggregator_forward(params["aggregator"], cfg, images)
    last = taps[cfg.depth - 1]
    cam_cfg = CameraHeadConfig(dim_in=cfg.embed_dim * 2,
                               num_heads=cfg.num_heads)
    pose_enc = camera_head_forward(params["camera_head"], cam_cfg,
                                   last[:, :, 0])
    dpt_cfg = DPTHeadConfig(dim_in=cfg.embed_dim * 2,
                            patch_size=cfg.patch_size)
    tapped = [taps[i] for i in cfg.intermediate_layer_idx]
    depth, conf = dpt_head_forward(params["depth_head"], dpt_cfg, tapped,
                                   images.shape[-2:], cfg.patch_start_idx)
    out = {"pose_enc": pose_enc, "depth": depth, "depth_conf": conf}
    if "point_head" in params:
        pts, pconf = dpt_head_forward(params["point_head"], _point_cfg(cfg),
                                      tapped, images.shape[-2:],
                                      cfg.patch_start_idx)
        out["world_points"] = pts
        out["world_points_conf"] = pconf
    if "track_head" in params and query_points is not None:
        from worldforge_tpu.models.vggt.track import (TrackHeadConfig,
                                                      track_head_forward)
        tcfg = TrackHeadConfig(dim_in=cfg.embed_dim * 2,
                               patch_size=cfg.patch_size)
        preds, vis, tconf = track_head_forward(
            params["track_head"], tcfg, tapped, images.shape[-2:],
            cfg.patch_start_idx, query_points)
        out["track"] = preds[-1]
        out["vis"] = vis
        out["track_conf"] = tconf
    return out


def vggt_estimate(image_paths: Union[str, List[str]],
                  checkpoint: Optional[str] = None,
                  camera_index: int = 0
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full run_warp stage-1: returns (depth [H,W], conf [H,W],
    extrinsic [4,4] w2c, intrinsic [3,3]) for the selected camera/frame."""
    if isinstance(image_paths, str):
        image_paths = [image_paths]
    images = load_and_preprocess_images(image_paths)  # [S,3,H,W]
    cfg = VGGTConfig.vggt_1b()
    if checkpoint is not None:
        from worldforge_tpu.io.convert_vggt import load_converted_vggt
        params = load_converted_vggt(checkpoint, cfg)
    else:
        raise SystemExit(
            "VGGT weights required: pass --vggt_checkpoint (converted from "
            "facebook/VGGT-1B) or use --depth_npz with precomputed depth.")

    x = jnp.asarray(images)[None]
    out = jax.jit(lambda p, im: vggt_forward(p, cfg, im))(params, x)
    pose_enc, depth, conf = out["pose_enc"], out["depth"], out["depth_conf"]
    extr, intr = pose_encoding_to_extri_intri(
        np.asarray(pose_enc), images.shape[-2:])
    e44 = np.eye(4)
    e44[:3] = extr[0, camera_index]
    return (np.asarray(depth)[0, camera_index, :, :, 0],
            np.asarray(conf)[0, camera_index],
            e44, intr[0, camera_index])
