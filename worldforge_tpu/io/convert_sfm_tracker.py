"""VGGSfM tracker checkpoint conversion (torch state_dict -> JAX pytree).

Reference model: vggt/vggt/dependency/vggsfm_tracker.py:25-56 (coarse
BasicEncoder + predictor, fine ShallowEncoder + predictor)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.torch_load import conv_to_hwio
from worldforge_tpu.sfm.tracker import SfmTrackerConfig


def _cv(sd, name, dtype):
    p = {"w": jnp.asarray(conv_to_hwio(sd[f"{name}.weight"]), dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _dense(sd, name, dtype):
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _res(sd, name, dtype):
    p = {"conv1": _cv(sd, f"{name}.conv1", dtype),
         "conv2": _cv(sd, f"{name}.conv2", dtype)}
    if f"{name}.downsample.0.weight" in sd:
        p["down"] = _cv(sd, f"{name}.downsample.0", dtype)
    return p


def _mha_p(sd, name, dtype):
    return {"in_proj": {"w": jnp.asarray(sd[f"{name}.in_proj_weight"].T,
                                         dtype),
                        "b": jnp.asarray(sd[f"{name}.in_proj_bias"], dtype)},
            "out_proj": _dense(sd, f"{name}.out_proj", dtype)}


def _attn_na(sd, prefix, dtype, attn="attn"):
    p = {"attn": _mha_p(sd, f"{prefix}.{attn}", dtype),
         "mlp": {"fc1": _dense(sd, f"{prefix}.mlp.fc1", dtype),
                 "fc2": _dense(sd, f"{prefix}.mlp.fc2", dtype)}}
    if f"{prefix}.norm_context.weight" in sd:   # cross blocks: affine LN
        p["norm_ctx"] = {
            "scale": jnp.asarray(sd[f"{prefix}.norm_context.weight"], dtype),
            "bias": jnp.asarray(sd[f"{prefix}.norm_context.bias"], dtype)}
    return p


def _updateformer(sd, prefix, cfg: SfmTrackerConfig, dtype):
    p = {"input_transform": _dense(sd, f"{prefix}.input_transform", dtype),
         "flow_head": _dense(sd, f"{prefix}.flow_head", dtype),
         "time_blocks": [_attn_na(sd, f"{prefix}.time_blocks.{i}", dtype)
                         for i in range(cfg.depth)]}
    if cfg.use_spaceatt:
        p["virtual"] = jnp.asarray(sd[f"{prefix}.virual_tracks"], dtype)
        p["space_virtual"] = [
            _attn_na(sd, f"{prefix}.space_virtual_blocks.{i}", dtype)
            for i in range(cfg.depth)]
        p["v2p"] = [_attn_na(sd, f"{prefix}.space_virtual2point_blocks.{i}",
                             dtype, attn="cross_attn")
                    for i in range(cfg.depth)]
        p["p2v"] = [_attn_na(sd, f"{prefix}.space_point2virtual_blocks.{i}",
                             dtype, attn="cross_attn")
                    for i in range(cfg.depth)]
    return p


def _predictor(sd, prefix, cfg: SfmTrackerConfig, dtype):
    p = {"updateformer": _updateformer(sd, f"{prefix}.updateformer", cfg,
                                       dtype),
         "norm": {"scale": jnp.asarray(sd[f"{prefix}.norm.weight"], dtype),
                  "bias": jnp.asarray(sd[f"{prefix}.norm.bias"], dtype)},
         "ffeat_updater": _dense(sd, f"{prefix}.ffeat_updater.0", dtype)}
    if not cfg.fine:
        p["vis_predictor"] = _dense(sd, f"{prefix}.vis_predictor.0", dtype)
    return p


def convert_sfm_tracker(sd: Dict[str, np.ndarray],
                        dtype=jnp.float32) -> dict:
    coarse = {"conv1": _cv(sd, "coarse_fnet.conv1", dtype),
              "conv2": _cv(sd, "coarse_fnet.conv2", dtype),
              "conv3": _cv(sd, "coarse_fnet.conv3", dtype)}
    for i in range(1, 5):
        coarse[f"layer{i}a"] = _res(sd, f"coarse_fnet.layer{i}.0", dtype)
        coarse[f"layer{i}b"] = _res(sd, f"coarse_fnet.layer{i}.1", dtype)
    fine_fnet = {"conv1": _cv(sd, "fine_fnet.conv1", dtype),
                 "layer1": _res(sd, "fine_fnet.layer1", dtype),
                 "layer2": _res(sd, "fine_fnet.layer2", dtype),
                 "conv2": _cv(sd, "fine_fnet.conv2", dtype)}
    return {
        "coarse_fnet": coarse,
        "coarse_predictor": _predictor(sd, "coarse_predictor",
                                       SfmTrackerConfig.coarse(), dtype),
        "fine_fnet": fine_fnet,
        "fine_predictor": _predictor(sd, "fine_predictor",
                                     SfmTrackerConfig.fine_cfg(), dtype),
    }
