"""VGGT (facebook/VGGT-1B) checkpoint conversion."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.torch_load import (conv_to_hwio, deconv_to_hwio,
                                          linear_w, load_state_dict)
from worldforge_tpu.models.vggt.model import VGGTConfig


def _dense(sd, name, dtype, bias=True):
    p = {"w": jnp.asarray(linear_w(sd, f"{name}.weight"), dtype)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _ln(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _vit_block(sd, prefix, dtype, qk_norm=False):
    p = {
        "norm1": _ln(sd, f"{prefix}.norm1", dtype),
        "qkv": _dense(sd, f"{prefix}.attn.qkv", dtype),
        "proj": _dense(sd, f"{prefix}.attn.proj", dtype),
        "ls1": {"gamma": jnp.asarray(sd[f"{prefix}.ls1.gamma"], dtype)},
        "norm2": _ln(sd, f"{prefix}.norm2", dtype),
        "fc1": _dense(sd, f"{prefix}.mlp.fc1", dtype),
        "fc2": _dense(sd, f"{prefix}.mlp.fc2", dtype),
        "ls2": {"gamma": jnp.asarray(sd[f"{prefix}.ls2.gamma"], dtype)},
    }
    if qk_norm:
        p["q_norm"] = _ln(sd, f"{prefix}.attn.q_norm", dtype)
        p["k_norm"] = _ln(sd, f"{prefix}.attn.k_norm", dtype)
    return p


def convert_vggt_aggregator(sd: Dict[str, np.ndarray], cfg: VGGTConfig,
                            dtype=jnp.float32,
                            prefix: str = "aggregator") -> dict:
    """Aggregator (+ DINOv2 backbone) weights -> pytree. prefix='' for a
    bare Aggregator state dict."""
    agg = prefix if prefix else ""
    dot = "." if agg else ""
    agg_d = f"{agg}{dot}"
    pe = f"{agg_d}patch_embed"
    # DINOv2 patch conv [out, 3, 14, 14] -> dense [(ph pw c), out]
    pw = sd[f"{pe}.patch_embed.proj.weight"]
    pw_d = np.transpose(pw, (2, 3, 1, 0)).reshape(-1, pw.shape[0])
    backbone = {
        "patch": {"w": jnp.asarray(pw_d, dtype),
                  "b": jnp.asarray(sd[f"{pe}.patch_embed.proj.bias"], dtype)},
        "cls": jnp.asarray(sd[f"{pe}.cls_token"], dtype),
        "registers": jnp.asarray(sd[f"{pe}.register_tokens"], dtype),
        "pos": jnp.asarray(sd[f"{pe}.pos_embed"], dtype),
        "blocks": [_vit_block(sd, f"{pe}.blocks.{i}", dtype)
                   for i in range(cfg.backbone.depth)],
        "norm": _ln(sd, f"{pe}.norm", dtype),
    }
    aggregator = {
        "backbone": backbone,
        "camera_token": jnp.asarray(sd[f"{agg_d}camera_token"], dtype),
        "register_token": jnp.asarray(sd[f"{agg_d}register_token"], dtype),
        "frame_blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[_vit_block(sd, f"{agg_d}frame_blocks.{i}", dtype, qk_norm=True)
              for i in range(cfg.depth)]),
        "global_blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[_vit_block(sd, f"{agg_d}global_blocks.{i}", dtype, qk_norm=True)
              for i in range(cfg.depth)]),
    }
    return aggregator


def convert_vggt(sd: Dict[str, np.ndarray], cfg: VGGTConfig,
                 dtype=jnp.float32) -> dict:
    aggregator = convert_vggt_aggregator(sd, cfg, dtype)

    ch = "camera_head"
    camera = {
        "trunk": [_vit_block(sd, f"{ch}.trunk.{i}", dtype)
                  for i in range(4)],
        "token_norm": _ln(sd, f"{ch}.token_norm", dtype),
        "trunk_norm": _ln(sd, f"{ch}.trunk_norm", dtype),
        "empty_pose": jnp.asarray(sd[f"{ch}.empty_pose_tokens"], dtype),
        "embed_pose": _dense(sd, f"{ch}.embed_pose", dtype),
        "mod": _dense(sd, f"{ch}.poseLN_modulation.1", dtype),
        "branch_fc1": _dense(sd, f"{ch}.pose_branch.fc1", dtype),
        "branch_fc2": _dense(sd, f"{ch}.pose_branch.fc2", dtype),
    }

    out = {"aggregator": aggregator, "camera_head": camera,
           "depth_head": _convert_dpt(sd, "depth_head", dtype)}
    if "point_head.norm.weight" in sd:
        out["point_head"] = _convert_dpt(sd, "point_head", dtype)
    if "track_head.tracker.fmap_norm.weight" in sd:
        out["track_head"] = convert_track_head(sd, dtype=dtype)
    return out


def _mha(sd, name, dtype):
    """torch nn.MultiheadAttention -> fused in-proj + out-proj."""
    return {"in_proj": {"w": jnp.asarray(sd[f"{name}.in_proj_weight"].T,
                                         dtype),
                        "b": jnp.asarray(sd[f"{name}.in_proj_bias"], dtype)},
            "out_proj": _dense(sd, f"{name}.out_proj", dtype)}


def _attn_block_p(sd, prefix, dtype, attn="attn"):
    p = {"norm1": _ln(sd, f"{prefix}.norm1", dtype),
         "norm2": _ln(sd, f"{prefix}.norm2", dtype),
         "attn": _mha(sd, f"{prefix}.{attn}", dtype),
         "mlp": {"fc1": _dense(sd, f"{prefix}.mlp.fc1", dtype),
                 "fc2": _dense(sd, f"{prefix}.mlp.fc2", dtype)}}
    if f"{prefix}.norm_context.weight" in sd:
        p["norm_ctx"] = _ln(sd, f"{prefix}.norm_context", dtype)
    return p


def convert_track_predictor(sd: Dict[str, np.ndarray], depth: int,
                            prefix: str = "", dtype=jnp.float32) -> dict:
    """BaseTrackerPredictor weights (track_modules/base_track_predictor.py
    :17-80) -> models/vggt/track.py pytree. `prefix` e.g.
    'track_head.tracker.'."""
    uf = f"{prefix}updateformer"
    return {
        "corr_mlp": {"fc1": _dense(sd, f"{prefix}corr_mlp.fc1", dtype),
                     "fc2": _dense(sd, f"{prefix}corr_mlp.fc2", dtype)},
        "query_ref_token": jnp.asarray(sd[f"{prefix}query_ref_token"], dtype),
        "updateformer": {
            "input_norm": _ln(sd, f"{uf}.input_norm", dtype),
            "input_transform": _dense(sd, f"{uf}.input_transform", dtype),
            "virtual": jnp.asarray(sd[f"{uf}.virual_tracks"], dtype),  # (sic)
            "time_blocks": [
                _attn_block_p(sd, f"{uf}.time_blocks.{i}", dtype)
                for i in range(depth)],
            "space_virtual": [
                _attn_block_p(sd, f"{uf}.space_virtual_blocks.{i}", dtype)
                for i in range(depth)],
            "v2p": [_attn_block_p(sd, f"{uf}.space_virtual2point_blocks.{i}",
                                  dtype, attn="cross_attn")
                    for i in range(depth)],
            "p2v": [_attn_block_p(sd, f"{uf}.space_point2virtual_blocks.{i}",
                                  dtype, attn="cross_attn")
                    for i in range(depth)],
            "output_norm": _ln(sd, f"{uf}.output_norm", dtype),
            "flow_head": _dense(sd, f"{uf}.flow_head", dtype),
        },
        "fmap_norm": _ln(sd, f"{prefix}fmap_norm", dtype),
        "ffeat_norm": _ln(sd, f"{prefix}ffeat_norm", dtype),
        "ffeat_updater": _dense(sd, f"{prefix}ffeat_updater.0", dtype),
        "vis_predictor": _dense(sd, f"{prefix}vis_predictor.0", dtype),
        "conf_predictor": _dense(sd, f"{prefix}conf_predictor.0", dtype),
    }


def _convert_dpt(sd: Dict[str, np.ndarray], prefix: str, dtype,
                 feature_only: bool = False) -> dict:
    """Shared DPT-head weight mapping (also used for the track feature
    extractor, which is feature_only and lacks output_conv2)."""

    def cv(name, bias=True):
        p = {"w": jnp.asarray(conv_to_hwio(sd[f"{name}.weight"]), dtype)}
        if bias and f"{name}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def dcv(name):
        return {"w": jnp.asarray(deconv_to_hwio(sd[f"{name}.weight"]), dtype),
                "b": jnp.asarray(sd[f"{name}.bias"], dtype)}

    head = {
        "norm": _ln(sd, f"{prefix}.norm", dtype),
        "projects": [cv(f"{prefix}.projects.{i}") for i in range(4)],
        "resize0": dcv(f"{prefix}.resize_layers.0"),
        "resize1": dcv(f"{prefix}.resize_layers.1"),
        "resize3": cv(f"{prefix}.resize_layers.3"),
        "layer_rn": [cv(f"{prefix}.scratch.layer{i}_rn", bias=False)
                     for i in (1, 2, 3, 4)],
        "out_conv1": cv(f"{prefix}.scratch.output_conv1"),
    }
    if not feature_only:
        head["out_conv2a"] = cv(f"{prefix}.scratch.output_conv2.0")
        head["out_conv2b"] = cv(f"{prefix}.scratch.output_conv2.2")
    for i in range(1, 5):
        rn = f"{prefix}.scratch.refinenet{i}"
        rcu = {}
        if f"{rn}.resConfUnit1.conv1.weight" in sd:
            rcu["rcu1_conv1"] = cv(f"{rn}.resConfUnit1.conv1")
            rcu["rcu1_conv2"] = cv(f"{rn}.resConfUnit1.conv2")
        else:  # refinenet4 has no residual unit 1
            f = head["layer_rn"][0]["w"].shape[-1]
            rcu["rcu1_conv1"] = {"w": jnp.zeros((3, 3, f, f), dtype),
                                 "b": jnp.zeros((f,), dtype)}
            rcu["rcu1_conv2"] = {"w": jnp.zeros((3, 3, f, f), dtype),
                                 "b": jnp.zeros((f,), dtype)}
        rcu["rcu2_conv1"] = cv(f"{rn}.resConfUnit2.conv1")
        rcu["rcu2_conv2"] = cv(f"{rn}.resConfUnit2.conv2")
        rcu["out"] = cv(f"{rn}.out_conv")
        head[f"refine{i}"] = rcu
    return head


def convert_track_head(sd: Dict[str, np.ndarray], depth: int = 6,
                       dtype=jnp.float32) -> dict:
    """Full track head (track_head.py:12-69): DPT feature extractor +
    BaseTrackerPredictor."""
    return {
        "feature_extractor": _convert_dpt(sd, "track_head.feature_extractor",
                                          dtype, feature_only=True),
        "tracker": convert_track_predictor(sd, depth,
                                           prefix="track_head.tracker.",
                                           dtype=dtype),
    }


def load_converted_vggt(path: str, cfg: VGGTConfig) -> dict:
    return convert_vggt(load_state_dict(path), cfg)
