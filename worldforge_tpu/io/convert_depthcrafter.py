"""DepthCrafter (SVD UNet + temporal VAE) checkpoint conversion from the
diffusers state-dict layout (tencent/DepthCrafter + stabilityai SVD VAE)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.torch_load import (StrictStateDict, conv_to_hwio,
                                          linear_w, load_state_dict)
from worldforge_tpu.models.depthcrafter.unet import SVDUNetConfig
from worldforge_tpu.models.depthcrafter.vae import SVDVAEConfig


_SVD_CTX = ("expected the diffusers layout frozen in "
            "tests/fixtures/svd_unet_manifest.json - regenerate with "
            "tests/test_svd_manifest.py if the upstream layout moved")


def _d(sd, name, dtype, bias=True):
    p = {"w": jnp.asarray(linear_w(sd, f"{name}.weight"), dtype)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _c(sd, name, dtype):
    return {"w": jnp.asarray(conv_to_hwio(sd[f"{name}.weight"]), dtype),
            "b": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _gn(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _res2d_c(sd, pre, dtype):
    p = {"norm1": _gn(sd, f"{pre}.norm1", dtype),
         "conv1": _c(sd, f"{pre}.conv1", dtype),
         "norm2": _gn(sd, f"{pre}.norm2", dtype),
         "conv2": _c(sd, f"{pre}.conv2", dtype)}
    if f"{pre}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _d(sd, f"{pre}.time_emb_proj", dtype)
    if f"{pre}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _c(sd, f"{pre}.conv_shortcut", dtype)
    return p


def _st_res_c(sd, pre, dtype):
    return {
        "spatial_res_block": _res2d_c(sd, f"{pre}.spatial_res_block", dtype),
        "temporal_res_block": _res2d_c(sd, f"{pre}.temporal_res_block",
                                       dtype),
        "time_mixer": {"mix_factor": jnp.asarray(
            sd[f"{pre}.time_mixer.mix_factor"].reshape(-1), jnp.float32)},
    }


def _attn_c(sd, pre, dtype):
    return {"to_q": _d(sd, f"{pre}.to_q", dtype, bias=False),
            "to_k": _d(sd, f"{pre}.to_k", dtype, bias=False),
            "to_v": _d(sd, f"{pre}.to_v", dtype, bias=False),
            "to_out": _d(sd, f"{pre}.to_out.0", dtype)}


def _geglu_c(sd, pre, dtype):
    return {"proj": _d(sd, f"{pre}.net.0.proj", dtype),
            "out": _d(sd, f"{pre}.net.2", dtype)}


def _basic_c(sd, pre, dtype):
    return {"norm1": _gn(sd, f"{pre}.norm1", dtype),
            "attn1": _attn_c(sd, f"{pre}.attn1", dtype),
            "norm2": _gn(sd, f"{pre}.norm2", dtype),
            "attn2": _attn_c(sd, f"{pre}.attn2", dtype),
            "norm3": _gn(sd, f"{pre}.norm3", dtype),
            "ff": _geglu_c(sd, f"{pre}.ff", dtype)}


def _temporal_basic_c(sd, pre, dtype):
    return {"norm_in": _gn(sd, f"{pre}.norm_in", dtype),
            "ff_in": _geglu_c(sd, f"{pre}.ff_in", dtype),
            "norm1": _gn(sd, f"{pre}.norm1", dtype),
            "attn1": _attn_c(sd, f"{pre}.attn1", dtype),
            "norm2": _gn(sd, f"{pre}.norm2", dtype),
            "attn2": _attn_c(sd, f"{pre}.attn2", dtype),
            "norm3": _gn(sd, f"{pre}.norm3", dtype),
            "ff": _geglu_c(sd, f"{pre}.ff", dtype)}


def _st_transformer_c(sd, pre, layers, dtype):
    return {
        "norm": _gn(sd, f"{pre}.norm", dtype),
        "proj_in": _d(sd, f"{pre}.proj_in", dtype),
        "blocks": [_basic_c(sd, f"{pre}.transformer_blocks.{i}", dtype)
                   for i in range(layers)],
        "temporal_blocks": [
            _temporal_basic_c(sd, f"{pre}.temporal_transformer_blocks.{i}",
                              dtype) for i in range(layers)],
        "time_pos_embed": {
            "fc1": _d(sd, f"{pre}.time_pos_embed.linear_1", dtype),
            "fc2": _d(sd, f"{pre}.time_pos_embed.linear_2", dtype)},
        "time_mixer": {"mix_factor": jnp.asarray(
            sd[f"{pre}.time_mixer.mix_factor"].reshape(-1), jnp.float32)},
        "proj_out": _d(sd, f"{pre}.proj_out", dtype),
    }


def convert_svd_unet(sd: Dict[str, np.ndarray], cfg: SVDUNetConfig,
                     dtype=jnp.float32, strict: bool = True) -> dict:
    """strict: after conversion, fail loudly if the checkpoint carries keys
    the converter never consumed (a silent sign of a layout drift)."""
    sd = StrictStateDict(sd, _SVD_CTX)
    n = len(cfg.block_out_channels)
    params = {
        "conv_in": _c(sd, "conv_in", dtype),
        "time_embedding": {
            "fc1": _d(sd, "time_embedding.linear_1", dtype),
            "fc2": _d(sd, "time_embedding.linear_2", dtype)},
        "add_embedding": {
            "fc1": _d(sd, "add_embedding.linear_1", dtype),
            "fc2": _d(sd, "add_embedding.linear_2", dtype)},
        "down_blocks": [], "up_blocks": [],
        "conv_norm_out": _gn(sd, "conv_norm_out", dtype),
        "conv_out": _c(sd, "conv_out", dtype),
    }
    for i in range(n):
        pre = f"down_blocks.{i}"
        blk = {"resnets": [
            _st_res_c(sd, f"{pre}.resnets.{j}", dtype)
            for j in range(cfg.layers_per_block)], "attentions": []}
        if f"{pre}.attentions.0.proj_in.weight" in sd:
            blk["attentions"] = [
                _st_transformer_c(sd, f"{pre}.attentions.{j}",
                                  cfg.transformer_layers, dtype)
                for j in range(cfg.layers_per_block)]
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            blk["downsampler"] = _c(sd, f"{pre}.downsamplers.0.conv", dtype)
        params["down_blocks"].append(blk)

    params["mid_block"] = {
        "resnets": [_st_res_c(sd, f"mid_block.resnets.{j}", dtype)
                    for j in range(2)],
        "attentions": [_st_transformer_c(sd, "mid_block.attentions.0",
                                         cfg.transformer_layers, dtype)],
    }
    for i in range(n):
        pre = f"up_blocks.{i}"
        blk = {"resnets": [
            _st_res_c(sd, f"{pre}.resnets.{j}", dtype)
            for j in range(cfg.layers_per_block + 1)], "attentions": []}
        if f"{pre}.attentions.0.proj_in.weight" in sd:
            blk["attentions"] = [
                _st_transformer_c(sd, f"{pre}.attentions.{j}",
                                  cfg.transformer_layers, dtype)
                for j in range(cfg.layers_per_block + 1)]
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            blk["upsampler"] = _c(sd, f"{pre}.upsamplers.0.conv", dtype)
        params["up_blocks"].append(blk)
    if strict:
        unused = sorted(set(sd.sd) - sd.used)
        if unused:
            raise ValueError(
                f"SVD checkpoint layout mismatch: {len(unused)} keys were "
                f"never consumed (first 10: {unused[:10]})")
    return params


def convert_svd_vae(sd: Dict[str, np.ndarray], cfg: SVDVAEConfig,
                    dtype=jnp.float32, strict: bool = True) -> dict:
    """diffusers AutoencoderKLTemporalDecoder state dict -> init_svd_vae
    pytree. Encoder: standard SD names; decoder: temporal blocks.
    strict: fail loudly on unconsumed checkpoint keys."""
    sd = StrictStateDict(sd, _SVD_CTX)
    boc = cfg.block_out_channels
    enc = {"conv_in": _c(sd, "encoder.conv_in", dtype), "down": []}
    for i in range(len(boc)):
        pre = f"encoder.down_blocks.{i}"
        blk = {"resnets": [_res2d_c(sd, f"{pre}.resnets.{j}", dtype)
                           for j in range(cfg.layers_per_block)]}
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            blk["down"] = _c(sd, f"{pre}.downsamplers.0.conv", dtype)
        enc["down"].append(blk)
    mid = "encoder.mid_block"
    enc["mid"] = {
        "res1": _res2d_c(sd, f"{mid}.resnets.0", dtype),
        "attn_norm": _gn(sd, f"{mid}.attentions.0.group_norm", dtype),
        "attn": _attn_c(sd, f"{mid}.attentions.0", dtype),
        "res2": _res2d_c(sd, f"{mid}.resnets.1", dtype),
    }
    enc["norm_out"] = _gn(sd, "encoder.conv_norm_out", dtype)
    enc["conv_out"] = _c(sd, "encoder.conv_out", dtype)
    enc["quant_conv"] = _c(sd, "quant_conv", dtype)

    dec = {"conv_in": _c(sd, "decoder.conv_in", dtype), "up": []}
    dmid = "decoder.mid_block"
    dec["mid"] = {
        "res1": _st_res_c(sd, f"{dmid}.resnets.0", dtype),
        "attn_norm": _gn(sd, f"{dmid}.attentions.0.group_norm", dtype),
        "attn": _attn_c(sd, f"{dmid}.attentions.0", dtype),
        "res2": _st_res_c(sd, f"{dmid}.resnets.1", dtype),
    }
    for i in range(len(boc)):
        pre = f"decoder.up_blocks.{i}"
        blk = {"resnets": [_st_res_c(sd, f"{pre}.resnets.{j}", dtype)
                           for j in range(cfg.layers_per_block + 1)]}
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            blk["up"] = _c(sd, f"{pre}.upsamplers.0.conv", dtype)
        dec["up"].append(blk)
    dec["norm_out"] = _gn(sd, "decoder.conv_norm_out", dtype)
    dec["conv_out"] = _c(sd, "decoder.conv_out", dtype)
    dec["time_conv_out"] = _c(sd, "decoder.time_conv_out", dtype)
    if strict:
        unused = sorted(set(sd.sd) - sd.used)
        if unused:
            raise ValueError(
                f"SVD VAE checkpoint layout mismatch: {len(unused)} keys "
                f"never consumed (first 10: {unused[:10]})")
    return {"encoder": enc, "decoder": dec}


def load_converted_depthcrafter(checkpoint_dir: str):
    import os
    from worldforge_tpu.models.encoders.clip_vision import (
        CLIPVisionConfig, clip_vision_image_embeds, preprocess_clip)
    from worldforge_tpu.io.convert_encoders import convert_clip_vision
    from worldforge_tpu.io.torch_load import linear_w
    from worldforge_tpu.pipelines.depthcrafter import DepthCrafterPipeline
    import jax.numpy as _jnp
    import numpy as _np

    cfg = SVDUNetConfig.svd()
    unet = convert_svd_unet(
        load_state_dict(os.path.join(checkpoint_dir, "unet")), cfg)
    vae_cfg = SVDVAEConfig.svd()
    vae = convert_svd_vae(
        load_state_dict(os.path.join(checkpoint_dir, "vae")), vae_cfg)

    enc_dir = os.path.join(checkpoint_dir, "image_encoder")
    encode_frames = None
    if os.path.exists(enc_dir):
        clip_cfg = CLIPVisionConfig.vit_h_14()
        sd = load_state_dict(enc_dir)
        clip_params = convert_clip_vision(sd, clip_cfg)
        proj = {"proj": {"w": _jnp.asarray(
            linear_w(sd, "visual_projection.weight"), _jnp.float32)}}

        def encode_frames(frames):  # [T,3,H,W] in [-1,1]
            arr = _np.asarray((frames + 1.0) / 2.0).transpose(0, 2, 3, 1)
            px = _np.concatenate([preprocess_clip(f) for f in arr], axis=0)
            return clip_vision_image_embeds(clip_params, proj, clip_cfg,
                                            _jnp.asarray(px))

    return DepthCrafterPipeline(unet_params=unet, unet_cfg=cfg,
                                vae_params=vae, vae_cfg=vae_cfg,
                                encode_frames_clip=encode_frames)
