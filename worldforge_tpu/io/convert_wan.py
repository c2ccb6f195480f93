"""Wan2.1 checkpoint conversion: torch state dicts -> our param pytrees.

Supports the vendored WanModel layout (wan/modules/model.py param names —
the official Wan2.1 release format) and the Wan causal VAE
(wan/modules/vae.py, vae_step_411000.pth-style names). The diffusers
WanTransformer3DModel layout maps through `DIFFUSERS_ALIASES`.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.torch_load import (conv3d_to_patch_dense, conv_to_hwio,
                                          linear_w, load_state_dict)
from worldforge_tpu.models.wan.dit import WanDiTConfig
from worldforge_tpu.models.wan.vae import WanVAEConfig


def _dense(sd, name, dtype, bias=True):
    p = {"w": jnp.asarray(linear_w(sd, f"{name}.weight"), dtype)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _ln(sd, name, dtype):
    p = {}
    if f"{name}.weight" in sd:
        p["scale"] = jnp.asarray(sd[f"{name}.weight"], dtype)
        p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _rms(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}


def convert_wan_dit(sd: Dict[str, np.ndarray], cfg: WanDiTConfig,
                    dtype=jnp.bfloat16) -> dict:
    """Vendored WanModel state dict -> init_wan_dit-shaped pytree."""
    import jax

    def attn(prefix, img_branch):
        p = {
            "q": _dense(sd, f"{prefix}.q", dtype),
            "k": _dense(sd, f"{prefix}.k", dtype),
            "v": _dense(sd, f"{prefix}.v", dtype),
            "o": _dense(sd, f"{prefix}.o", dtype),
            "norm_q": _rms(sd, f"{prefix}.norm_q", dtype),
            "norm_k": _rms(sd, f"{prefix}.norm_k", dtype),
        }
        if img_branch:
            p["k_img"] = _dense(sd, f"{prefix}.k_img", dtype)
            p["v_img"] = _dense(sd, f"{prefix}.v_img", dtype)
            p["norm_k_img"] = _rms(sd, f"{prefix}.norm_k_img", dtype)
        return p

    layers = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        layers.append({
            "self_attn": attn(f"{b}.self_attn", False),
            "cross_attn": attn(f"{b}.cross_attn",
                               cfg.model_type in ("i2v", "flf2v")),
            "norm3": _ln(sd, f"{b}.norm3", dtype),
            "ffn": {"fc1": _dense(sd, f"{b}.ffn.0", dtype),
                    "fc2": _dense(sd, f"{b}.ffn.2", dtype)},
            "modulation": jnp.asarray(sd[f"{b}.modulation"], jnp.float32),
        })
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    params = {
        "patch_embedding": {
            "w": jnp.asarray(conv3d_to_patch_dense(
                sd["patch_embedding.weight"]), dtype),
            "b": jnp.asarray(sd["patch_embedding.bias"], dtype),
        },
        "text_embedding": {"fc1": _dense(sd, "text_embedding.0", dtype),
                           "fc2": _dense(sd, "text_embedding.2", dtype)},
        "time_embedding": {
            "fc1": _dense(sd, "time_embedding.0", jnp.float32),
            "fc2": _dense(sd, "time_embedding.2", jnp.float32)},
        "time_projection": _dense(sd, "time_projection.1", jnp.float32),
        "blocks": blocks,
        "head": {
            "head": _dense(sd, "head.head", dtype),
            "modulation": jnp.asarray(sd["head.modulation"], jnp.float32),
        },
    }
    if cfg.model_type in ("i2v", "flf2v"):
        params["img_emb"] = {
            "norm_in": _ln(sd, "img_emb.proj.0", dtype),
            "fc1": _dense(sd, "img_emb.proj.1", dtype),
            "fc2": _dense(sd, "img_emb.proj.3", dtype),
            "norm_out": _ln(sd, "img_emb.proj.4", dtype),
        }
        if "img_emb.emb_pos" in sd:   # flf2v (model.py:359-367)
            params["img_emb"]["emb_pos"] = jnp.asarray(
                sd["img_emb.emb_pos"], dtype)
    return params


def convert_vace(sd: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16) -> dict:
    """VaceWanModel state dict (wan/modules/vace_model.py:65-135) ->
    models/wan/vace.py pytree: base WanModel trunk + vace_blocks (block 0
    has before_proj; all have after_proj) + vace_patch_embedding."""
    import jax

    params = convert_wan_dit(sd, cfg.base, dtype)

    def attn(prefix):
        return {"q": _dense(sd, f"{prefix}.q", dtype),
                "k": _dense(sd, f"{prefix}.k", dtype),
                "v": _dense(sd, f"{prefix}.v", dtype),
                "o": _dense(sd, f"{prefix}.o", dtype),
                "norm_q": _rms(sd, f"{prefix}.norm_q", dtype),
                "norm_k": _rms(sd, f"{prefix}.norm_k", dtype)}

    vace_blocks = []
    for n in range(len(cfg.layers)):
        b = f"vace_blocks.{n}"
        blk = {
            "self_attn": attn(f"{b}.self_attn"),
            "cross_attn": attn(f"{b}.cross_attn"),
            "norm3": _ln(sd, f"{b}.norm3", dtype),
            "ffn": {"fc1": _dense(sd, f"{b}.ffn.0", dtype),
                    "fc2": _dense(sd, f"{b}.ffn.2", dtype)},
            "modulation": jnp.asarray(sd[f"{b}.modulation"], jnp.float32),
            "after_proj": _dense(sd, f"{b}.after_proj", dtype),
        }
        if n == 0:
            blk["before_proj"] = _dense(sd, f"{b}.before_proj", dtype)
        vace_blocks.append(blk)
    params["vace_blocks"] = vace_blocks
    params["vace_patch_embedding"] = {
        "w": jnp.asarray(conv3d_to_patch_dense(
            sd["vace_patch_embedding.weight"]), dtype),
        "b": jnp.asarray(sd["vace_patch_embedding.bias"], dtype),
    }
    return params


# ------------------------------------------------------------------ VAE


def _causal_conv(sd, name, dtype):
    return {"w": jnp.asarray(conv_to_hwio(sd[f"{name}.weight"]), dtype),
            "b": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _vae_rms(sd, name, dtype):
    g = sd[f"{name}.gamma"]
    return {"gamma": jnp.asarray(g.reshape(-1), dtype)}


def convert_wan_vae(sd: Dict[str, np.ndarray],
                    cfg: WanVAEConfig = WanVAEConfig(),
                    dtype=jnp.float32) -> dict:
    """wan/modules/vae.py WanVAE_ state dict -> init_wan_vae pytree.

    The torch module flattens residual/attention/resample layers into
    nn.Sequential indices; this walks the same ordering."""
    d = cfg.dim
    dims = [d * u for u in (1,) + tuple(cfg.dim_mult)]

    def res_block(prefix):
        p = {
            "norm1": _vae_rms(sd, f"{prefix}.residual.0", dtype),
            "conv1": _causal_conv(sd, f"{prefix}.residual.2", dtype),
            "norm2": _vae_rms(sd, f"{prefix}.residual.3", dtype),
            "conv2": _causal_conv(sd, f"{prefix}.residual.6", dtype),
        }
        if f"{prefix}.shortcut.weight" in sd:
            p["shortcut"] = _causal_conv(sd, f"{prefix}.shortcut", dtype)
        return p

    def attn_block(prefix):
        return {
            "norm": _vae_rms(sd, f"{prefix}.norm", dtype),
            "qkv": {"w": jnp.asarray(conv_to_hwio(
                sd[f"{prefix}.to_qkv.weight"]), dtype),
                "b": jnp.asarray(sd[f"{prefix}.to_qkv.bias"], dtype)},
            "proj": {"w": jnp.asarray(conv_to_hwio(
                sd[f"{prefix}.proj.weight"]), dtype),
                "b": jnp.asarray(sd[f"{prefix}.proj.bias"], dtype)},
        }

    # ---- encoder: downsamples Sequential = [res x2 (+down)] per stage
    enc = {"conv_in": _causal_conv(sd, "encoder.conv1", dtype)}
    stages = []
    seq = 0
    for i in range(len(cfg.dim_mult)):
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(res_block(f"encoder.downsamples.{seq}"))
            seq += 1
        st = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            pre = f"encoder.downsamples.{seq}"
            down = {"conv": {"w": jnp.asarray(conv_to_hwio(
                sd[f"{pre}.resample.1.weight"]), dtype),
                "b": jnp.asarray(sd[f"{pre}.resample.1.bias"], dtype)}}
            if f"{pre}.time_conv.weight" in sd:
                down["time_conv"] = _causal_conv(sd, f"{pre}.time_conv",
                                                 dtype)
            st["down"] = down
            seq += 1
        stages.append(st)
    enc["stages"] = stages
    enc["mid"] = {"res1": res_block("encoder.middle.0"),
                  "attn": attn_block("encoder.middle.1"),
                  "res2": res_block("encoder.middle.2")}
    enc["norm_out"] = _vae_rms(sd, "encoder.head.0", dtype)
    enc["conv_out"] = _causal_conv(sd, "encoder.head.2", dtype)

    # ---- decoder: upsamples = [res x3 (+up)] per stage
    dec = {"conv_in": _causal_conv(sd, "decoder.conv1", dtype)}
    dec["mid"] = {"res1": res_block("decoder.middle.0"),
                  "attn": attn_block("decoder.middle.1"),
                  "res2": res_block("decoder.middle.2")}
    stages = []
    seq = 0
    for i in range(len(cfg.dim_mult)):
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(res_block(f"decoder.upsamples.{seq}"))
            seq += 1
        st = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            pre = f"decoder.upsamples.{seq}"
            up = {"conv": {"w": jnp.asarray(conv_to_hwio(
                sd[f"{pre}.resample.1.weight"]), dtype),
                "b": jnp.asarray(sd[f"{pre}.resample.1.bias"], dtype)}}
            if f"{pre}.time_conv.weight" in sd:
                up["time_conv"] = _causal_conv(sd, f"{pre}.time_conv", dtype)
            st["up"] = up
            seq += 1
        stages.append(st)
    dec["stages"] = stages
    dec["norm_out"] = _vae_rms(sd, "decoder.head.0", dtype)
    dec["conv_out"] = _causal_conv(sd, "decoder.head.2", dtype)

    return {"encoder": enc, "conv1": _causal_conv(sd, "conv1", dtype),
            "conv2": _causal_conv(sd, "conv2", dtype), "decoder": dec}


def load_converted_wan(models_dir: str, variant: str = "480p"):
    """Assemble the full Wan pipeline from a models directory holding the
    converted/original checkpoints (DiT + VAE + UMT5 + CLIP)."""
    import os
    import jax
    from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline

    cfg = WanDiTConfig.wan_14b_i2v()
    dit_sd = load_state_dict(os.path.join(models_dir, "transformer"))
    dit_params = convert_wan_dit(dit_sd, cfg)
    vae_cfg = WanVAEConfig.wan_2_1()
    vae_sd = load_state_dict(os.path.join(models_dir, "vae"))
    vae_params = convert_wan_vae(vae_sd, vae_cfg)
    pipe = WanI2VPipeline(dit_params=dit_params, dit_cfg=cfg,
                          vae_params=vae_params, vae_cfg=vae_cfg)

    from worldforge_tpu.io.convert_encoders import (load_umt5_encoder,
                                                    load_clip_vision_encoder)
    encode_text = load_umt5_encoder(os.path.join(models_dir, "text_encoder"),
                                    os.path.join(models_dir, "tokenizer"))
    encode_image = load_clip_vision_encoder(
        os.path.join(models_dir, "image_encoder"))
    return pipe, encode_text, encode_image
