"""LongCat-Video checkpoint conversion (longcat_video_dit.py param names)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.torch_load import (conv3d_to_patch_dense, linear_w,
                                          load_state_dict)
from worldforge_tpu.models.longcat.dit import LongCatDiTConfig
from worldforge_tpu.models.wan.vae import WanVAEConfig


def _dense(sd, name, dtype, bias=True):
    p = {"w": jnp.asarray(linear_w(sd, f"{name}.weight"), dtype)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _rms(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}


def _ln(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def convert_longcat_dit(sd: Dict[str, np.ndarray], cfg: LongCatDiTConfig,
                        dtype=jnp.bfloat16) -> dict:
    layers = []
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        layers.append({
            "adaln": _dense(sd, f"{b}.adaLN_modulation.1", jnp.float32),
            "qkv": _dense(sd, f"{b}.attn.qkv", dtype),
            "q_norm": _rms(sd, f"{b}.attn.q_norm", jnp.float32),
            "k_norm": _rms(sd, f"{b}.attn.k_norm", jnp.float32),
            "attn_proj": _dense(sd, f"{b}.attn.proj", dtype),
            "pre_crs_norm": _ln(sd, f"{b}.pre_crs_attn_norm", dtype),
            "x_q": _dense(sd, f"{b}.cross_attn.q_linear", dtype),
            "x_kv": _dense(sd, f"{b}.cross_attn.kv_linear", dtype),
            "x_q_norm": _rms(sd, f"{b}.cross_attn.q_norm", jnp.float32),
            "x_k_norm": _rms(sd, f"{b}.cross_attn.k_norm", jnp.float32),
            "x_proj": _dense(sd, f"{b}.cross_attn.proj", dtype),
            "w1": _dense(sd, f"{b}.ffn.w1", dtype, bias=False),
            "w3": _dense(sd, f"{b}.ffn.w3", dtype, bias=False),
            "w2": _dense(sd, f"{b}.ffn.w2", dtype, bias=False),
        })
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "x_embedder": {
            "w": jnp.asarray(conv3d_to_patch_dense(
                sd["x_embedder.proj.weight"]), dtype),
            "b": jnp.asarray(sd["x_embedder.proj.bias"], dtype)},
        "t_embedder": {
            "fc1": _dense(sd, "t_embedder.mlp.0", jnp.float32),
            "fc2": _dense(sd, "t_embedder.mlp.2", jnp.float32)},
        "y_embedder": {
            "fc1": _dense(sd, "y_embedder.y_proj.0", dtype),
            "fc2": _dense(sd, "y_embedder.y_proj.2", dtype)},
        "blocks": blocks,
        "final": {
            "adaln": _dense(sd, "final_layer.adaLN_modulation.1",
                            jnp.float32),
            "linear": _dense(sd, "final_layer.linear", dtype)},
    }


def convert_longcat_lora(sd: Dict[str, np.ndarray],
                         network_alpha: float = 64.0,
                         multiplier: float = 1.0) -> Dict[str, dict]:
    """LoRA safetensors (lora_utils naming) -> merge_lora adapter dict.
    Module path 'blocks.3.attn.qkv' maps to our 'blocks/.../qkv'... The
    stacked-blocks layout cannot address per-layer leaves by path, so
    adapters on blocks.* are returned keyed 'blocks.<i>.<sub>' and merged by
    merge_lora_stacked below."""
    out: Dict[str, dict] = {}
    downs = {k: v for k, v in sd.items() if k.endswith("lora_down.weight")}
    for dkey, down in downs.items():
        base = dkey[: -len(".lora_down.weight")]
        down = np.asarray(down)
        if f"{base}.lora_up.weight" in sd:
            up = np.asarray(sd[f"{base}.lora_up.weight"]).T   # [r, out]
            rank = down.shape[0]
        else:
            # n_seperate > 1: lora_up.blocks.N are per-output-chunk ups
            # (lora_utils.py:15-24); build the block-diagonal up so that
            # up @ down reproduces LoRAUPParallel(chunk(down(x)))
            blocks = []
            n = 0
            while f"{base}.lora_up.blocks.{n}.weight" in sd:
                blocks.append(np.asarray(
                    sd[f"{base}.lora_up.blocks.{n}.weight"]).T)
                n += 1
            rank = down.shape[0] // n
            od = blocks[0].shape[1]
            up = np.zeros((down.shape[0], od * n), down.dtype)
            for j, blk in enumerate(blocks):
                up[j * rank:(j + 1) * rank, j * od:(j + 1) * od] = blk
        # merge_lora divides alpha by the TOTAL down rank (n*r), so store
        # alpha such that alpha / (n*r) == the true per-block alpha/r scale
        total = down.shape[0]
        if f"{base}.alpha_scale" in sd:   # this repo's buffer (= alpha/dim)
            alpha = float(sd[f"{base}.alpha_scale"]) * total
        else:
            alpha = float(sd.get(f"{base}.alpha", network_alpha)) \
                * (total // rank)
        name = base.replace("lora___lorahyphen___", "").replace(
            "___lorahyphen___", ".")
        out[name] = {
            "down": jnp.asarray(np.ascontiguousarray(down.T), jnp.float32),
            "up": jnp.asarray(np.ascontiguousarray(up), jnp.float32),
            "alpha": alpha, "multiplier": multiplier,
        }
    return out


_TORCH_TO_TREE = {
    "attn.qkv": "qkv", "attn.proj": "attn_proj",
    "cross_attn.q_linear": "x_q", "cross_attn.kv_linear": "x_kv",
    "cross_attn.proj": "x_proj", "ffn.w1": "w1", "ffn.w2": "w2",
    "ffn.w3": "w3", "adaLN_modulation.1": "adaln",
}


def merge_lora_stacked(params: dict, lora: Dict[str, dict],
                       scale: float = 1.0) -> dict:
    """Merge LoRA adapters into the scan-stacked blocks pytree.
    Inference-equivalent of the reference's runtime forward patching
    (longcat_video_dit.py:197-270). Adapters without a matching block
    leaf (non-block paths, unmapped submodules) are reported, not
    silently dropped."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    blocks = dict(out["blocks"]) if isinstance(out["blocks"], dict) else \
        out["blocks"]
    skipped = []
    for name, ad in lora.items():
        if not name.startswith("blocks."):
            skipped.append(name)
            continue
        i = int(name.split(".")[1])
        sub = ".".join(name.split(".")[2:])
        key = _TORCH_TO_TREE.get(sub)
        if key is None or key not in blocks:
            skipped.append(name)
            continue
        down, up = ad["down"], ad["up"]
        alpha_scale = ad.get("alpha", down.shape[1]) / down.shape[1]
        delta = (down.astype(jnp.float32) @ up.astype(jnp.float32)
                 * ad.get("multiplier", 1.0) * alpha_scale * scale)
        w = blocks[key]["w"]
        blocks[key] = dict(blocks[key])
        blocks[key]["w"] = w.at[i].set(
            (w[i].astype(jnp.float32) + delta).astype(w.dtype))
    if skipped:
        # the reference's LoRANetwork prints "Cannot find module" per miss
        # (lora_utils.py); a silently partial merge would give wrong
        # distill outputs with no trace
        print(f"merge_lora_stacked: {len(skipped)} adapter(s) had no "
              f"matching block leaf and were NOT merged: {skipped[:8]}"
              + (" ..." if len(skipped) > 8 else ""))
    out["blocks"] = blocks
    return out


def load_converted_longcat(checkpoint_dir: str, use_distill: bool = False):
    import os
    from worldforge_tpu.io.convert_wan import convert_wan_vae
    from worldforge_tpu.io.convert_encoders import load_umt5_encoder
    from worldforge_tpu.pipelines.longcat import LongCatPipeline

    cfg = LongCatDiTConfig.longcat_13b()
    sd = load_state_dict(os.path.join(checkpoint_dir, "dit"))
    params = convert_longcat_dit(sd, cfg)
    if use_distill:
        lora_path = os.path.join(checkpoint_dir, "lora",
                                 "cfg_step_lora.safetensors")
        if os.path.exists(lora_path):
            lora = convert_longcat_lora(load_state_dict(lora_path))
            params = merge_lora_stacked(params, lora)
    vae_cfg = WanVAEConfig.wan_2_1()
    vae_params = convert_wan_vae(
        load_state_dict(os.path.join(checkpoint_dir, "vae")), vae_cfg)
    pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)

    encode = load_umt5_encoder(os.path.join(checkpoint_dir, "text_encoder"),
                               os.path.join(checkpoint_dir, "tokenizer"))

    def encode_text(text: str):
        emb = encode(text)
        mask = (jnp.abs(emb).sum(-1) > 0).astype(jnp.int32)
        return emb, mask

    return pipe, encode_text


def convert_avatar_dit(sd: Dict[str, np.ndarray], cfg,
                       dtype=jnp.bfloat16) -> dict:
    """Avatar DiT conversion: the base-block mapping of convert_longcat_dit
    plus the per-block audio pieces (audio_adaLN_modulation,
    pre_video/pre_audio cross-attn norms, SingleStreamAttention
    q_linear/kv_linear/q_norm/k_norm/proj —
    longcat_video_dit_avatar.py:52-96, avatar/attention.py:311-319) and the
    top-level AudioProjModel (avatar/blocks.py:33-37). ``cfg`` is an
    AvatarConfig."""
    params = convert_longcat_dit(sd, cfg.base, dtype)
    extras = []
    for i in range(cfg.base.depth):
        b = f"blocks.{i}"
        e = {
            "audio_adaln": _dense(sd, f"{b}.audio_adaLN_modulation.1",
                                  jnp.float32),
            "pre_video_norm": _ln(sd, f"{b}.pre_video_crs_attn_norm", dtype),
            "a_q": _dense(sd, f"{b}.audio_cross_attn.q_linear", dtype),
            "a_kv": _dense(sd, f"{b}.audio_cross_attn.kv_linear", dtype),
            "a_q_norm": _rms(sd, f"{b}.audio_cross_attn.q_norm", jnp.float32),
            "a_k_norm": _rms(sd, f"{b}.audio_cross_attn.k_norm", jnp.float32),
            "a_proj": _dense(sd, f"{b}.audio_cross_attn.proj", dtype),
        }
        if cfg.audio_prenorm:
            e["pre_audio_norm"] = _ln(sd, f"{b}.pre_audio_crs_attn_norm",
                                      dtype)
        else:
            # reference uses nn.Identity() (no params, norm not applied —
            # our forward gates on cfg.audio_prenorm); keep the init-time
            # tree shape with an inert LN
            e["pre_audio_norm"] = {
                "scale": jnp.ones((cfg.output_dim,), dtype),
                "bias": jnp.zeros((cfg.output_dim,), dtype)}
        extras.append(e)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *extras)
    params["blocks"] = dict(params["blocks"], **stacked)
    params["audio_proj"] = {
        "proj1": _dense(sd, "audio_proj.proj1", jnp.float32),
        "proj1_vf": _dense(sd, "audio_proj.proj1_vf", jnp.float32),
        "proj2": _dense(sd, "audio_proj.proj2", jnp.float32),
        "proj3": _dense(sd, "audio_proj.proj3", jnp.float32),
        "norm": _ln(sd, "audio_proj.norm", jnp.float32),
    }
    return params
