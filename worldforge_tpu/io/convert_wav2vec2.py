"""Wav2Vec2 checkpoint conversion (HF torch state dict -> JAX pytree).

Reference loading path: longcat_video/audio_process/wav2vec2.py:38-71
(Wav2Vec2ModelWrapper loads an HF Wav2Vec2Model with a weight-normed
positional conv, prefix-stripped)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.models.encoders.wav2vec2 import Wav2Vec2Config


def _dense(sd, name, dtype):
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _ln(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _conv1d_w(w):  # torch [out, in/groups, k] -> [k, in/groups, out]
    return np.transpose(np.asarray(w), (2, 1, 0))


def _weight_norm_conv(sd, name):
    """Resolve weight-normed conv (dim=2 per the reference init hack —
    norm over all axes except the kernel axis)."""
    for gk, vk in ((f"{name}.weight_g", f"{name}.weight_v"),
                   (f"{name}.parametrizations.weight.original0",
                    f"{name}.parametrizations.weight.original1")):
        if gk in sd:
            g = np.asarray(sd[gk], np.float64)
            v = np.asarray(sd[vk], np.float64)
            norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
            return (g * v / norm).astype(np.float32)
    return np.asarray(sd[f"{name}.weight"])


def convert_wav2vec2(sd: Dict[str, np.ndarray], cfg: Wav2Vec2Config,
                     prefix: str = "", dtype=jnp.float32) -> dict:
    fe = f"{prefix}feature_extractor.conv_layers"
    convs = []
    for i in range(len(cfg.conv_dim)):
        layer = {"conv": {"w": jnp.asarray(
            _conv1d_w(sd[f"{fe}.{i}.conv.weight"]), dtype)}}
        if f"{fe}.{i}.conv.bias" in sd:
            layer["conv"]["b"] = jnp.asarray(sd[f"{fe}.{i}.conv.bias"], dtype)
        if i == 0:
            layer["norm"] = _ln(sd, f"{fe}.0.layer_norm", dtype)
        convs.append(layer)

    enc = f"{prefix}encoder"
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{enc}.layers.{i}"
        layers.append({
            "q": _dense(sd, f"{lp}.attention.q_proj", dtype),
            "k": _dense(sd, f"{lp}.attention.k_proj", dtype),
            "v": _dense(sd, f"{lp}.attention.v_proj", dtype),
            "o": _dense(sd, f"{lp}.attention.out_proj", dtype),
            "ln": _ln(sd, f"{lp}.layer_norm", dtype),
            "ff1": _dense(sd, f"{lp}.feed_forward.intermediate_dense", dtype),
            "ff2": _dense(sd, f"{lp}.feed_forward.output_dense", dtype),
            "final_ln": _ln(sd, f"{lp}.final_layer_norm", dtype),
        })

    pos_w = _weight_norm_conv(sd, f"{enc}.pos_conv_embed.conv")
    return {
        "convs": convs,
        "fp_norm": _ln(sd, f"{prefix}feature_projection.layer_norm", dtype),
        "fp_proj": _dense(sd, f"{prefix}feature_projection.projection",
                          dtype),
        "pos_conv": {
            "w": jnp.asarray(_conv1d_w(pos_w), dtype),
            "b": jnp.asarray(sd[f"{enc}.pos_conv_embed.conv.bias"], dtype)},
        "enc_norm": _ln(sd, f"{enc}.layer_norm", dtype),
        "layers": layers,
    }
