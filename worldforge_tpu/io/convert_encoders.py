"""UMT5 + CLIP vision encoder checkpoint conversion (transformers layouts)."""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.torch_load import linear_w, load_state_dict
from worldforge_tpu.models.encoders.clip_vision import (CLIPVisionConfig,
                                                        clip_vision_hidden,
                                                        preprocess_clip)
from worldforge_tpu.models.encoders.umt5 import (UMT5Config, umt5_encode)


def convert_umt5(sd: Dict[str, np.ndarray], cfg: UMT5Config,
                 dtype=jnp.bfloat16) -> dict:
    """transformers UMT5EncoderModel state dict -> init_umt5 pytree.
    Names: encoder.block.N.layer.0 (self-attn), .layer.1 (ff)."""
    def d(name):
        return {"w": jnp.asarray(linear_w(sd, name), dtype)}

    layers = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}.layer"
        layers.append({
            "ln1": {"scale": jnp.asarray(
                sd[f"{b}.0.layer_norm.weight"], dtype)},
            "q": d(f"{b}.0.SelfAttention.q.weight"),
            "k": d(f"{b}.0.SelfAttention.k.weight"),
            "v": d(f"{b}.0.SelfAttention.v.weight"),
            "o": d(f"{b}.0.SelfAttention.o.weight"),
            "rel_bias": jnp.asarray(
                sd[f"{b}.0.SelfAttention.relative_attention_bias.weight"],
                dtype),
            "ln2": {"scale": jnp.asarray(
                sd[f"{b}.1.layer_norm.weight"], dtype)},
            "wi_0": d(f"{b}.1.DenseReluDense.wi_0.weight"),
            "wi_1": d(f"{b}.1.DenseReluDense.wi_1.weight"),
            "wo": d(f"{b}.1.DenseReluDense.wo.weight"),
        })
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    emb_key = "shared.weight" if "shared.weight" in sd else \
        "encoder.embed_tokens.weight"
    return {
        "embed": jnp.asarray(sd[emb_key], dtype),
        "blocks": blocks,
        "ln_f": {"scale": jnp.asarray(
            sd["encoder.final_layer_norm.weight"], dtype)},
    }


def load_umt5_encoder(model_dir: str, tokenizer_dir: str,
                      max_len: int = 512) -> Callable:
    """Returns encode_text(str) -> [1, max_len, d_model] (zero-padded, as
    WanModel expects, model.py:553-559)."""
    from transformers import AutoTokenizer
    cfg = UMT5Config.xxl()
    params = convert_umt5(load_state_dict(model_dir), cfg)
    tok = AutoTokenizer.from_pretrained(tokenizer_dir)

    def encode_text(text: str):
        ids = tok(text, max_length=max_len, truncation=True,
                  return_tensors="np")
        input_ids = np.zeros((1, max_len), np.int32)
        mask = np.zeros((1, max_len), np.int32)
        n = ids["input_ids"].shape[1]
        input_ids[0, :n] = ids["input_ids"][0]
        mask[0, :n] = ids["attention_mask"][0]
        return umt5_encode(params, cfg, jnp.asarray(input_ids),
                           jnp.asarray(mask))

    return encode_text


def convert_clip_vision(sd: Dict[str, np.ndarray], cfg: CLIPVisionConfig,
                        dtype=jnp.float32) -> dict:
    """transformers CLIPVisionModel state dict -> init_clip_vision pytree."""
    pre = "vision_model"

    def d(name):
        return {"w": jnp.asarray(linear_w(sd, f"{name}.weight"), dtype),
                "b": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def ln(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    layers = []
    for i in range(cfg.layers):
        b = f"{pre}.encoder.layers.{i}"
        layers.append({
            "ln1": ln(f"{b}.layer_norm1"),
            "q": d(f"{b}.self_attn.q_proj"),
            "k": d(f"{b}.self_attn.k_proj"),
            "v": d(f"{b}.self_attn.v_proj"),
            "o": d(f"{b}.self_attn.out_proj"),
            "ln2": ln(f"{b}.layer_norm2"),
            "fc1": d(f"{b}.mlp.fc1"),
            "fc2": d(f"{b}.mlp.fc2"),
        })
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    # patch conv [out, 3, 14, 14] -> dense [(ph pw c), out] matching the
    # (ph, pw, c) flatten in clip_vision_hidden
    pw = sd[f"{pre}.embeddings.patch_embedding.weight"]
    pw = np.transpose(pw, (2, 3, 1, 0)).reshape(-1, pw.shape[0])
    return {
        "patch": {"w": jnp.asarray(pw, dtype)},
        "cls": jnp.asarray(
            sd[f"{pre}.embeddings.class_embedding"], dtype
        ).reshape(1, 1, -1),
        "pos": jnp.asarray(
            sd[f"{pre}.embeddings.position_embedding.weight"], dtype
        )[None],
        "ln_pre": ln(f"{pre}.pre_layrnorm") if f"{pre}.pre_layrnorm.weight"
        in sd else ln(f"{pre}.pre_layernorm"),
        "blocks": blocks,
        "ln_post": ln(f"{pre}.post_layernorm"),
    }


def load_clip_vision_encoder(model_dir: str) -> Callable:
    """Returns encode_image(img [H,W,3] float [0,1]) -> [1, 257, 1280]
    penultimate hidden states (pipeline_wan_i2v_clean.py:207-211)."""
    cfg = CLIPVisionConfig.vit_h_14()
    params = convert_clip_vision(load_state_dict(model_dir), cfg)

    def encode_image(img: np.ndarray):
        px = preprocess_clip(img, cfg.image_size)
        return clip_vision_hidden(params, cfg, jnp.asarray(px))

    return encode_image
