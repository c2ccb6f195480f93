"""CLIP ViT-H/14 vision encoder (i2v image conditioning), JAX.

Behavioral reference: the Wan pipeline encodes the first frame with
transformers' CLIPVisionModel and takes the PENULTIMATE hidden state
(hidden_states[-2]) as 257 tokens x 1280
(pipeline_wan_i2v_clean.py:207-211; vendored torch variant at
wan/modules/clip.py:542). Standard pre-LN CLIP ViT: conv patchify (14x14),
class token, learned position embeddings, pre-layernorm blocks with
quick-GELU MLPs.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.ops.attention import attention

# CLIP normalization constants (image preprocessing, clip.py reference)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    mlp_ratio: float = 4.0
    eps: float = 1e-5

    @property
    def tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1  # 257

    @classmethod
    def vit_h_14(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=28, patch_size=14, width=32, layers=2, heads=2)


def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, cfg.layers + 4)
    d = cfg.width
    pdim = cfg.patch_size * cfg.patch_size * 3
    layers = []
    for i in range(cfg.layers):
        lk = P.split_keys(ks[i], 6)
        layers.append({
            "ln1": P.layer_norm_init(d, dtype=dtype),
            "q": P.dense_init(lk[0], d, d, dtype=dtype),
            "k": P.dense_init(lk[1], d, d, dtype=dtype),
            "v": P.dense_init(lk[2], d, d, dtype=dtype),
            "o": P.dense_init(lk[3], d, d, dtype=dtype),
            "ln2": P.layer_norm_init(d, dtype=dtype),
            "fc1": P.dense_init(lk[4], d, int(d * cfg.mlp_ratio), dtype=dtype),
            "fc2": P.dense_init(lk[5], int(d * cfg.mlp_ratio), d, dtype=dtype),
        })
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    n_tok = cfg.tokens
    return {
        "patch": P.dense_init(ks[-1], pdim, d, bias=False, dtype=dtype),
        "cls": jnp.zeros((1, 1, d), dtype),
        "pos": (0.02 * jax.random.normal(ks[-2], (1, n_tok, d))).astype(dtype),
        "ln_pre": P.layer_norm_init(d, dtype=dtype),
        "blocks": blocks,
        "ln_post": P.layer_norm_init(d, dtype=dtype),
    }


def preprocess_clip(image: np.ndarray, size: int = 224) -> np.ndarray:
    """[H,W,3] float in [0,1] -> normalized [1,3,size,size]."""
    from PIL import Image as PILImage
    img = PILImage.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
    img = img.resize((size, size), PILImage.BICUBIC)
    arr = np.asarray(img).astype(np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)[None]


def clip_vision_hidden(params, cfg: CLIPVisionConfig, pixels: jnp.ndarray,
                       penultimate: bool = True) -> jnp.ndarray:
    """pixels [B,3,S,S] normalized -> hidden states [B, 257, width].

    penultimate=True returns the input to the LAST transformer block
    (== transformers hidden_states[-2]), matching encode_image."""
    b = pixels.shape[0]
    ps = cfg.patch_size
    g = cfg.image_size // ps
    x = pixels.transpose(0, 2, 3, 1)  # [B,S,S,3]
    x = x.reshape(b, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, g * g, ps * ps * 3)
    # conv patchify == dense over (ph, pw, c) with matching flatten order
    x = P.dense(params["patch"], x.astype(jnp.float32))
    cls = jnp.broadcast_to(params["cls"].astype(jnp.float32), (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"].astype(jnp.float32)
    x = P.layer_norm(params["ln_pre"], x, eps=cfg.eps)

    h = cfg.heads

    def block(x, p):
        x_in = x                           # emitted: the block INPUT
        y = P.layer_norm(p["ln1"], x, eps=cfg.eps)
        q = P.dense(p["q"], y).reshape(b, -1, h, cfg.width // h)
        k = P.dense(p["k"], y).reshape(b, -1, h, cfg.width // h)
        v = P.dense(p["v"], y).reshape(b, -1, h, cfg.width // h)
        o = attention(q, k, v).reshape(b, -1, cfg.width)
        x = x + P.dense(p["o"], o)
        y = P.layer_norm(p["ln2"], x, eps=cfg.eps)
        y = P.dense(p["fc1"], y)
        y = y * jax.nn.sigmoid(1.702 * y)  # quick-GELU (CLIP)
        return x + P.dense(p["fc2"], y), x_in

    x, inputs = jax.lax.scan(block, x, params["blocks"])
    if penultimate:
        # input of the last block == hidden_states[-2]
        return inputs[-1]
    return x


def init_clip_projection(key, cfg: CLIPVisionConfig,
                         projection_dim: int = 1024,
                         dtype=jnp.float32) -> dict:
    return {"proj": P.dense_init(key, cfg.width, projection_dim, bias=False,
                                 dtype=dtype)}


def clip_vision_image_embeds(params, proj_params, cfg: CLIPVisionConfig,
                             pixels: jnp.ndarray) -> jnp.ndarray:
    """CLIPVisionModelWithProjection image_embeds: post-LN CLS token through
    the visual projection (SVD/DepthCrafter conditioning,
    depth_crafter_ppl.py:20-48). [B,3,S,S] -> [B, projection_dim]."""
    h = clip_vision_hidden(params, cfg, pixels, penultimate=False)
    cls_tok = P.layer_norm(params["ln_post"], h[:, 0], eps=cfg.eps)
    return P.dense(proj_params["proj"], cls_tok)
