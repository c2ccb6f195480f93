"""SuperPoint keypoint detector + descriptor (JAX).

Behavioral reference: the `lightglue` pip package's SuperPoint wrapper the
reference installs for keypoint extraction
(vggt/vggt/dependency/vggsfm_utils.py:15, 189-253) — the classic MagicLeap
architecture:
  - VGG-style shared encoder: (64,64) pool (64,64) pool (128,128) pool
    (128,128), 3x3 convs + ReLU, three 2x2 max-pools (stride 8 total)
  - detector head: 3x3 conv 256 -> 1x1 conv 65, softmax over 65 (64 cells
    + dustbin), drop dustbin, 8x8 pixel-shuffle to a full-res heatmap
  - descriptor head: 3x3 conv 256 -> 1x1 conv 256, L2-normalized,
    bilinearly sampled at keypoint locations
  - simple NMS: iterated 3x3 max-pool suppression; score threshold; top-k

TPU-first: fixed `max_num_keypoints` keeps shapes static under jit — the
detector returns exactly K keypoints padded with score -1 entries instead
of a dynamic list. Weight layout converts from the pip package's
state_dict (convNx names).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    channels: Tuple[int, ...] = (64, 64, 64, 64, 128, 128, 128, 128)
    descriptor_dim: int = 256
    nms_radius: int = 4
    detection_threshold: float = 0.005
    max_num_keypoints: int = 2048

    @classmethod
    def tiny(cls) -> "SuperPointConfig":
        return cls(channels=(8, 8, 8, 8, 16, 16, 16, 16), descriptor_dim=32,
                   max_num_keypoints=32)


def _conv_init(key, cin, cout, k, dtype):
    return P.conv_init(key, cin, cout, (k, k), dtype=dtype)


def init_superpoint(key, cfg: SuperPointConfig, dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 12))
    c = cfg.channels
    return {
        "conv1a": _conv_init(next(ks), 1, c[0], 3, dtype),
        "conv1b": _conv_init(next(ks), c[0], c[1], 3, dtype),
        "conv2a": _conv_init(next(ks), c[1], c[2], 3, dtype),
        "conv2b": _conv_init(next(ks), c[2], c[3], 3, dtype),
        "conv3a": _conv_init(next(ks), c[3], c[4], 3, dtype),
        "conv3b": _conv_init(next(ks), c[4], c[5], 3, dtype),
        "conv4a": _conv_init(next(ks), c[5], c[6], 3, dtype),
        "conv4b": _conv_init(next(ks), c[6], c[7], 3, dtype),
        "convPa": _conv_init(next(ks), c[7], 256, 3, dtype),
        "convPb": _conv_init(next(ks), 256, 65, 1, dtype),
        "convDa": _conv_init(next(ks), c[7], 256, 3, dtype),
        "convDb": _conv_init(next(ks), 256, cfg.descriptor_dim, 1, dtype),
    }


def _conv(p, x, relu=True):
    y = P.conv(p, x, stride=1, padding="SAME")
    return jax.nn.relu(y) if relu else y


def _pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Iterated max-pool suppression (lightglue SuperPoint semantics).
    scores [B, H, W]."""
    k = 2 * radius + 1

    def maxpool(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, k, k), (1, 1, 1), "SAME")

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(2):
        supp = maxpool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp, zeros, scores)
        new_max = supp_scores == maxpool(supp_scores)
        max_mask = max_mask | (new_max & (~supp))
    return jnp.where(max_mask, scores, zeros)


def superpoint_forward(params, cfg: SuperPointConfig, image: jnp.ndarray
                       ) -> Dict[str, jnp.ndarray]:
    """image [B, H, W, 1] grayscale in [0,1]; H, W multiples of 8.
    Returns keypoints [B, K, 2] (x, y; padded entries are (-1, -1)),
    scores [B, K] (padding -1) and descriptors [B, K, D]."""
    b, hh, ww, _ = image.shape
    x = _conv(params["conv1a"], image)
    x = _pool2(_conv(params["conv1b"], x))
    x = _conv(params["conv2a"], x)
    x = _pool2(_conv(params["conv2b"], x))
    x = _conv(params["conv3a"], x)
    x = _pool2(_conv(params["conv3b"], x))
    x = _conv(params["conv4a"], x)
    feat = _conv(params["conv4b"], x)                     # [B, H/8, W/8, C]

    # detector: 65-way softmax, drop dustbin, 8x8 unshuffle
    det = _conv(params["convPb"], _conv(params["convPa"], feat), relu=False)
    det = jax.nn.softmax(det, axis=-1)[..., :64]
    gh, gw = det.shape[1:3]
    heat = det.reshape(b, gh, gw, 8, 8).transpose(0, 1, 3, 2, 4)
    heat = heat.reshape(b, gh * 8, gw * 8)                # [B, H, W]

    heat = simple_nms(heat, cfg.nms_radius)
    # border removal: canonical SuperPoint drops keypoints within 4 px of
    # the image edge after NMS (lightglue / HF modeling_superpoint.py
    # border_removal_distance=4)
    bd = 4
    border = jnp.zeros((gh * 8, gw * 8), bool)
    border = border.at[bd:gh * 8 - bd, bd:gw * 8 - bd].set(True)
    heat = jnp.where(border[None], heat, 0.0)
    # static top-k with threshold masking
    flat = heat.reshape(b, -1)
    flat = jnp.where(flat > cfg.detection_threshold, flat, -1.0)
    k = min(cfg.max_num_keypoints, flat.shape[1])
    scores, idx = jax.lax.top_k(flat, k)
    ys = (idx // (gw * 8)).astype(jnp.float32)
    xs = (idx % (gw * 8)).astype(jnp.float32)
    valid = scores > 0
    kpts = jnp.where(valid[..., None],
                     jnp.stack([xs, ys], axis=-1), -1.0)  # [B, K, 2]

    # descriptors: L2-normalized coarse map sampled bilinearly at keypoints
    desc = _conv(params["convDb"], _conv(params["convDa"], feat),
                 relu=False)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    from worldforge_tpu.models.vggt.track import bilinear_sample
    # keypoint pixel -> coarse grid coords (align to cell centers, stride 8)
    cpts = (jnp.stack([xs, ys], axis=-1) - 3.5) / 8.0
    d = bilinear_sample(desc, cpts, padding="border")     # [B, K, D]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    d = jnp.where(valid[..., None], d, 0.0)
    return {"keypoints": kpts, "scores": jnp.where(valid, scores, -1.0),
            "descriptors": d}


def convert_superpoint(sd: Dict[str, np.ndarray], cfg: SuperPointConfig,
                       dtype=jnp.float32) -> dict:
    """lightglue/magicleap state_dict (convNx.weight [out,in,k,k]) ->
    pytree."""
    out = {}
    for name in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"):
        w = np.transpose(np.asarray(sd[f"{name}.weight"]), (2, 3, 1, 0))
        out[name] = {"w": jnp.asarray(w, dtype),
                     "b": jnp.asarray(sd[f"{name}.bias"], dtype)}
    return out
