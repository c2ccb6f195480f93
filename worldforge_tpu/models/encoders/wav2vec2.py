"""Wav2Vec2-base audio encoder (for the LongCat avatar stack).

Behavioral reference: longcat_video/audio_process/wav2vec2.py:133-230
(Wav2Vec2Mode = HF Wav2Vec2Model with eager attention and a
linear-interpolation resample of the conv features to the video frame
count, torch_utils.py:26-29) and the HF base architecture it wraps:
  - 7-layer Conv1d feature extractor (dims 512, kernels 10/3/3/3/3/2/2,
    strides 5/2/2/2/2/2/2, GroupNorm after layer 0 only, GELU)
  - feature projection LayerNorm(512) -> Linear(512 -> 768)
  - grouped positional conv embedding (k=128, groups=16, weight-normed,
    same-pad trims one sample for even kernels) + LayerNorm
  - 12 post-LN transformer layers (12 heads, FFN 3072, GELU)

The avatar AudioProjModel consumes the STACK of the 12 encoder-layer
outputs per resampled frame ("blocks" axis, avatar/blocks.py:13), so
wav2vec2_forward returns [B, T, 12, 768].

TPU notes: audio encoding is a tiny preprocessing model; convs run as
lax.conv_general_dilated and attention as fp32 SDPA. All shapes static
per clip length.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    eps: float = 1e-5

    @classmethod
    def base(cls) -> "Wav2Vec2Config":
        return cls()

    @classmethod
    def tiny(cls) -> "Wav2Vec2Config":
        return cls(conv_dim=(8,) * 3, conv_kernel=(10, 3, 2),
                   conv_stride=(5, 2, 2), hidden_size=16, num_layers=2,
                   num_heads=2, intermediate_size=32,
                   num_conv_pos_embeddings=8,
                   num_conv_pos_embedding_groups=2)


# ------------------------------------------------------------------ init


def _conv1d_init(key, cin, cout, k, groups=1, bias=False, dtype=jnp.float32):
    w = jax.random.normal(key, (k, cin // groups, cout)) * (
        1.0 / math.sqrt(k * cin // groups))
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _conv1d(p, x, stride=1, padding="VALID", groups=1):
    """x [B, T, C] -> [B, T', C']."""
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHC", "HIO", "NHC"))
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), (stride,),
                                     padding, dimension_numbers=dn,
                                     feature_group_count=groups)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def init_wav2vec2(key, cfg: Wav2Vec2Config, dtype=jnp.float32) -> dict:
    nconv = len(cfg.conv_dim)
    ks = iter(P.split_keys(key, nconv + 6 * cfg.num_layers + 8))
    convs = []
    cin = 1
    for i, (co, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"conv": _conv1d_init(next(ks), cin, co, k)}
        if i == 0:
            layer["norm"] = P.group_norm_init(co, dtype=dtype)
        convs.append(layer)
        cin = co
    h = cfg.hidden_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "q": P.dense_init(next(ks), h, h, dtype=dtype),
            "k": P.dense_init(next(ks), h, h, dtype=dtype),
            "v": P.dense_init(next(ks), h, h, dtype=dtype),
            "o": P.dense_init(next(ks), h, h, dtype=dtype),
            "ln": P.layer_norm_init(h, dtype=dtype),
            "ff1": P.dense_init(next(ks), h, cfg.intermediate_size,
                                dtype=dtype),
            "ff2": P.dense_init(next(ks), cfg.intermediate_size, h,
                                dtype=dtype),
            "final_ln": P.layer_norm_init(h, dtype=dtype),
        })
    return {
        "convs": convs,
        "fp_norm": P.layer_norm_init(cfg.conv_dim[-1], dtype=dtype),
        "fp_proj": P.dense_init(next(ks), cfg.conv_dim[-1], h, dtype=dtype),
        "pos_conv": _conv1d_init(next(ks), h, h,
                                 cfg.num_conv_pos_embeddings,
                                 groups=cfg.num_conv_pos_embedding_groups,
                                 bias=True),
        "enc_norm": P.layer_norm_init(h, dtype=dtype),
        "layers": layers,
    }


# --------------------------------------------------------------- forward


def linear_interpolate(x: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """align_corners=True linear resample along axis 1
    (torch_utils.py:26-29). x [B, T, C]."""
    b, t, c = x.shape
    if t == seq_len:
        return x
    pos = jnp.linspace(0.0, t - 1.0, seq_len)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    i1 = jnp.clip(i0 + 1, 0, t - 1)
    w = (pos - i0.astype(pos.dtype))[None, :, None]
    return x[:, i0] * (1 - w) + x[:, i1] * w


def wav2vec2_features(params, cfg: Wav2Vec2Config,
                      audio: jnp.ndarray) -> jnp.ndarray:
    """Raw waveform [B, L] -> conv features [B, T_conv, 512]."""
    x = audio[..., None].astype(jnp.float32)   # [B, L, 1]
    for i, layer in enumerate(params["convs"]):
        x = _conv1d(layer["conv"], x, stride=cfg.conv_stride[i])
        if i == 0:
            x = P.group_norm(layer["norm"], x,
                             groups=cfg.conv_dim[0], eps=cfg.eps)
        x = jax.nn.gelu(x, approximate=False)
    return x


def wav2vec2_encode(params, cfg: Wav2Vec2Config,
                    feats: jnp.ndarray) -> jnp.ndarray:
    """Projected features -> stacked per-layer hidden states
    [B, T, num_layers, hidden]."""
    x = P.dense(params["fp_proj"],
                P.layer_norm(params["fp_norm"], feats, eps=cfg.eps))
    # positional conv embedding: same-pad k//2 both sides, trim 1 for even k
    k = cfg.num_conv_pos_embeddings
    xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (0, 0)))
    pos = _conv1d(params["pos_conv"], xp,
                  groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = P.layer_norm(params["enc_norm"], x, eps=cfg.eps)

    h = cfg.num_heads
    hd = cfg.hidden_size // h
    outs = []
    for layer in params["layers"]:
        q = P.dense(layer["q"], x).reshape(x.shape[0], -1, h, hd)
        kk = P.dense(layer["k"], x).reshape(x.shape[0], -1, h, hd)
        v = P.dense(layer["v"], x).reshape(x.shape[0], -1, h, hd)
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, kk) / math.sqrt(hd), axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(x.shape)
        x = P.layer_norm(layer["ln"], x + P.dense(layer["o"], o),
                         eps=cfg.eps)
        ff = P.dense(layer["ff2"],
                     jax.nn.gelu(P.dense(layer["ff1"], x),
                                 approximate=False))
        x = P.layer_norm(layer["final_ln"], x + ff, eps=cfg.eps)
        outs.append(x)
    return jnp.stack(outs, axis=2)             # [B, T, L, H]


def wav2vec2_forward(params, cfg: Wav2Vec2Config, audio: jnp.ndarray,
                     seq_len: int) -> jnp.ndarray:
    """Waveform [B, L] -> [B, seq_len, num_layers, hidden]: conv features
    linearly resampled to the video frame count, then encoded
    (wav2vec2.py:139-192)."""
    feats = wav2vec2_features(params, cfg, audio)
    feats = linear_interpolate(feats, seq_len)
    return wav2vec2_encode(params, cfg, feats)


def get_audio_windows(features: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """[B, T, S, C] per-frame stacked features -> sliding windows
    [B, T, window, S, C] with edge clamping (the avatar model's per-frame
    audio conditioning; window center = the frame itself)."""
    t = features.shape[1]
    mid = window // 2
    idx = np.clip(np.arange(t)[:, None] + np.arange(-mid, window - mid)[None],
                  0, t - 1)
    return features[:, idx]
