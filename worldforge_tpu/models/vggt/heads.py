"""VGGT heads: iterative camera pose head + DPT dense depth head.

Behavioral reference: /root/reference/vggt/vggt/heads/camera_head.py:19-149,
dpt_head.py:21-484, head_act.py, utils.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.models.vggt.vit import _vit_block_init, vit_block_forward


# ---------------------------------------------------------------- camera


@dataclasses.dataclass(frozen=True)
class CameraHeadConfig:
    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    layerscale_init: float = 0.01
    target_dim: int = 9  # absT(3) + quatR(4) + FoV(2)

    @classmethod
    def tiny(cls, dim_in=64) -> "CameraHeadConfig":
        return cls(dim_in=dim_in, trunk_depth=2, num_heads=2)


def init_camera_head(key, cfg: CameraHeadConfig, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, cfg.trunk_depth + 4)
    d = cfg.dim_in
    return {
        "trunk": [_vit_block_init(ks[i], d, cfg.num_heads, cfg.mlp_ratio,
                                  cfg.layerscale_init, dtype)
                  for i in range(cfg.trunk_depth)],
        "token_norm": P.layer_norm_init(d, dtype=dtype),
        "trunk_norm": P.layer_norm_init(d, dtype=dtype),
        "empty_pose": jnp.zeros((1, 1, cfg.target_dim), dtype),
        "embed_pose": P.dense_init(ks[-1], cfg.target_dim, d, dtype=dtype),
        "mod": P.dense_init(ks[-2], d, 3 * d, dtype=dtype),
        "branch_fc1": P.dense_init(ks[-3], d, d // 2, dtype=dtype),
        "branch_fc2": P.dense_init(ks[-4], d // 2, cfg.target_dim,
                                   dtype=dtype),
    }


def camera_head_forward(params, cfg: CameraHeadConfig,
                        camera_tokens: jnp.ndarray,
                        num_iterations: int = 4) -> jnp.ndarray:
    """camera_tokens [B, S, 2C] (token 0 of the last aggregator layer).
    Returns activated pose encodings [B, S, 9] (last iteration).
    trans/quat linear, fov relu (camera_head.py:73-140)."""
    x = P.layer_norm(params["token_norm"], camera_tokens.astype(jnp.float32),
                     eps=1e-5)
    b, s, d = x.shape
    pred = None
    for _ in range(num_iterations):
        inp = pred if pred is not None else jnp.broadcast_to(
            params["empty_pose"].astype(jnp.float32), (b, s, cfg.target_dim))
        mod_in = P.dense(params["embed_pose"], inp)
        mod = P.dense(params["mod"], jax.nn.silu(mod_in))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = P.layer_norm({}, x, eps=1e-6)
        h = gate * (h * (1 + scale) + shift) + x
        for blk in params["trunk"]:
            h = vit_block_forward(blk, h, cfg.num_heads, eps=1e-5)
        delta = P.dense(params["branch_fc2"], jax.nn.gelu(
            P.dense(params["branch_fc1"],
                    P.layer_norm(params["trunk_norm"], h, eps=1e-5)),
            approximate=False))
        pred = delta if pred is None else pred + delta
    t, quat, fov = pred[..., :3], pred[..., 3:7], pred[..., 7:]
    return jnp.concatenate([t, quat, jax.nn.relu(fov)], axis=-1)


# ---------------------------------------------------------------- DPT


@dataclasses.dataclass(frozen=True)
class DPTHeadConfig:
    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 2            # depth + conf
    activation: str = "exp"
    conf_activation: str = "expp1"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    pos_embed: bool = True
    feature_only: bool = False     # dpt_head.py:101-103 (track feature mode)
    down_ratio: int = 1            # dpt_head.py:231-236

    @classmethod
    def tiny(cls, dim_in=64) -> "DPTHeadConfig":
        return cls(dim_in=dim_in, features=16, out_channels=(8, 16, 32, 32))


def _conv2d_init(key, cin, cout, k, dtype, bias=True):
    return P.conv_init(key, cin, cout, (k, k), bias=bias, dtype=dtype)


def _conv2d(p, x, stride=1, padding="SAME"):
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype),
                                     (stride, stride), padding,
                                     dimension_numbers=dn)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _deconv2d(p, x, stride):
    """ConvTranspose2d kernel=stride (exact upsample)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_transpose(x, p["w"].astype(x.dtype), (stride, stride),
                               "VALID", dimension_numbers=dn)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def init_dpt_head(key, cfg: DPTHeadConfig, dtype=jnp.float32) -> dict:
    ks = iter(P.split_keys(key, 40))
    f = cfg.features
    oc = cfg.out_channels
    p = {
        "norm": P.layer_norm_init(cfg.dim_in, dtype=dtype),
        "projects": [_conv2d_init(next(ks), cfg.dim_in, o, 1, dtype)
                     for o in oc],
        "resize0": P.conv_init(next(ks), oc[0], oc[0], (4, 4), dtype=dtype),
        "resize1": P.conv_init(next(ks), oc[1], oc[1], (2, 2), dtype=dtype),
        "resize3": _conv2d_init(next(ks), oc[3], oc[3], 3, dtype),
        "layer_rn": [_conv2d_init(next(ks), o, f, 3, dtype, bias=False)
                     for o in oc],
        # feature_only keeps full width and drops the activation head
        # (dpt_head.py:101-110)
        "out_conv1": _conv2d_init(next(ks), f,
                                  f if cfg.feature_only else f // 2, 3,
                                  dtype),
    }
    if not cfg.feature_only:
        p["out_conv2a"] = _conv2d_init(next(ks), f // 2, 32, 3, dtype)
        p["out_conv2b"] = _conv2d_init(next(ks), 32, cfg.output_dim, 1, dtype)
    for i in range(1, 5):
        rcu = {}
        for j in (1, 2):
            rcu[f"rcu{j}_conv1"] = _conv2d_init(next(ks), f, f, 3, dtype)
            rcu[f"rcu{j}_conv2"] = _conv2d_init(next(ks), f, f, 3, dtype)
        rcu["out"] = _conv2d_init(next(ks), f, f, 1, dtype)
        p[f"refine{i}"] = rcu
    return p


def _rcu(p, prefix, x):
    """ResidualConvUnit (dpt_head.py:344-386). NB the reference's ReLU is
    INPLACE, so the skip connection adds relu(x), not x — replicated."""
    xr = jax.nn.relu(x)
    h = _conv2d(p[f"{prefix}_conv1"], xr)
    h = _conv2d(p[f"{prefix}_conv2"], jax.nn.relu(h))
    return xr + h


def _resize_bilinear(x, h, w):
    """align_corners=True (dpt_head.py custom_interpolate + fusion blocks
    use align_corners; previously a documented half-pixel deviation)."""
    from worldforge_tpu.ops.sampling import resize_align_corners
    return resize_align_corners(x, h, w)


def _fusion(p, x, residual, size_hw):
    """FeatureFusionBlock (dpt_head.py:389-456, align_corners=True)."""
    out = x
    if residual is not None:
        out = out + _rcu(p, "rcu1", residual)
    out = _rcu(p, "rcu2", out)
    out = _resize_bilinear(out, *size_hw)
    return _conv2d(p["out"], out)


def _uv_pos_embed(gh, gw, aspect, channels, ratio=0.1):
    """sincos embedding of a normalized uv grid (utils.py:11-110)."""
    diag = math.sqrt(aspect ** 2 + 1.0)
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = np.linspace(-span_x * (gw - 1) / gw, span_x * (gw - 1) / gw, gw)
    ys = np.linspace(-span_y * (gh - 1) / gh, span_y * (gh - 1) / gh, gh)
    uu, vv = np.meshgrid(xs, ys, indexing="xy")  # [gh? gw?]

    def sincos(posv, dim):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / (100.0 ** omega)
        out = np.einsum("m,d->md", posv.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    half = channels // 2
    emb_x = sincos(uu, half)
    emb_y = sincos(vv, half)
    emb = np.concatenate([emb_x, emb_y], axis=-1).reshape(gh, gw, channels)
    return jnp.asarray(emb * ratio, jnp.float32)


def dpt_head_forward(params, cfg: DPTHeadConfig,
                     tapped_tokens: List[jnp.ndarray],
                     img_hw: Tuple[int, int], patch_start_idx: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tapped_tokens: 4 tensors [B, S, P, 2C] (taps in order). Returns
    (pred [B,S,H,W,out-1], conf [B,S,H,W]) at full image resolution."""
    H, W = img_hw
    ps = cfg.patch_size
    gh, gw = H // ps, W // ps
    b, s = tapped_tokens[0].shape[:2]

    feats = []
    for i, tok in enumerate(tapped_tokens):
        x = tok[:, :, patch_start_idx:].reshape(b * s, gh * gw, cfg.dim_in)
        x = P.layer_norm(params["norm"], x.astype(jnp.float32), eps=1e-5)
        x = x.reshape(b * s, gh, gw, cfg.dim_in)
        x = _conv2d(params["projects"][i], x)
        if cfg.pos_embed:
            x = x + _uv_pos_embed(x.shape[1], x.shape[2], W / H, x.shape[3])
        if i == 0:
            x = _deconv2d(params["resize0"], x, 4)
        elif i == 1:
            x = _deconv2d(params["resize1"], x, 2)
        elif i == 3:
            # explicit torch-style padding: XLA SAME is asymmetric for
            # stride 2 on even sizes (dpt_head.py resize_layers[3])
            x = _conv2d(params["resize3"], x, stride=2,
                        padding=((1, 1), (1, 1)))
        feats.append(x)

    rn = [_conv2d(params["layer_rn"][i], feats[i]) for i in range(4)]
    out = _fusion(params["refine4"], rn[3], None, rn[2].shape[1:3])
    out = _fusion(params["refine3"], out, rn[2], rn[1].shape[1:3])
    out = _fusion(params["refine2"], out, rn[1], rn[0].shape[1:3])
    out = _fusion(params["refine1"], out, rn[0],
                  (rn[0].shape[1] * 2, rn[0].shape[2] * 2))
    out = _conv2d(params["out_conv1"], out)
    oh, ow = gh * ps // cfg.down_ratio, gw * ps // cfg.down_ratio
    out = _resize_bilinear(out, oh, ow)
    if cfg.pos_embed:
        out = out + _uv_pos_embed(oh, ow, W / H, out.shape[3])
    if cfg.feature_only:
        return out.reshape(b, s, oh, ow, -1)   # dpt_head.py:239-240
    out = _conv2d(params["out_conv2b"],
                  jax.nn.relu(_conv2d(params["out_conv2a"], out)))

    vals, conf = out[..., :-1], out[..., -1]
    if cfg.activation == "exp":
        vals = jnp.exp(vals)
    elif cfg.activation == "inv_log":
        vals = jnp.sign(vals) * jnp.expm1(jnp.abs(vals))
    if cfg.conf_activation == "expp1":
        conf = 1.0 + jnp.exp(conf)
    elif cfg.conf_activation == "expp0":
        conf = jnp.exp(conf)
    vals = vals.reshape(b, s, oh, ow, -1)
    conf = conf.reshape(b, s, oh, ow)
    return vals, conf
