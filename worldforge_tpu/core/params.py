"""Minimal functional parameter library.

Models in this framework are pure functions over explicit param pytrees
(dicts), not module objects — the idiomatic shape for pjit/shard_map and for
scan-over-layers. Each helper has an ``*_init`` (build params) and an apply
function. Weight layout is chosen for TPU matmuls: dense kernels are stored
``[in, out]`` so apply is ``x @ w`` (MXU-friendly), unlike torch's
``[out, in]``; the checkpoint converter transposes.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- dense


def dense_init(key, in_dim: int, out_dim: int, *, bias: bool = True,
               init: str = "xavier", std: float = 0.02,
               dtype=jnp.float32) -> dict:
    if init == "xavier":
        limit = math.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(key, (in_dim, out_dim), dtype=jnp.float32,
                               minval=-limit, maxval=limit)
    elif init == "normal":
        w = jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32) * std
    elif init == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype=jnp.float32)
    else:
        raise ValueError(init)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype=dtype)
    return p


def dense(p: dict, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    if "w8" in p:  # int8 serving mode (ops/quant.py)
        from worldforge_tpu.ops.quant import dense_q8
        y = dense_q8(p, x, out_dtype=compute_dtype or x.dtype)
    elif "w4" in p:  # int4 weight-only capacity mode (ops/quant.py)
        from worldforge_tpu.ops.quant import dense_q4
        y = dense_q4(p, x, out_dtype=compute_dtype or x.dtype)
    elif "w6" in p:  # int6 capacity mode, W6A8 execution (ops/quant.py)
        from worldforge_tpu.ops.quant import dense_q6
        y = dense_q6(p, x, out_dtype=compute_dtype or x.dtype)
    else:
        w = p["w"]
        if (compute_dtype == jnp.float32 and w.dtype == jnp.bfloat16):
            # bf16-STORED weights under an fp32 compute request. Upcasting w
            # would materialize (and, for scan-stacked weights, hoist) a full
            # fp32 copy — the measured LongCat 48-layer OOM (ops/quant.py).
            # Instead keep w bf16 and preserve the fp32 ACTIVATION precision
            # with a two-term bf16 split: x = hi + lo (each bf16), then
            # y = hi@w + lo@w accumulated fp32 on the MXU. Residual |lo| ≤
            # 2^-8|x|, so the recovered product is fp32-input-accurate to
            # ~2^-16 relative — vs ~2^-8 if x were simply truncated to bf16
            # (which silently degraded the fp32 residual stream feeding
            # converted-checkpoint heads; round-3 advisor fix). Costs 2x the
            # matmul FLOPs, only on the small adaLN/head islands that hit
            # this path. Note the reference runs these layers as TRUE fp32
            # Linears under autocast(float32) (longcat_video_dit.py:82-85,
            # blocks.py FinalLayer_FP32) — bf16 storage here is a recorded
            # TPU capacity deviation (docs/COMPONENTS.md), bounded by
            # tests/test_params.py::test_dense_bf16_weights_fp32_inputs.
            from jax import lax
            dims = (((x.ndim - 1,), (0,)), ((), ()))
            if x.dtype == jnp.float32:
                hi = x.astype(jnp.bfloat16)
                lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                y = (lax.dot_general(hi, w, dims,
                                     preferred_element_type=jnp.float32)
                     + lax.dot_general(lo, w, dims,
                                       preferred_element_type=jnp.float32))
            else:
                y = lax.dot_general(x.astype(jnp.bfloat16), w, dims,
                                    preferred_element_type=jnp.float32)
        else:
            if compute_dtype is not None:
                w = w.astype(compute_dtype)
                x = x.astype(compute_dtype)
            y = x @ w
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
    if "lora_down" in p:
        # unmerged adapter over a (possibly quantized) frozen base:
        # y += ((x @ down) @ up) * scale — keeps the base int8/int4 in HBM
        # (training/lora.py::apply_lora attaches these for quantized leaves)
        xf = x.astype(jnp.float32)
        delta = (xf @ p["lora_down"].astype(jnp.float32)) \
            @ p["lora_up"].astype(jnp.float32)
        y = (y.astype(jnp.float32)
             + delta * jnp.float32(p.get("lora_scale", 1.0))).astype(y.dtype)
    return y


# ---------------------------------------------------------------- norms


def layer_norm_init(dim: int, *, affine: bool = True, dtype=jnp.float32) -> dict:
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: dict, x: jnp.ndarray, *, eps: float = 1e-6,
               out_dtype=None) -> jnp.ndarray:
    """LayerNorm computed in fp32 (reference WanLayerNorm casts to float,
    wan/modules/model.py:92-102), output cast back to ``out_dtype or x.dtype``."""
    odtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(odtype)


def rms_norm_init(dim: int, *, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p: dict, x: jnp.ndarray, *, eps: float = 1e-5,
             out_dtype=None) -> jnp.ndarray:
    """RMSNorm in fp32, scale applied after the cast back (matches
    WanRMSNorm: ``self._norm(x.float()).type_as(x) * self.weight``,
    wan/modules/model.py:73-89)."""
    odtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return y.astype(odtype) * p["scale"].astype(odtype)


# ---------------------------------------------------------------- conv


def conv_init(key, in_ch: int, out_ch: int, kernel: Sequence[int], *,
              bias: bool = True, dtype=jnp.float32) -> dict:
    """ND conv params. Kernel layout: spatial... + (in, out) — i.e. HWIO/DHWIO."""
    fan_in = in_ch * math.prod(kernel)
    fan_out = out_ch * math.prod(kernel)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(key, (*kernel, in_ch, out_ch), dtype=jnp.float32,
                           minval=-limit, maxval=limit)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


_CONV_DIMNUMS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def conv(p: dict, x: jnp.ndarray, *, stride=1, padding="SAME",
         dilation=1, compute_dtype=None) -> jnp.ndarray:
    """Channels-last ND convolution (N, *spatial, C)."""
    w = p["w"]
    nd = w.ndim - 2
    if isinstance(stride, int):
        stride = (stride,) * nd
    if isinstance(dilation, int):
        dilation = (dilation,) * nd
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, _CONV_DIMNUMS[nd])
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=dn)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def group_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def group_norm(p: dict, x: jnp.ndarray, *, groups: int = 32,
               eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over channels-last input [..., C] (stats over spatial dims
    and the channel group, fp32)."""
    odtype = x.dtype
    c = x.shape[-1]
    g = min(groups, c)
    while c % g != 0:
        g -= 1
    xf = x.astype(jnp.float32).reshape(x.shape[0], -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(odtype)


# ---------------------------------------------------------------- misc


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def param_count(tree) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree)


def split_keys(key, n: int):
    return list(jax.random.split(key, n))
