"""int8 dynamic quantization for dense layers (TPU MXU int8 path).

No reference counterpart — the reference serves bf16/fp16 on GPU. On TPU
v5e the MXU executes int8 x int8 -> int32 at ~2x the bf16 FLOP rate
(measured on this chip: 202 TOPS vs 127 TFLOP/s dense), so a
weight+activation int8 path is the natural serving-mode speedup.

Scheme (standard W8A8 dynamic):
  - weights: per-output-channel symmetric int8, scale = max|w| / 127
  - activations: per-token symmetric int8 at runtime (one max-reduce and
    a multiply — fuses into the surrounding elementwise work)
  - accumulate int32 on the MXU, rescale fp32: y = (x8 @ w8) * s_x * s_w

`quantize_dense(p)` converts a {"w", "b"?} dense param dict in place;
`core.params.dense` dispatches on the presence of "w8" so existing model
forwards work unchanged on a quantized pytree. Use
`quantize_tree(params, predicate)` to convert only the large matmuls
(attention qkv/proj, FFN) and keep adaLN/norm/head layers in bf16/fp32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax


def quantize_weight(w: jnp.ndarray):
    """[in, out] -> (int8 [in, out], fp32 scale [out]); stacked scan-layer
    weights [L, in, out] -> (int8 [L, in, out], scale [L, out]) so a
    lax.scan slice yields exactly the 2-D quantized layout."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2) / 127.0
    s = jnp.maximum(s, 1e-8)
    w8 = jnp.clip(jnp.round(wf / s[..., None, :]), -127, 127).astype(jnp.int8)
    return w8, s


def quantize_dense(p: dict) -> dict:
    """{"w": [in,out], "b"?} -> {"w8", "scale", "b"?}."""
    w8, s = quantize_weight(p["w"])
    out = {"w8": w8, "scale": s}
    if "b" in p:
        out["b"] = p["b"].astype(jnp.float32)
    return out


def quantize_activations(x: jnp.ndarray):
    """Per-token symmetric int8: returns (x8, scale[..., 1]). Share across
    several matmuls over the same activations (q/k/v, SwiGLU w1/w3) to
    avoid redundant HBM passes."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-8)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def dense_q8_pre(p: dict, x8: jnp.ndarray, sx: jnp.ndarray,
                 out_dtype=jnp.float32) -> jnp.ndarray:
    """int8 matmul over pre-quantized activations."""
    acc = lax.dot_general(x8, p["w8"],
                          (((x8.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * p["scale"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def dense_q8(p: dict, x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: y = (q(x) @ w8) * s_x * s_w + b."""
    x8, sx = quantize_activations(x)
    return dense_q8_pre(p, x8, sx, out_dtype=out_dtype or x.dtype)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "w8" in p


_DEFAULT_KEYS = ("qkv", "attn_proj", "proj", "x_q", "x_kv", "x_proj",
                 "w1", "w2", "w3", "fc1", "fc2", "q", "k", "v", "o",
                 "to_q", "to_k", "to_v", "to_out", "ffn1", "ffn2",
                 "img_kv", "k_img", "v_img", "a_q", "a_kv", "a_proj")
# fp32 numerics islands whose (small) matmuls must stay full precision:
# the adaLN conditioning path is statistics-sensitive (FLF channel
# selection thresholds ride on the latent statistics downstream)
_EXCLUDE_PATHS = ("time_embedding", "time_projection", "head",
                  "t_embedder", "final")  # longcat adaLN/head islands


def _default_pred(path: str) -> bool:
    parts = path.split("/")
    return (parts[-1] in _DEFAULT_KEYS
            and not any(p in _EXCLUDE_PATHS for p in parts))


def quantize_tree(params, predicate: Optional[Callable[[str], bool]] = None):
    """Recursively convert dense param dicts whose '/'-joined dict path
    matches `predicate` (default: the big attention/FFN matmuls, excluding
    the fp32 time-embedding/head islands). Norms, adaLN, embeddings, and
    output heads stay unquantized."""
    pred = predicate or _default_pred

    def walk(node, path=""):
        if isinstance(node, dict):
            if "w" in node and not isinstance(node["w"], dict) \
                    and getattr(node["w"], "ndim", 0) in (2, 3) and pred(path):
                return quantize_dense(node)
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path) for v in node)
        return node

    return walk(params)
