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
    """{"w": [in,out], "b"?, ...} -> {"w8", "scale", "b"?, ...}: extra
    keys (e.g. attached LoRA terms) pass through untouched so quantizing
    never silently drops leaf state."""
    w8, s = quantize_weight(p["w"])
    out = {k: v for k, v in p.items() if k != "w"}
    out.update(w8=w8, scale=s)
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
    return isinstance(p, dict) and ("w8" in p or "w4" in p or "w6" in p)


# ------------------------------------------------------------------ int4
# int4 weight STORAGE (group-scaled, nibble-packed) with int8 EXECUTION
# (W4A8). Storage is the capacity lever — what fits the Wan-14B i2v
# variant (~16.4B params: int8 16.1 GB OOMs a 16 GB v5e, FFN-int4 hybrid
# ~13.6 GB fits; all-int4 ~8 GB). Execution: the Mosaic toolchain has no
# int4 MXU rate, so per matmul the int4 codes are unpacked and REQUANTIZED
# to per-output-channel int8 (the requant scale is precomputed at quantize
# time), then run on the measured-2x int8 MXU path like W8A8 — instead of
# the round-2 dequant-to-bf16 epilogue that cost the i2v flagship a 17%
# step-time premium (docs/PERF.md round-2 i2v row).
#
# Packing layout (round-3): row i pairs with row i + in/2 — the low
# nibble holds the TOP half of the in-dim, the high nibble the BOTTOM
# half, so unpacking is a contiguous concat. The round-2 layout paired
# rows 2i/2i+1, whose unpack (stack + reshape row interleave) lowered to
# a strided scatter that dominated the dequant cost.


def quantize_weight_int4(w: jnp.ndarray, group: int = 128):
    """[.., in, out] -> (uint8 [.., in/2, out] two-nibble packed,
    fp32 scale [.., in/group, out]). Symmetric [-7, 7] per (group, out)
    cell; row i packs to the low nibble and row i + in/2 to the high
    nibble of byte i (both stored offset by +8). Falls back to
    per-output-channel scaling when ``group`` does not divide in/2 (both
    halves must decompose into whole groups for the scale layout)."""
    wf = w.astype(jnp.float32)
    in_dim, out_dim = wf.shape[-2], wf.shape[-1]
    if in_dim % 2:
        raise ValueError(f"int4 packing needs an even in-dim, got {in_dim}")
    g = group if group and (in_dim // 2) % group == 0 else in_dim
    ng = in_dim // g
    wg = wf.reshape(*wf.shape[:-2], ng, g, out_dim)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / s[..., :, None, :]), -7, 7)
    q = q.reshape(*wf.shape[:-2], in_dim, out_dim).astype(jnp.int8)
    half = in_dim // 2
    lo = (q[..., :half, :] + 8).astype(jnp.uint8)
    hi = (q[..., half:, :] + 8).astype(jnp.uint8)
    return lo | (hi << 4), s


def quantize_dense_int4(p: dict, group: int = 128) -> dict:
    """{"w": [in,out], "b"?, ...} -> {"w4", "scale4", "scale8", "b"?, ...};
    extra keys pass through (see quantize_dense). ``scale8`` [.., out] is
    the precomputed per-output-channel int8 requantization scale for the
    W4A8 execution path: s8 = max over the in-dim of |q * scale4| / 127,
    taken over the int4-DEQUANTIZED weights so requantization is exact up
    to int8 rounding."""
    w4, s = quantize_weight_int4(p["w"], group=group)
    # max|dequant| per out column = max over groups of (7 * scale4)
    s8 = jnp.maximum(7.0 * jnp.max(s, axis=-2) / 127.0, 1e-8)
    out = {k: v for k, v in p.items() if k != "w"}
    out.update(w4=w4, scale4=s, scale8=s8)
    if "b" in p:
        out["b"] = p["b"].astype(jnp.float32)
    return out


def _unpack_int4(u: jnp.ndarray) -> jnp.ndarray:
    """uint8 [.., in/2, out] -> int8 codes [.., in, out] in [-7, 7]
    (contiguous halves concat — no row interleave)."""
    lo = (u & jnp.uint8(0xF)).astype(jnp.int8) - 8
    hi = (u >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize_int4(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unpack {"w4", "scale4"} back to a dense [.., in, out] weight."""
    u = p["w4"]
    q = _unpack_int4(u)
    half, out_dim = u.shape[-2], u.shape[-1]
    s = p["scale4"].astype(jnp.float32)
    ng = s.shape[-2]
    wq = q.reshape(*u.shape[:-2], ng, (half * 2) // ng, out_dim)
    wq = wq.astype(jnp.float32) * s[..., :, None, :]
    return wq.reshape(*u.shape[:-2], half * 2, out_dim).astype(dtype)


def _requantize_int4_to_int8(p: dict) -> jnp.ndarray:
    """int4 codes -> per-output-channel int8 weights for the MXU int8 dot:
    w8 = round(q * scale4 / scale8). Pure elementwise (one fused pass);
    the ratio scale4/scale8 <= 127/7 by construction so no overflow."""
    u = p["w4"]
    q = _unpack_int4(u)
    half, out_dim = u.shape[-2], u.shape[-1]
    ratio = (p["scale4"].astype(jnp.float32)
             / p["scale8"].astype(jnp.float32)[..., None, :])
    ng = ratio.shape[-2]
    qg = q.reshape(*u.shape[:-2], ng, (half * 2) // ng, out_dim)
    w8 = jnp.round(qg.astype(jnp.float32) * ratio[..., :, None, :])
    return jnp.clip(w8, -127, 127).astype(jnp.int8).reshape(
        *u.shape[:-2], half * 2, out_dim)


# ------------------------------------------------------------------ int6
# int6 weight storage (0.75 B/param) with the same W-A8 int8 MXU execution
# as int4. No reference counterpart (the reference serves bf16). Purpose:
# the precision rung between int4 (0.5 B, ~2% guided drift at the
# production latent shape — docs/PERF.md round-3 row) and int8 (1.0 B,
# 0.27% drift but 16.1 GB for the Wan i2v, OOM on a 16 GB v5e). 31 levels
# per side vs int4's 7 cut the dominant FFN rounding error ~4.4x, which is
# what brings the guided drift under the BASELINE.json 1e-2 bar while the
# blocks still fit next to the VAE (int6-FFN + int4-attention ~9.5 GB).
#
# Packing: 4 rows -> 3 bytes, plane layout [.., 3, in/4, out]. Row i of
# quarter q (rows i, i+in/4, i+2in/4, i+3in/4) shares byte column i of the
# three planes; unpack is 8 elementwise bit ops + one contiguous concat —
# the same no-strided-scatter property as the round-3 int4 halves layout.


def quantize_weight_int6(w: jnp.ndarray, group: int = 128):
    """[.., in, out] -> (uint8 [.., 3, in/4, out] packed planes,
    fp32 scale [.., in/group, out]). Symmetric [-31, 31] per (group, out)
    cell; values stored offset by +32 (6 significant bits). Falls back to
    per-output-channel scaling when ``group`` does not divide in/4."""
    wf = w.astype(jnp.float32)
    in_dim, out_dim = wf.shape[-2], wf.shape[-1]
    if in_dim % 4:
        raise ValueError(f"int6 packing needs in-dim % 4 == 0, got {in_dim}")
    g = group if group and (in_dim // 4) % group == 0 else in_dim
    ng = in_dim // g
    wg = wf.reshape(*wf.shape[:-2], ng, g, out_dim)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 31.0, 1e-8)
    q = jnp.clip(jnp.round(wg / s[..., :, None, :]), -31, 31)
    q = q.reshape(*wf.shape[:-2], in_dim, out_dim)
    v = (q + 32.0).astype(jnp.uint8)  # [1, 63]
    quarter = in_dim // 4
    v0 = v[..., 0 * quarter:1 * quarter, :]
    v1 = v[..., 1 * quarter:2 * quarter, :]
    v2 = v[..., 2 * quarter:3 * quarter, :]
    v3 = v[..., 3 * quarter:4 * quarter, :]
    b0 = v0 | ((v1 & jnp.uint8(0x3)) << 6)
    b1 = (v1 >> 2) | ((v2 & jnp.uint8(0xF)) << 4)
    b2 = (v2 >> 4) | (v3 << 2)
    return jnp.stack([b0, b1, b2], axis=-3), s


def _unpack_int6(u: jnp.ndarray) -> jnp.ndarray:
    """uint8 [.., 3, in/4, out] -> int8 codes [.., in, out] in [-31, 31]
    (contiguous quarters concat — no row interleave)."""
    b0, b1, b2 = u[..., 0, :, :], u[..., 1, :, :], u[..., 2, :, :]
    v0 = b0 & jnp.uint8(63)
    v1 = (b0 >> 6) | ((b1 & jnp.uint8(0xF)) << 2)
    v2 = (b1 >> 4) | ((b2 & jnp.uint8(0x3)) << 4)
    v3 = b2 >> 2
    q = jnp.concatenate([v0, v1, v2, v3], axis=-2)
    return q.astype(jnp.int8) - 32


def quantize_dense_int6(p: dict, group: int = 128) -> dict:
    """{"w": [in,out], ...} -> {"w6", "scale6", "scale8", "b"?, ...}.
    ``scale8`` is the per-output-channel int8 requantization scale for the
    W6A8 execution path: s8 = 31 * max over groups of scale6 / 127."""
    w6, s = quantize_weight_int6(p["w"], group=group)
    s8 = jnp.maximum(31.0 * jnp.max(s, axis=-2) / 127.0, 1e-8)
    out = {k: v for k, v in p.items() if k != "w"}
    out.update(w6=w6, scale6=s, scale8=s8)
    if "b" in p:
        out["b"] = p["b"].astype(jnp.float32)
    return out


def dequantize_int6(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unpack {"w6", "scale6"} back to a dense [.., in, out] weight."""
    q = _unpack_int6(p["w6"])
    in_dim, out_dim = q.shape[-2], q.shape[-1]
    s = p["scale6"].astype(jnp.float32)
    ng = s.shape[-2]
    wq = q.reshape(*q.shape[:-2], ng, in_dim // ng, out_dim)
    wq = wq.astype(jnp.float32) * s[..., :, None, :]
    return wq.reshape(*q.shape[:-2], in_dim, out_dim).astype(dtype)


def _requantize_int6_to_int8(p: dict) -> jnp.ndarray:
    """int6 codes -> per-output-channel int8 weights for the MXU int8 dot:
    w8 = round(q * scale6 / scale8); ratio <= 127/31 so no overflow."""
    q = _unpack_int6(p["w6"])
    in_dim, out_dim = q.shape[-2], q.shape[-1]
    ratio = (p["scale6"].astype(jnp.float32)
             / p["scale8"].astype(jnp.float32)[..., None, :])
    ng = ratio.shape[-2]
    qg = q.reshape(*q.shape[:-2], ng, in_dim // ng, out_dim)
    w8 = jnp.round(qg.astype(jnp.float32) * ratio[..., :, None, :])
    return jnp.clip(w8, -127, 127).astype(jnp.int8).reshape(
        *q.shape[:-2], in_dim, out_dim)


def dense_q6(p: dict, x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """int6-stored matmul, W6A8 execution: requantize weights to int8 on
    the fly and run the 2x-rate int8 MXU dot (same path as dense_q4)."""
    w8 = _requantize_int6_to_int8(p)
    x8, sx = quantize_activations(x)
    acc = lax.dot_general(x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * p["scale8"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def dense_q4(p: dict, x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """int4-stored matmul. With the precomputed ``scale8`` present (all
    round-3+ trees): W4A8 — requantize weights to int8 on the fly and run
    the 2x-rate int8 MXU dot with per-token int8 activations, exactly the
    W8A8 execution path. Legacy trees without scale8 fall back to
    weight-only dequant-to-bf16."""
    if "scale8" in p:
        w8 = _requantize_int4_to_int8(p)
        x8, sx = quantize_activations(x)
        acc = lax.dot_general(x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * p["scale8"].astype(jnp.float32)
    else:
        w = dequantize_int4(p, dtype=jnp.bfloat16)
        y = lax.dot_general(x.astype(jnp.bfloat16), w,
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


_DEFAULT_KEYS = ("qkv", "attn_proj", "proj", "x_q", "x_kv", "x_proj",
                 "w1", "w2", "w3", "fc1", "fc2", "q", "k", "v", "o",
                 "to_q", "to_k", "to_v", "to_out", "ffn1", "ffn2",
                 "img_kv", "k_img", "v_img", "a_q", "a_kv", "a_proj")
# fp32 numerics islands whose (small) matmuls must stay full precision:
# the adaLN conditioning path is statistics-sensitive (FLF channel
# selection thresholds ride on the latent statistics downstream)
_EXCLUDE_PATHS = ("time_embedding", "time_projection", "head",
                  "t_embedder", "final")  # longcat adaLN/head islands
# Conditioning embeddings (computed once per clip, ~0 capacity win) keep
# W8A8 even when the leaf name matches an int4 key: 4-bit noise on the
# text/CLIP conditioning path buys no memory and costs fidelity.
_INT4_EXCLUDE_PATHS = ("text_embedding", "img_emb", "txt_in", "vector_in",
                       "audio_proj")


def _default_pred(path: str) -> bool:
    parts = path.split("/")
    return (parts[-1] in _DEFAULT_KEYS
            and not any(p in _EXCLUDE_PATHS for p in parts))


def quantize_tree(params, predicate: Optional[Callable[[str], bool]] = None,
                  int4_keys: tuple = (), int4_group: int = 128,
                  int6_keys: tuple = (), int6_group: int = 128,
                  downcast_adaln: bool = True):
    """Recursively convert dense param dicts whose '/'-joined dict path
    matches `predicate` (default: the big attention/FFN matmuls, excluding
    the fp32 time-embedding/head islands). Norms, adaLN, embeddings, and
    output heads stay unquantized. Matched leaves whose final path key is
    in ``int4_keys`` (or all of them, int4_keys=("*",)) get weight-only
    int4 instead of W8A8 — the capacity mode for models whose int8
    footprint exceeds HBM (Wan-14B i2v). ``int6_keys`` works the same at
    6-bit storage (precision rung between int4 and int8; takes precedence
    over int4_keys when a leaf matches both — the intended drift-bar
    recipe is int6 FFN + int4 attention, see dense_q6).

    ``downcast_adaln`` (serving-build capacity lever, on by default):
    additionally store per-BLOCK adaLN dense weights as bf16 — never the
    non-scanned ``_EXCLUDE_PATHS`` islands (``final``/head/time embeds),
    which stay true fp32 like the reference's FinalLayer_FP32. Pass False
    to leave every adaLN weight untouched (e.g. custom-predicate callers
    quantizing a sub-tree)."""
    pred = predicate or _default_pred

    def walk(node, path=""):
        if isinstance(node, dict):
            if "w" in node and not isinstance(node["w"], dict) \
                    and getattr(node["w"], "ndim", 0) in (2, 3) and pred(path):
                leaf = path.split("/")[-1]
                parts = path.split("/")
                sub8_ok = not any(p in _INT4_EXCLUDE_PATHS for p in parts)
                if sub8_ok and ("*" in int6_keys or leaf in int6_keys):
                    return quantize_dense_int6(node, group=int6_group)
                if sub8_ok and ("*" in int4_keys or leaf in int4_keys):
                    return quantize_dense_int4(node, group=int4_group)
                return quantize_dense(node)
            if (downcast_adaln
                    and "w" in node and not isinstance(node["w"], dict)
                    and path.split("/")[-1].endswith("adaln")
                    and not any(p in _EXCLUDE_PATHS for p in path.split("/"))):
                # Per-block adaLN dense weights: bf16 STORAGE in serving
                # builds — a recorded TPU deviation (docs/COMPONENTS.md):
                # the reference runs adaLN as a true fp32 Linear under
                # autocast(float32) (longcat_video_dit.py:82-85). Kept fp32
                # they cost LongCat ~2.4 GB of arguments plus a 1.12 GB
                # hoisted bf16-split temp (fp32 dots lower to bf16 MXU
                # passes and XLA hoists the loop-invariant weight split out
                # of the layer scan) — measured as the largest allocation in
                # the 48-layer OOM. P.dense keeps the fp32 INPUT precision
                # via a two-term bf16 activation split (core/params.py).
                # The non-scanned `final`/head islands are excluded above —
                # no hoist problem there, ~16 MB, reference-exact fp32.
                out = dict(node)
                out["w"] = node["w"].astype(jnp.bfloat16)
                return out
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path) for v in node)
        return node

    return walk(params)
