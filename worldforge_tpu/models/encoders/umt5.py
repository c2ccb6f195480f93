"""UMT5 encoder (text conditioning for Wan2.1 and LongCat), JAX.

Behavioral reference: the pipelines use transformers' UMT5EncoderModel
("google/umt5-xxl") — pipeline_wan_i2v_clean.py:167-205 pads/truncates to
512 tokens; the vendored torch implementation lives at
wan_for_worldforge/wan/modules/t5.py. UMT5 = T5 v1.1 (gated GELU, RMSNorm,
no attention scaling by 1/sqrt(d)) with PER-LAYER relative position biases
(unlike T5's shared-first-layer bias).

umt5-xxl: d_model=4096, d_ff=10240, 24 layers, 64 heads x d_head 64,
vocab 256384, rel buckets 32, max_distance 128.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core import params as P
from worldforge_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab_size: int = 256384
    d_model: int = 4096
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    d_head: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6

    @classmethod
    def xxl(cls) -> "UMT5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "UMT5Config":
        return cls(vocab_size=128, d_model=32, d_ff=64, num_layers=2,
                   num_heads=2, d_head=16)


def _rel_bucket(relative_position: np.ndarray, num_buckets: int,
                max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative position bucketing (t5.py reference /
    HF implementation semantics)."""
    nb = num_buckets // 2
    ret = (relative_position > 0).astype(np.int64) * nb
    n = np.abs(relative_position)
    max_exact = nb // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (nb - max_exact)).astype(np.int64)
    val_large = np.minimum(val_large, nb - 1)
    return ret + np.where(is_small, n, val_large)


def rel_position_bucket_matrix(q_len: int, k_len: int, num_buckets: int = 32,
                               max_distance: int = 128) -> np.ndarray:
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    return _rel_bucket(mem - ctx, num_buckets, max_distance)


def init_umt5_layer(key, cfg: UMT5Config, dtype=jnp.float32) -> dict:
    ks = P.split_keys(key, 8)
    dm, inner = cfg.d_model, cfg.num_heads * cfg.d_head
    return {
        "ln1": P.rms_norm_init(dm, dtype=dtype),
        "q": P.dense_init(ks[0], dm, inner, bias=False, dtype=dtype),
        "k": P.dense_init(ks[1], dm, inner, bias=False, dtype=dtype),
        "v": P.dense_init(ks[2], dm, inner, bias=False, dtype=dtype),
        "o": P.dense_init(ks[3], inner, dm, bias=False, dtype=dtype),
        "rel_bias": P.dense_init(ks[4], cfg.rel_buckets, cfg.num_heads,
                                 bias=False, init="normal", dtype=dtype)["w"],
        "ln2": P.rms_norm_init(dm, dtype=dtype),
        "wi_0": P.dense_init(ks[5], dm, cfg.d_ff, bias=False, dtype=dtype),
        "wi_1": P.dense_init(ks[6], dm, cfg.d_ff, bias=False, dtype=dtype),
        "wo": P.dense_init(ks[7], cfg.d_ff, dm, bias=False, dtype=dtype),
    }


def init_umt5(key, cfg: UMT5Config, dtype=jnp.bfloat16) -> dict:
    ks = P.split_keys(key, cfg.num_layers + 2)
    emb = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model))
           * 1.0).astype(dtype)
    layers = [init_umt5_layer(ks[i + 1], cfg, dtype)
              for i in range(cfg.num_layers)]
    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": emb,
        "blocks": blocks,
        "ln_f": P.rms_norm_init(cfg.d_model, dtype=dtype),
    }


def init_umt5_layerwise(key, cfg: UMT5Config, dtype=jnp.bfloat16,
                        layer_transform=None) -> dict:
    """UMT5 built LAYER BY LAYER on device (same pattern as the DiT
    layerwise inits): peak HBM = stacked blocks + one transient layer.
    Same key schedule as init_umt5 — numerically identical without a
    layer_transform."""
    from functools import partial

    tf = layer_transform or (lambda t: t)
    ks = P.split_keys(key, cfg.num_layers + 2)

    def mk_layer(k):
        return tf(init_umt5_layer(k, cfg, dtype))

    shapes = jax.eval_shape(mk_layer, ks[1])
    blocks = jax.tree_util.tree_map(
        lambda a: jnp.zeros((cfg.num_layers,) + a.shape, a.dtype), shapes)

    @partial(jax.jit, donate_argnums=0)
    def write(blocks, i, k):
        lay = mk_layer(k)
        return jax.tree_util.tree_map(
            lambda B, x: jax.lax.dynamic_update_index_in_dim(
                B, x.astype(B.dtype), i, 0), blocks, lay)

    for i in range(cfg.num_layers):
        blocks = write(blocks, jnp.int32(i), ks[i + 1])

    emb = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model))
           * 1.0).astype(dtype)
    return {
        "embed": emb,
        "blocks": blocks,
        "ln_f": P.rms_norm_init(cfg.d_model, dtype=dtype),
    }


def init_umt5_int8(key, cfg: UMT5Config, dtype=jnp.bfloat16) -> dict:
    """int8 W8A8 serving build of the text encoder: blocks quantized
    per-layer during construction (xxl: int8 blocks 4.3 GiB + bf16
    embedding 2.0 GiB = 6.27 GiB measured on chip vs 11.4 GB bf16 —
    scripts/probe_umt5_int8.py) — small enough to sit NEXT TO an
    all-int4 DiT on a 16 GB chip, removing the precompute-prompts /
    second-chip requirement for text encoding (docs/SERVING.md). The
    embedding table stays bf16: it is a gather, not a matmul — int8
    would win no MXU rate, only add dequant noise.
    Quality: tests/test_umt5_int8.py gates output drift vs fp32."""
    from worldforge_tpu.ops.quant import quantize_tree

    # Explicit predicate: UMT5's T5-style leaf names (wi_0/wi_1/wo) are not
    # in quant._DEFAULT_KEYS, which would silently leave the 5.6 GiB FFN
    # stack in bf16 (measured 9.1 GiB on-chip instead of 6.6).
    _Q = {"q", "k", "v", "o", "wi_0", "wi_1", "wo"}
    return init_umt5_layerwise(
        key, cfg, dtype,
        layer_transform=lambda t: quantize_tree(
            t, predicate=lambda path: path.split("/")[-1] in _Q))


def umt5_encode(params, cfg: UMT5Config, input_ids: jnp.ndarray,
                attn_mask: Optional[jnp.ndarray] = None,
                compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """input_ids [B, L] -> hidden states [B, L, d_model] fp32.

    T5 conventions: no 1/sqrt(d) attention scale (folded into init),
    pre-RMSNorm blocks, gated-GELU FFN, final RMSNorm. Per-layer relative
    position bias added to logits — implemented by folding the bias into an
    fp32 einsum attention (bias is incompatible with our Pallas kernel's
    current signature; L=512 makes this cheap relative to the DiT).
    """
    b, L = input_ids.shape
    x = params["embed"][input_ids].astype(jnp.float32)
    buckets = jnp.asarray(rel_position_bucket_matrix(
        L, L, cfg.rel_buckets, cfg.rel_max_distance))
    if attn_mask is None:
        attn_mask = jnp.ones((b, L), jnp.int32)
    neg = (1.0 - attn_mask.astype(jnp.float32)) * -1e9  # [B, L] keys

    def layer(x, p):
        h = P.rms_norm(p["ln1"], x, eps=cfg.eps,
                       out_dtype=compute_dtype)
        q = P.dense(p["q"], h).reshape(b, L, cfg.num_heads, cfg.d_head)
        k = P.dense(p["k"], h).reshape(b, L, cfg.num_heads, cfg.d_head)
        v = P.dense(p["v"], h).reshape(b, L, cfg.num_heads, cfg.d_head)
        bias = p["rel_bias"].astype(jnp.float32)[buckets]  # [L, L, H]
        bias = bias.transpose(2, 0, 1)[None]               # [1, H, L, L]
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32))
        s = s + bias + neg[:, None, None, :]
        pattn = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", pattn, v.astype(jnp.float32))
        o = o.reshape(b, L, cfg.num_heads * cfg.d_head)
        x = x + P.dense(p["o"], o.astype(compute_dtype)).astype(jnp.float32)

        h2 = P.rms_norm(p["ln2"], x, eps=cfg.eps, out_dtype=compute_dtype)
        gg = jax.nn.gelu(P.dense(p["wi_0"], h2), approximate=True)
        ff = P.dense(p["wo"], gg * P.dense(p["wi_1"], h2))
        return x + ff.astype(jnp.float32), None

    x, _ = jax.lax.scan(lambda c, p: layer(c, p), x, params["blocks"])
    x = P.rms_norm(params["ln_f"], x, eps=cfg.eps, out_dtype=jnp.float32)
    # zero out padded positions (the Wan vendored encoder masks outputs,
    # t5.py usage: context tokens beyond true length are zero-embeddings)
    return x * attn_mask.astype(jnp.float32)[..., None]
