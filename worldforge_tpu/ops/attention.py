"""Attention dispatch: Pallas flash kernel on TPU, fp32 einsum elsewhere.

Mirrors the reference's dispatcher (flash-attn-3 → flash-attn-2 → SDPA,
/root/reference/wan_for_worldforge/wan/modules/attention.py:133-179) with a
TPU-first priority: Pallas flash attention on TPU backends, a numerically
careful jnp reference on CPU (tests / multi-chip dry runs).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from worldforge_tpu.ops.flash_attention import flash_attention


def sdpa_reference(q, k, v, *, kv_lens=None, scale=None):
    """Reference dot-product attention over [B, S, H, D]; fp32 softmax."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if kv_lens is not None:
        mask = jnp.arange(sk)[None, None, None, :] < kv_lens[:, None, None, None]
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def attention(q, k, v, *, kv_lens: Optional[jnp.ndarray] = None,
              scale: Optional[float] = None, impl: str = "auto"):
    """Multi-head attention over [B, S, H, D] tensors.

    impl: 'auto' (Pallas on TPU, reference elsewhere), 'pallas', 'reference'.
    """
    if impl == "auto":
        impl = "pallas" if _use_pallas() else "reference"
    if impl == "pallas":
        return flash_attention(q, k, v, kv_lens=kv_lens, scale=scale)
    return sdpa_reference(q, k, v, kv_lens=kv_lens, scale=scale)
