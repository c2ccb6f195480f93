"""Fused modulated LayerNorm — one HBM pass for the adaLN prologue.

The Wan/LongCat block prologue is LN(x) * (1 + scale) + shift with a
per-(batch, channel) modulation (wan model.py:92-102 WanLayerNorm + the
adaLN modulate at model.py:446-457). XLA computes the fp32 mean/var
reduction and the normalize+modulate+cast as separate HBM passes over the
fp32 residual stream (~0.4 GB each at the 480p shape); this Pallas kernel
does read-once/write-once: x fp32 in, modulated bf16 out.

Numerics identical to P.layer_norm(x)*(1+sc)+sh (fp32 accumulation,
rsqrt; bitwise-equal tested on CPU interpret in tests/test_fused_norm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mod_ln_kernel(x_ref, sc_ref, sh_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)            # [bq, d]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + sc_ref[...].astype(jnp.float32)) \
        + sh_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "block_q", "out_dtype",
                                    "interpret"))
def modulated_layer_norm(x: jnp.ndarray, sc: jnp.ndarray, sh: jnp.ndarray,
                         *, eps: float = 1e-6, block_q: int = 256,
                         out_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jnp.ndarray:
    """x [B, S, D] (any float dtype; computed fp32), sc/sh [B, 1, D].
    Returns LN(x)*(1+sc)+sh in out_dtype."""
    b, s, d = x.shape
    # largest divisor of s that is a multiple of 8 and <= block_q
    # (Mosaic needs the sublane dim to be 8-aligned or the full axis)
    bq = s
    for c in range(min(block_q, s), 7, -1):
        if s % c == 0 and c % 8 == 0:
            bq = c
            break
    grid = (b, s // bq)
    return pl.pallas_call(
        functools.partial(_mod_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), out_dtype),
        interpret=interpret,
    )(x, sc, sh)


def modulated_layer_norm_ref(x, sc, sh, *, eps=1e-6,
                             out_dtype=jnp.bfloat16):
    """XLA reference (the exact op sequence the kernel replaces)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + sc.astype(jnp.float32)) + sh.astype(jnp.float32)
    return y.astype(out_dtype)
