"""Pallas TPU flash attention (dense, non-causal, variable kv length).

Replaces the reference's flash-attn-2/3 CUDA kernels and SDPA/xformers
fallbacks (/root/reference/wan_for_worldforge/wan/modules/attention.py:24-179,
longcat modules/attention.py). Online-softmax over KV blocks with fp32
accumulators; grid is (batch*heads, q_blocks, kv_blocks) with the kv axis
innermost so the (m, l, acc) scratch carries across kv steps.

Varlen semantics: the reference packs with cu_seqlens; here q/k/v arrive
padded to block multiples and a per-batch ``kv_lens`` (scalar-prefetch)
masks padded keys. Padded query rows produce garbage that callers slice off.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on TPU v5e at Wan-480p shape (S=20480, H=40, D=128). Two-level kv
# blocking like the official TPU flash kernel: HBM tiles of block_k_major,
# compute in unrolled block_k chunks. Interleaved A/B at the Wan shape:
# 86.4 ms (this) vs 91.6 ms (single-level kv + lane-sliced m/l), ~6%.
DEFAULT_BLOCK_Q = 2048
DEFAULT_BLOCK_K_MAJOR = 1024
DEFAULT_BLOCK_K = 512
_NEG_INF = -1e30  # finite "minus infinity": keeps exp() NaN-free on padding


def _fa_kernel(kv_lens_ref, q_ref, k_ref, v_ref, o_ref, *rest,
               scale: float, block_k_major: int, block_k: int,
               num_heads: int, with_lse: bool = False):
    if with_lse:
        m_out, l_out, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    b = pl.program_id(0) // num_heads
    kv_len = kv_lens_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Skip major blocks entirely past the valid kv length. Lane-friendly
    # online softmax (official TPU kernel idiom): m/l stay 128 lanes wide —
    # never lane-slice ``[:, :1]`` (forces relayouts) — and the accumulator
    # is kept normalized incrementally so the epilogue is a plain copy.
    @pl.when(ki * block_k_major < kv_len)
    def _body():
        q = q_ref[0]  # [block_q, D]
        bk_rep = block_k // 128

        @pl.loop(0, block_k_major, step=block_k, unroll=True)
        def _inner(start_k):
            k = k_ref[0, pl.dslice(start_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [bq, bk]
            key_idx = (ki * block_k_major + start_k +
                       jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(key_idx < kv_len, s, _NEG_INF)

            m_prev = m_ref[:]                      # [bq, 128]
            l_prev = l_ref[:]
            m_cur = jnp.max(s, axis=1)[:, None]    # [bq, 1]
            m_next = jnp.maximum(m_prev, m_cur)    # [bq, 128]
            p = jnp.exp(s - jnp.tile(m_next, (1, bk_rep)))
            alpha = jnp.exp(m_prev - m_next)
            l_corr = alpha * l_prev
            l_next = jnp.sum(p, axis=1)[:, None] + l_corr
            m_ref[:] = m_next
            l_ref[:] = l_next
            l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
            v = v_ref[0, pl.dslice(start_k, block_k), :]
            d_rep = acc_ref.shape[-1] // 128
            acc_ref[:] = acc_ref[:] * jnp.tile(l_corr * l_inv, (1, d_rep))
            acc_ref[:] += jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * jnp.tile(
                    l_inv, (1, d_rep))

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)
        if with_lse:
            m_out[0] = m_ref[:]
            l_out[0] = l_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k_major", "block_k",
                     "num_heads", "interpret", "return_lse"))
def _flash_attention_bhsd(q, k, v, kv_lens, *, scale, block_q, block_k_major,
                          block_k, num_heads, interpret=False,
                          return_lse=False):
    """q: [BH, Sq, D], k/v: [BH, Sk, D] (padded), kv_lens: [B] int32."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    nq = sq // block_q
    nk = sk // block_k_major

    grid = (bh, nq, nk)
    kernel = functools.partial(
        _fa_kernel, scale=scale, block_k_major=block_k_major,
        block_k=block_k, num_heads=num_heads, with_lse=return_lse)
    qo_spec = pl.BlockSpec((1, block_q, d), lambda b, qi, ki, _: (b, qi, 0))
    ml_spec = pl.BlockSpec((1, block_q, 128), lambda b, qi, ki, _: (b, qi, 0))
    out_specs = qo_spec
    out_shape = jax.ShapeDtypeStruct((bh, sq, d), q.dtype)
    if return_lse:
        ml_shape = jax.ShapeDtypeStruct((bh, sq, 128), jnp.float32)
        out_specs = (qo_spec, ml_spec, ml_spec)
        out_shape = (out_shape, ml_shape, ml_shape)
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                qo_spec,
                pl.BlockSpec((1, block_k_major, d),
                             lambda b, qi, ki, _: (b, ki, 0)),
                pl.BlockSpec((1, block_k_major, d),
                             lambda b, qi, ki, _: (b, ki, 0)),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # l
                pltpu.VMEM((block_q, d), jnp.float32),    # acc
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=2 * (q.size + k.size + v.size),
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )(kv_lens, q, k, v)
    if return_lse:
        o, m, l = res
        return o, m[:, :, 0], l[:, :, 0]
    return res


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(q, k, v, *, kv_lens=None, scale=None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k_major: int = DEFAULT_BLOCK_K_MAJOR,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret=None, return_lse: bool = False):
    """Flash attention over [B, S, H, D] tensors (reference layout,
    wan/modules/attention.py:133-179). Returns [B, Sq, H, D].

    kv_lens: optional [B] int32 true key lengths (padding masked out).
    interpret: run the Pallas kernel in interpreter mode (default: True on
    non-TPU backends so the same code path works on CPU).
    return_lse: additionally return the running max ``m`` and softmax
    normalizer ``l`` per query row as [B, H, Sq] fp32 (the output stays
    normalized) — for cross-shard LSE-corrected merging (ring attention,
    reference semantics bsa_interface.py:491-529).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if kv_lens is None:
        kv_lens = jnp.full((b,), sk, dtype=jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)

    block_q = min(block_q, _round_up(sq, 128))
    block_k_major = min(block_k_major, _round_up(sk, 128))
    block_k = min(block_k, block_k_major)
    if block_k_major % block_k:
        block_k = block_k_major  # inner loop needs an even chunking

    # VMEM-aware clamp: the defaults are tuned for bf16 d=128. fp32 inputs
    # with wide head dims (e.g. the VAE's single-head spatial attention,
    # d=384 fp32) blow the 16 MB scoped-vmem budget (observed 20.5 MB at
    # the defaults); shrink block_q proportionally to the per-row tile
    # footprint, floored at 512 (which compiles at fp32 d=384).
    footprint = jnp.dtype(q.dtype).itemsize * _round_up(d, 128)
    if footprint > 2 * 256:   # > 2x the tuned bf16-d128 point
        block_q = min(max(512, min(block_q, _round_up(
            block_q * 256 // footprint, 128))), _round_up(sq, 128))
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k_major)
    d_p = _round_up(d, 128)

    def pad(x, s_to, d_to):
        return jnp.pad(x, ((0, 0), (0, s_to - x.shape[1]), (0, 0),
                           (0, d_to - x.shape[3])))

    qp = pad(q, sq_p, d_p).transpose(0, 2, 1, 3).reshape(b * h, sq_p, d_p)
    kp = pad(k, sk_p, d_p).transpose(0, 2, 1, 3).reshape(b * h, sk_p, d_p)
    vp = pad(v, sk_p, d_p).transpose(0, 2, 1, 3).reshape(b * h, sk_p, d_p)
    # kv_lens covers real (unpadded) keys only; padded keys masked by kernel.
    res = _flash_attention_bhsd(qp, kp, vp, kv_lens, scale=float(scale),
                                block_q=block_q, block_k_major=block_k_major,
                                block_k=block_k, num_heads=h,
                                interpret=interpret, return_lse=return_lse)
    if return_lse:
        o, m, l = res
        o = o.reshape(b, h, sq_p, d_p).transpose(0, 2, 1, 3)
        m = m.reshape(b, h, sq_p)[:, :, :sq]
        l = l.reshape(b, h, sq_p)[:, :, :sq]
        return o[:, :sq, :, :d], m, l
    o = res.reshape(b, h, sq_p, d_p).transpose(0, 2, 1, 3)
    return o[:, :sq, :, :d]
