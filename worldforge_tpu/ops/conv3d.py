"""Pallas 3x3x3 causal conv for the VAE hot path.

XLA's Conv3D emitter runs 58-96 TF/s at the Wan-VAE channel widths
(docs/PERF.md) while plain matmuls reach 158-163 TF/s on the same chip.
This kernel tiles the output spatially, DMAs one halo'd input tile
[3, bh+2, bw+2, Cin] from HBM into VMEM, and accumulates the 27 taps as
[bh*bw, Cin] x [Cin, Cout] MXU dots in fp32 — read-once input, write-once
output, weights resident in VMEM across the whole grid.

Contract matches the native branch of models/wan/vae._causal_conv3d AFTER
causal temporal padding: input [B, T_out+2, H, W, Cin] (front-padded by
the caller or the streaming cache), SAME spatial padding, stride 1.
Numerics: bf16 tap dots with fp32 accumulation — the same MXU passes XLA
uses for bf16 convs (fp32 inputs are cast; covered by the equivalence
tests at bf16 tolerance).

Reference behavior: wan/modules/vae.py:17-36 CausalConv3d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(n: int, target: int, mult: int = 1) -> int:
    """Largest divisor of n that is <= target and a multiple of `mult`
    (falls back to n itself)."""
    for c in range(min(target, n), 0, -1):
        if n % c == 0 and c % mult == 0:
            return c
    return n


def _conv_kernel(x_any, w_ref, b_ref, o_ref, xt, sem, *, bh, bw, t_out,
                 cin, cout, im2col):
    bt = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    b_idx = bt // t_out
    t = bt % t_out

    cp = pltpu.make_async_copy(
        x_any.at[b_idx, pl.ds(t, 3), pl.ds(j * bh, bh + 2),
                 pl.ds(k * bw, bw + 2), :],
        xt, sem)
    cp.start()
    cp.wait()

    taps = [xt[kt, kh:kh + bh, kw:kw + bw, :].reshape(bh * bw, cin)
            for kt in range(3) for kh in range(3) for kw in range(3)]
    if im2col:
        # small-C stages: a [M, C]x[C, C] dot pads K and N to 128 lanes
        # ((96/128)^2 = 56% MXU util); concatenating the 27 taps gives
        # K = 27*C (~1% pad) — one near-fully-utilized dot. w_ref comes
        # pre-reshaped [27*cin, cout] in the same (kt,kh,kw) order.
        xcol = jnp.concatenate(taps, axis=-1)
        acc = jax.lax.dot_general(xcol, w_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((bh * bw, cout), jnp.float32)
        for i, xs in enumerate(taps):
            acc = acc + jax.lax.dot_general(
                xs, w_ref[i // 9, (i // 3) % 3, i % 3],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, bw, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def conv3d_causal_pallas(x, w, b=None, *, out_dtype=None,
                         interpret: bool = False):
    """x: [B, T_out+2, H, W, Cin] (temporally pre-padded); w: [3,3,3,Cin,
    Cout]; b: [Cout] or None. Returns [B, T_out, H, W, Cout] (SAME spatial,
    stride 1)."""
    bN, tp, hh, ww, cin = x.shape
    assert w.shape[:3] == (3, 3, 3) and w.shape[3] == cin, w.shape
    cout = w.shape[4]
    t_out = tp - 2
    out_dtype = out_dtype or x.dtype

    # im2col for lane-unaligned channel widths (the FLOP-dominant decode
    # stages are C=96/192): K = 27*C one big dot instead of 27 padded ones
    im2col = cin % 128 != 0

    # block sizes: fit (x tile + weights + acc [+ xcol]) in ~13 MB VMEM
    bw_ = _pick_block(ww, 128, 8 if ww % 8 == 0 else 1)
    budget = 13 * 2 ** 20
    w_bytes = 27 * cin * cout * 2
    bh_ = _pick_block(hh, 16)
    while bh_ > 1:
        xt_bytes = 3 * (bh_ + 2) * (bw_ + 2) * cin * 2
        acc_bytes = bh_ * bw_ * cout * 4
        xcol_bytes = bh_ * bw_ * 27 * cin * 2 if im2col else 0
        if w_bytes + xt_bytes + 2 * acc_bytes + xcol_bytes <= budget:
            break
        bh_ = _pick_block(hh, bh_ - 1)

    wb = w.astype(jnp.bfloat16)
    if im2col:
        wb = wb.reshape(27 * cin, cout)
    bb = (b if b is not None else jnp.zeros((cout,), jnp.float32))
    bb = bb.astype(jnp.float32).reshape(1, cout)
    xb = x.astype(jnp.bfloat16) if x.dtype != jnp.bfloat16 else x
    # spatial SAME halo
    xp = jnp.pad(xb, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    grid = (bN * t_out, hh // bh_, ww // bw_)
    w_spec = (pl.BlockSpec((27 * cin, cout), lambda bt, j, k: (0, 0))
              if im2col else
              pl.BlockSpec((3, 3, 3, cin, cout),
                           lambda bt, j, k: (0, 0, 0, 0, 0)))
    out = pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh_, bw=bw_, t_out=t_out,
                          cin=cin, cout=cout, im2col=im2col),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            w_spec,
            pl.BlockSpec((1, cout), lambda bt, j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh_, bw_, cout),
                               lambda bt, j, k: (bt, j, k, 0)),
        out_shape=jax.ShapeDtypeStruct((bN * t_out, hh, ww, cout),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((3, bh_ + 2, bw_ + 2, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wb, bb)
    return out.reshape(bN, t_out, hh, ww, cout)
