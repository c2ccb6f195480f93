"""3D rotary position embeddings for video DiTs.

Behavioral spec from the reference:
  - Wan: head_dim d split into (d - 4*(d//6), 2*(d//6), 2*(d//6)) for (t,h,w);
    complex rotation per pair; freqs theta=10000
    (/root/reference/wan_for_worldforge/wan/modules/model.py:31-70, 478-485).
  - LongCat uses the same split (dim_t = D - 4*(D//6), dim_h = dim_w =
    2*(D//6)), see longcat_video/modules/rope_3d.py:41-119.

Implemented with real cos/sin pairs in fp32 (complex math is a poor fit for
the VPU). Pair convention matches torch.view_as_complex on a [..., d/2, 2]
reshape: even/odd interleaved pairs (x[2i], x[2i+1]).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _freqs_1d(positions: np.ndarray, dim: int, theta: float = 10000.0):
    """Angles [len(positions), dim/2] in float64 → float32 (matches the
    reference's float64 rope_params)."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ang = np.outer(positions.astype(np.float64), inv)
    return ang


def rope_3d_split(head_dim: int) -> Tuple[int, int, int]:
    """(dim_t, dim_h, dim_w) split of head_dim (each even)."""
    dh = 2 * (head_dim // 6)
    return head_dim - 2 * dh, dh, dh


@functools.lru_cache(maxsize=32)
def rope_3d_angles(f: int, h: int, w: int, head_dim: int,
                   theta: float = 10000.0,
                   h_offset: int = 0, w_offset: int = 0,
                   t_positions: Optional[tuple] = None) -> np.ndarray:
    """Per-token rotation angles [f*h*w, head_dim/2] (numpy, cached).

    h_offset/w_offset support context-parallel shards that own a spatial
    sub-rectangle (reference shards precomputed freqs, rope_3d.py:91-96).
    t_positions: explicit temporal grid (len f) overriding 0..f-1 — the
    avatar ref-image mode rotates the ref frame at its ORIGINAL index
    (avatar/rope_3d.py:76-77 grid_t = [frame_index, 0..N-ref-1]).
    """
    dim_t, dim_h, dim_w = rope_3d_split(head_dim)
    tpos = (np.asarray(t_positions, np.float64) if t_positions is not None
            else np.arange(f))
    assert tpos.shape[0] == f, (tpos.shape, f)
    ang_t = _freqs_1d(tpos, dim_t, theta)                    # [f, dim_t/2]
    ang_h = _freqs_1d(np.arange(h_offset, h_offset + h), dim_h, theta)
    ang_w = _freqs_1d(np.arange(w_offset, w_offset + w), dim_w, theta)
    out = np.concatenate([
        np.broadcast_to(ang_t[:, None, None, :], (f, h, w, dim_t // 2)),
        np.broadcast_to(ang_h[None, :, None, :], (f, h, w, dim_h // 2)),
        np.broadcast_to(ang_w[None, None, :, :], (f, h, w, dim_w // 2)),
    ], axis=-1).reshape(f * h * w, head_dim // 2)
    return out  # float64 (cos/sin taken in fp64, then cast — matches the
    # reference's float64 rope_params, model.py:31-39)


def rope_cos_sin(f: int, h: int, w: int, head_dim: int,
                 theta: float = 10000.0, h_offset: int = 0,
                 w_offset: int = 0, t_positions: Optional[tuple] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ang = rope_3d_angles(f, h, w, head_dim, theta, h_offset, w_offset,
                         t_positions)
    return (jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(np.sin(ang).astype(np.float32)))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               out_dtype=None) -> jnp.ndarray:
    """Rotate x [B, S, H, D] by per-token angles cos/sin [S, D/2].

    Interleaved-pair convention: (x_even, x_odd) -> (x_even*cos - x_odd*sin,
    x_even*sin + x_odd*cos), matching complex multiply in the reference
    (model.py:55-65). Computed fp32, cast to out_dtype (reference returns
    .float(); we keep compute dtype for the matmuls)."""
    odtype = out_dtype or x.dtype
    b, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, d // 2, 2)
    xe, xo = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    si = sin[None, :, None, :]
    ye = xe * c - xo * si
    yo = xe * si + xo * c
    y = jnp.stack([ye, yo], axis=-1).reshape(b, s, h, d)
    return y.astype(odtype)


# ------------------------------------------------------------- fused q+k


def _rope_qk_kernel(q_ref, k_ref, cf_ref, sf_ref, qo_ref, ko_ref):
    """One-pass rotation of a (q, k) block pair. The pair swap
    (x0,x1,..) -> (x1,x0,..) is two lane rolls + a parity select (Pallas TPU
    cannot lower rev/strided slices on the lane axis)."""
    from jax.experimental.pallas import tpu as pltpu
    cf = cf_ref[:][:, None, :]
    sf = sf_ref[:][:, None, :]
    d = q_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    even = (lane % 2) == 0
    for src, dst in ((q_ref, qo_ref), (k_ref, ko_ref)):
        x = src[0].astype(jnp.float32)
        sw = jnp.where(even, pltpu.roll(x, d - 1, 2), pltpu.roll(x, 1, 2))
        dst[0] = (x * cf + sw * sf).astype(dst.dtype)


def _pick_block_s(s: int, hi: int = 520) -> int:
    """Largest divisor of s in [104, hi] that is a multiple of 8.
    (520x8 blocks verified on v5e for bf16 inputs; 1040-row blocks crash
    Mosaic. fp32 inputs double every tile, so callers halve ``hi`` — a
    520-row fp32 tile set blew the 16 MB scoped-vmem budget at the LongCat
    480p shape, 32 heads x 20280 tokens.)"""
    best = 0
    for cand in range(104, hi + 1, 8):
        if s % cand == 0:
            best = cand
    return best


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_s",
                                             "block_h", "interpret"))
def _rope_qk_pallas(q, k, cf, sf, *, out_dtype, block_s, block_h,
                    interpret=False):
    from jax.experimental import pallas as pl
    b, s, h, d = q.shape
    grid = (b, s // block_s, h // block_h)
    spec = pl.BlockSpec((1, block_s, block_h, d),
                        lambda b, si, hi: (b, si, hi, 0))
    tspec = pl.BlockSpec((block_s, d), lambda b, si, hi: (si, 0))
    return pl.pallas_call(
        _rope_qk_kernel, grid=grid,
        in_specs=[spec, spec, tspec, tspec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, out_dtype),
                   jax.ShapeDtypeStruct(k.shape, out_dtype)],
        interpret=interpret,
    )(q, k, cf, sf)


def apply_rope_qk(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
                  sin: jnp.ndarray, out_dtype=None, interpret=None):
    """Rotate q and k [B, S, H, D] in one fused device pass.

    On TPU (when the shape tiles cleanly) this runs a single Pallas kernel
    that is bitwise-identical to apply_rope but ~2x faster: one HBM
    read+write per tensor instead of XLA's strided deinterleave passes.
    Falls back to apply_rope elsewhere (CPU tests, odd shapes); pass
    interpret=True to force the kernel in Pallas interpret mode so CPU
    tests exercise it."""
    b, s, h, d = q.shape
    hi = 520 if jnp.dtype(q.dtype).itemsize <= 2 else 260
    block_s = _pick_block_s(s, hi=hi)
    if interpret:
        on_tpu = True  # explicit request: run the kernel in interpret mode
    else:
        interpret = False  # None and False both mean backend-dispatch
        on_tpu = jax.default_backend() == "tpu"
    usable = (on_tpu and q.shape == k.shape
              and block_s > 0 and h % 8 == 0 and d % 128 == 0)
    if not usable:
        return (apply_rope(q, cos, sin, out_dtype=out_dtype),
                apply_rope(k, cos, sin, out_dtype=out_dtype))
    odtype = out_dtype or q.dtype
    cf = jnp.repeat(cos, 2, axis=-1)
    sgn = jnp.tile(jnp.asarray([-1.0, 1.0], cos.dtype), d // 2)
    sf = jnp.repeat(sin, 2, axis=-1) * sgn
    return _rope_qk_pallas(q, k, cf, sf, out_dtype=odtype,
                           block_s=block_s, block_h=8, interpret=interpret)
