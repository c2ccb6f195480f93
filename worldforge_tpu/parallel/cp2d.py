"""2D spatial (H x W) context parallelism.

Behavioral reference: longcat context_parallel/context_parallel_util.py
:84-243 — latents are sharded over a 2D spatial grid with near-square rank
factorization (`get_optimal_split` :238-243), split after the x_embedder and
gathered before unpatchify (longcat_video_dit.py:329-332, 359-360), with
CP-sharded RoPE tables (rope_3d.py:91-96) and Ulysses all-to-all inside
attention.

TPU-native: a 4-axis mesh (dp, fsdp, sp_h, sp_w); token tensors viewed as
[B, T, H, W, C] shard H on sp_h and W on sp_w; attention runs Ulysses over
both axes at once (heads split across sp_h*sp_w); per-shard RoPE tables come
from rope_cos_sin's h/w offsets.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from worldforge_tpu.core.mesh import AXIS_DP, AXIS_FSDP
from worldforge_tpu.ops.attention import attention

AXIS_SP_H = "sp_h"
AXIS_SP_W = "sp_w"


def get_optimal_split(n: int) -> Tuple[int, int]:
    """Near-square factorization (a, b), a*b = n, a <= b
    (context_parallel_util.py:238-243)."""
    a = int(math.isqrt(n))
    while n % a != 0:
        a -= 1
    return min(a, n // a), max(a, n // a)


def make_mesh_2d(dp: int = 1, fsdp: int = 1, sp_h: int = 1, sp_w: int = 1,
                 devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = dp * fsdp * sp_h * sp_w
    dev = np.asarray(devices[:n]).reshape(dp, fsdp, sp_h, sp_w)
    return Mesh(dev, (AXIS_DP, AXIS_FSDP, AXIS_SP_H, AXIS_SP_W))


def split_cp_2d(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Constrain [B, T, H, W, C] to the 2D spatial sharding
    (split_tensor_in_cp_2d :91-121 — under GSPMD a sharding constraint)."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(AXIS_DP, None, AXIS_SP_H, AXIS_SP_W, None)))


def gather_cp_2d(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Gather back to replicated-spatial (GatherFunction2D :142-184)."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(AXIS_DP, None, None, None, None)))


def ulysses_attention_2d(q, k, v, *, mesh: Mesh, impl: str = "auto"):
    """Self-attention over [B, T, H, W, nh, D] sharded (sp_h, sp_w) on
    (H, W). Heads scatter across BOTH sp axes; each shard then attends over
    the full (T*H*W) sequence for its head group."""
    sph = mesh.shape[AXIS_SP_H]
    spw = mesh.shape[AXIS_SP_W]
    if sph * spw == 1:
        b, t, hh, ww, nh, d = q.shape
        fl = lambda x: x.reshape(b, t * hh * ww, nh, d)
        return attention(fl(q), fl(k), fl(v), impl=impl).reshape(q.shape)
    assert q.shape[4] % (sph * spw) == 0, (
        f"head count {q.shape[4]} must be divisible by "
        f"sp_h*sp_w={sph * spw}")

    spec = P(AXIS_DP, None, AXIS_SP_H, AXIS_SP_W, None, None)

    def inner(ql, kl, vl):
        b, t, hl, wl, nh, d = ql.shape

        def a2a_in(x):
            # scatter heads over sp_h then sp_w; gather the spatial dims
            x = jax.lax.all_to_all(x, AXIS_SP_H, split_axis=4,
                                   concat_axis=2, tiled=True)
            x = jax.lax.all_to_all(x, AXIS_SP_W, split_axis=4,
                                   concat_axis=3, tiled=True)
            bb, tt, hf, wf, nhl, dd = x.shape
            return x.reshape(bb, tt * hf * wf, nhl, dd), (tt, hf, wf)

        def a2a_out(x, dims):
            tt, hf, wf = dims
            x = x.reshape(x.shape[0], tt, hf, wf, x.shape[2], x.shape[3])
            x = jax.lax.all_to_all(x, AXIS_SP_W, split_axis=3,
                                   concat_axis=4, tiled=True)
            x = jax.lax.all_to_all(x, AXIS_SP_H, split_axis=2,
                                   concat_axis=4, tiled=True)
            return x

        qf, dims = a2a_in(ql)
        kf, _ = a2a_in(kl)
        vf, _ = a2a_in(vl)
        o = attention(qf, kf, vf, impl=impl)
        return a2a_out(o, dims)

    return shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)


def cross_attention_2d(q, k, v, *, mesh: Mesh, impl: str = "auto"):
    """Cross-attention with 2D-spatially-sharded queries: q [B, T, H, W, nh,
    D] sharded (sp_h, sp_w) on (H, W); k/v [B, Lc, nh, D] replicated (text/
    CLIP context). Each token attends independently to the full context, so
    every shard runs plain attention on its local tokens — zero collectives
    (the reference computes cross-attn on the CP-split stream the same way,
    longcat blocks.py:68-124). Exact vs attending from the gathered stream."""
    qspec = P(AXIS_DP, None, AXIS_SP_H, AXIS_SP_W, None, None)
    kvspec = P(AXIS_DP, None, None, None)

    def inner(ql, kl, vl):
        b, t, hl, wl, nh, d = ql.shape
        o = attention(ql.reshape(b, t * hl * wl, nh, d), kl, vl, impl=impl)
        return o.reshape(ql.shape)

    return shard_map(inner, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
                     out_specs=qspec, check_vma=False)(q, k, v)
