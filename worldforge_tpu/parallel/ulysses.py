"""Ulysses sequence-parallel attention (all-to-all head<->sequence reshuffle).

Behavioral reference: longcat context_parallel/ulysses_wrapper.py:7-116
(NCCL all_to_all_single around any attention impl) and the xDiT USP path
(wan/distributed/xdit_context_parallel.py:183-226). TPU-native: shard_map +
jax.lax.all_to_all over the ``sp`` mesh axis riding ICI; the inner attention
is the Pallas flash kernel (TPU) or the fp32 einsum reference (CPU dryrun).

Semantics: tokens sharded [B, S/sp, H, D] -> all_to_all -> heads sharded
[B, S, H/sp, D] -> full-sequence attention per head group -> inverse.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from worldforge_tpu.core.mesh import AXIS_DP, AXIS_SP
from worldforge_tpu.ops.attention import attention


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                      mesh: Mesh, kv_lens=None, impl: str = "auto",
                      dp_axis: str = AXIS_DP, sp_axis: str = AXIS_SP
                      ) -> jnp.ndarray:
    """Self-attention over globally [B, S, H, D] tensors sharded on S.

    Must be called under jit with the mesh active; q/k/v carry (or are
    constrained to) P(dp, sp, None, None) sharding. H must be divisible by
    the sp axis size.
    """
    sp = mesh.shape[sp_axis]
    if sp == 1:
        return attention(q, k, v, kv_lens=kv_lens, impl=impl)
    assert q.shape[2] % sp == 0, (
        f"heads {q.shape[2]} not divisible by sp={sp}")

    spec = P(dp_axis, sp_axis, None, None)

    def make_inner(lens_spec):
        def inner(ql, kl, vl, lens):
            # [B_l, S/sp, H, D] -> [B_l, S, H/sp, D] (scatter heads,
            # gather seq)
            def a2a_in(x):
                return jax.lax.all_to_all(x, sp_axis, split_axis=2,
                                          concat_axis=1, tiled=True)

            def a2a_out(x):
                return jax.lax.all_to_all(x, sp_axis, split_axis=1,
                                          concat_axis=2, tiled=True)

            # after a2a the kv sequence is fully gathered per shard, so
            # the global kv_lens padding mask applies unchanged
            o = attention(a2a_in(ql), a2a_in(kl), a2a_in(vl),
                          kv_lens=lens, impl=impl)
            return a2a_out(o)
        return inner

    if kv_lens is None:
        def inner0(ql, kl, vl):
            return make_inner(None)(ql, kl, vl, None)
        return shard_map(inner0, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
    lens_spec = P(dp_axis)
    return shard_map(make_inner(lens_spec), mesh=mesh,
                     in_specs=(spec, spec, spec, lens_spec),
                     out_specs=spec, check_vma=False)(q, k, v, kv_lens)


def sequence_local_cross_attention(q: jnp.ndarray, k: jnp.ndarray,
                                   v: jnp.ndarray, *, mesh: Mesh,
                                   impl: str = "auto",
                                   dp_axis: str = AXIS_DP,
                                   sp_axis: str = AXIS_SP) -> jnp.ndarray:
    """Cross-attention with q sharded on sequence and small replicated k/v
    (text/CLIP context): no communication — each shard attends locally
    (matches the reference where cross-attn is outside the CP wrapper)."""
    sp = mesh.shape[sp_axis]
    if sp == 1:
        return attention(q, k, v, impl=impl)
    qspec = P(dp_axis, sp_axis, None, None)
    kvspec = P(dp_axis, None, None, None)

    def inner(ql, kl, vl):
        return attention(ql, kl, vl, impl=impl)

    return shard_map(inner, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
                     out_specs=qspec, check_vma=False)(q, k, v)
