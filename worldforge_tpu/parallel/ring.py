"""Ring attention over the sp mesh axis (ppermute KV rotation + LSE
correction).

Behavioral reference: the reference reaches ring attention two ways — the
xfuser Ulysses+ring hybrid (wan/distributed/xdit_context_parallel.py:213) and
in-repo ring scaffolding for BSA (NCCL P2P KV exchange communicate.py:4-43 +
log-sum-exp output correction bsa_interface.py:491-529). TPU-native: KV
shards rotate around the ring with jax.lax.ppermute riding ICI; partial
attention outputs merge with the standard running-max/LSE rescale:

  m = max(m_a, m_b); out = (e^{m_a-m} l_a out_a + e^{m_b-m} l_b out_b) / l
  l = e^{m_a-m} l_a + e^{m_b-m} l_b
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from worldforge_tpu.core.mesh import AXIS_DP, AXIS_SP


def _partial_attention(q, k, v, scale):
    """Returns (out [B,S,H,D] fp32 normalized, m [B,H,S], l [B,H,S]) for
    cross-shard LSE correction. Runs the Pallas flash kernel per KV shard
    (interpret mode off-TPU) — never materializes the [S_local, S_local]
    score matrix, so per-chip memory stays O(S/sp)."""
    from worldforge_tpu.ops.flash_attention import flash_attention
    out, m, l = flash_attention(q, k, v, scale=scale, return_lse=True)
    return out.astype(jnp.float32), m, l


def _merge(out_a, m_a, l_a, out_b, m_b, l_b):
    """LSE-corrected merge of two partial attention results
    (flash_attn_fwd_softmax_lse_correction semantics,
    bsa_interface.py:491-529)."""
    m = jnp.maximum(m_a, m_b)
    wa = jnp.exp(m_a - m) * l_a
    wb = jnp.exp(m_b - m) * l_b
    l = wa + wb
    ca = (wa / jnp.maximum(l, 1e-20)).transpose(0, 2, 1)[..., None]
    cb = (wb / jnp.maximum(l, 1e-20)).transpose(0, 2, 1)[..., None]
    return out_a * ca + out_b * cb, m, l


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   mesh: Mesh, scale=None, dp_axis: str = AXIS_DP,
                   sp_axis: str = AXIS_SP) -> jnp.ndarray:
    """Full self-attention over [B, S, H, D] globally sharded on S.

    Unlike Ulysses (which shards heads during attention), the ring keeps
    queries local and rotates KV shards — no head-divisibility constraint,
    memory O(S/sp) per chip."""
    sp = mesh.shape[sp_axis]
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if sp == 1:
        from worldforge_tpu.ops.attention import attention
        return attention(q, k, v, scale=scale)

    spec = P(dp_axis, sp_axis, None, None)

    def inner(ql, kl, vl):
        out, m, l = _partial_attention(ql, kl, vl, scale)
        perm = [(i, (i + 1) % sp) for i in range(sp)]

        def body(step, carry):
            out, m, l, kr, vr = carry
            kr = jax.lax.ppermute(kr, sp_axis, perm)
            vr = jax.lax.ppermute(vr, sp_axis, perm)
            o2, m2, l2 = _partial_attention(ql, kr, vr, scale)
            out, m, l = _merge(out, m, l, o2, m2, l2)
            return out, m, l, kr, vr

        out, m, l, _, _ = jax.lax.fori_loop(
            0, sp - 1, body, (out, m, l, kl, vl))
        return out.astype(ql.dtype)

    return shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)
