"""Context-parallel block-sparse attention (ring KV + per-rank indices).

Behavioral reference: longcat block_sparse_attention/bsa_interface.py:
  - make_block_indices_varlen_cp_list (:464-489): the globally-selected
    block indices are partitioned by which rank owns each kv block
  - flash_attn_fwd_softmax_lse_correction (:491-529): partial outputs from
    each rank's kv shard merge via running-max/LSE rescaling
  - communicate.py:4-43: NCCL P2P kv exchange -> here a `ppermute` ring

TPU-first layout: q and kv are sharded over the chunk-contiguous sequence
axis on the `sp` mesh axis. Selection stays GLOBAL and exact: each rank
pools its local kv chunks (128x cheaper than the full kv), all-gathers the
pooled keys over ICI, and scores its local query chunks against every kv
chunk — identical selection to the single-chip path. The ring then rotates
the raw kv shard; at each step the per-rank index table is compacted to
the blocks owned by the current shard (stable argsort on the membership
mask) and the Pallas BSA kernel runs with return_lse for the merge.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from worldforge_tpu.core.mesh import AXIS_SP
from worldforge_tpu.ops.bsa import (CHUNK_K, CHUNK_Q, _bsa_bhsd_grouped,
                                    mean_pool_chunks,
                                    rearrange_blocks_to_thw,
                                    rearrange_thw_to_blocks,
                                    select_blocks_from_pooled)


def _merge_flat(o_a, m_a, l_a, o_b, m_b, l_b):
    """LSE merge on [BH, S, D] outs with [BH, S] stats
    (bsa_interface.py:491-529)."""
    m = jnp.maximum(m_a, m_b)
    wa = jnp.exp(m_a - m) * l_a
    wb = jnp.exp(m_b - m) * l_b
    l = jnp.maximum(wa + wb, 1e-20)
    return (o_a.astype(jnp.float32) * (wa / l)[..., None]
            + o_b.astype(jnp.float32) * (wb / l)[..., None], m, wa + wb)


def bsa_attention_3d_cp(q, k, v, latent_shape_q, latent_shape_k, *,
                        mesh: Mesh, sp_axis: str = AXIS_SP,
                        sparsity: Optional[float] = 0.875,
                        cdf_threshold: Optional[float] = None,
                        chunk_3d_shape_q=(4, 4, 8),
                        chunk_3d_shape_k=(4, 4, 8),
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """Sharded BSA over [B, S, H, D] (global arrays; the chunk-contiguous
    sequence is split across `sp_axis`). Matches `bsa_attention_3d`'s
    selection exactly; output differs only by fp accumulation order."""
    sp = mesh.shape[sp_axis]
    b, sq, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    qb = rearrange_thw_to_blocks(q, latent_shape_q, chunk_3d_shape_q)
    kb = rearrange_thw_to_blocks(k, latent_shape_k, chunk_3d_shape_k)
    vb = rearrange_thw_to_blocks(v, latent_shape_k, chunk_3d_shape_k)

    def flat(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = flat(qb), flat(kb), flat(vb)
    nq_tot, nk_tot = qf.shape[1] // CHUNK_Q, kf.shape[1] // CHUNK_K
    assert nq_tot % sp == 0 and nk_tot % sp == 0, \
        f"chunk counts ({nq_tot}, {nk_tot}) must divide sp={sp}"
    nk_local = nk_tot // sp
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def inner(ql, kl, vl):
        me = jax.lax.axis_index(sp_axis)
        bh = ql.shape[0]
        qc = mean_pool_chunks(ql.astype(jnp.float32), CHUNK_Q)
        kc_local = mean_pool_chunks(kl.astype(jnp.float32), CHUNK_K)
        kc = jax.lax.all_gather(kc_local, sp_axis, axis=1, tiled=True)
        indices, counts = select_blocks_from_pooled(
            qc, kc, sparsity=sparsity, cdf_threshold=cdf_threshold,
            head_dim=d)
        nq_l, kmax = indices.shape[1:]
        valid = (jnp.arange(kmax)[None, None] < counts[..., None])

        out = m = l = None
        kr, vr = kl, vl
        for r in range(sp):
            # ppermute sends i -> i+1, so after r hops the local buffer
            # holds rank (me - r)'s shard
            owner = (me - r) % sp
            base = owner * nk_local
            member = valid & (indices >= base) & (indices < base + nk_local)
            # compact member slots to the front (stable) and rebase
            order = jnp.argsort(jnp.where(member, 0, 1), axis=-1,
                                stable=True)
            idx_r = jnp.take_along_axis(indices - base, order, axis=-1)
            mem_r = jnp.take_along_axis(member, order, axis=-1)
            idx_r = jnp.where(mem_r, idx_r, 0).astype(jnp.int32)
            cnt_r = member.sum(axis=-1).astype(jnp.int32)
            o_r, m_r, l_r = _bsa_bhsd_grouped(
                ql, kr, vr, idx_r.reshape(bh, nq_l * kmax), cnt_r,
                scale=scale, kmax=kmax, interpret=interpret,
                return_lse=True)
            if out is None:
                out, m, l = o_r.astype(jnp.float32), m_r, l_r
            else:
                out, m, l = _merge_flat(out, m, l, o_r, m_r, l_r)
            if r < sp - 1:
                kr = jax.lax.ppermute(kr, sp_axis, perm)
                vr = jax.lax.ppermute(vr, sp_axis, perm)
        return out.astype(ql.dtype)

    spec = P(None, sp_axis, None)
    of = shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)(qf, kf, vf)
    ob = of.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return rearrange_blocks_to_thw(ob, latent_shape_q, chunk_3d_shape_q)
