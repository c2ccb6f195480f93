"""Block-sparse attention: kernel vs dense-masked oracle; selection logic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.ops.bsa import (
    _bsa_bhsd, _bsa_reference, bsa_attention_3d, mean_pool_chunks,
    rearrange_blocks_to_thw, rearrange_thw_to_blocks, select_blocks)
from worldforge_tpu.ops.attention import sdpa_reference


def test_rearrange_roundtrip(rng):
    grid, chunk = (4, 4, 8), (2, 2, 4)
    s = 4 * 4 * 8
    x = jnp.asarray(rng.standard_normal((1, s, 2, 8)), jnp.float32)
    b = rearrange_thw_to_blocks(x, grid, chunk)
    back = rearrange_blocks_to_thw(b, grid, chunk)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # chunk-contiguity: first chunk of b == the (2,2,4) corner of the grid
    xg = np.asarray(x).reshape(4, 4, 8, 2, 8)
    corner = xg[:2, :2, :4].reshape(-1, 2, 8)
    np.testing.assert_array_equal(np.asarray(b[0, :16]), corner)


def test_mean_pool(rng):
    x = jnp.asarray(rng.standard_normal((2, 256, 8)), jnp.float32)
    p = mean_pool_chunks(x, 128)
    np.testing.assert_allclose(np.asarray(p[0, 0]),
                               np.asarray(x[0, :128].mean(0)), atol=1e-6)


def test_select_topk(rng):
    q = jnp.asarray(rng.standard_normal((1, 512, 16)), jnp.float32)
    idx, cnt = select_blocks(q, q, sparsity=0.5)
    assert idx.shape == (1, 4, 2) and (np.asarray(cnt) == 2).all()
    # self-attention pooled scores: own block should be among top picks for
    # a random-but-consistent q==k (diagonal dominance not guaranteed, so
    # just check index validity)
    assert np.asarray(idx).max() < 4 and np.asarray(idx).min() >= 0


def test_select_cdf_counts(rng):
    q = jnp.asarray(rng.standard_normal((1, 512, 16)), jnp.float32)
    idx, cnt = select_blocks(q, q, sparsity=None, cdf_threshold=0.99)
    c = np.asarray(cnt)
    # searchsorted(right) semantics: 0..nk-1 entries below the threshold
    assert ((0 <= c) & (c <= 4)).all()
    # threshold > 1 selects everything (cdf sums to 1)
    _, cnt_all = select_blocks(q, q, sparsity=None, cdf_threshold=1.01)
    assert (np.asarray(cnt_all) == 4).all()
    # combined: at least the top-k floor
    _, cnt_combo = select_blocks(q, q, sparsity=0.5, cdf_threshold=0.01)
    assert (np.asarray(cnt_combo) >= 2).all()


def test_bsa_kernel_matches_masked_oracle(rng):
    bh, nq, nk, d = 2, 3, 4, 32
    q = jnp.asarray(rng.standard_normal((bh, nq * 128, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, nk * 128, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, nk * 128, d)), jnp.float32)
    idx, cnt = select_blocks(q, k, sparsity=0.5)
    kmax = idx.shape[-1]
    out = _bsa_bhsd(q, k, v, idx.reshape(bh, -1), cnt, scale=d ** -0.5,
                    kmax=kmax, interpret=True)
    ref = _bsa_reference(q, k, v, idx, cnt, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_bsa_kernel_variable_counts(rng):
    bh, nq, nk, d = 1, 2, 4, 32
    q = jnp.asarray(rng.standard_normal((bh, nq * 128, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, nk * 128, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, nk * 128, d)), jnp.float32)
    # hand-built selection: row 0 uses 1 block, row 1 uses 3
    idx = jnp.asarray([[[2, 0, 1], [0, 3, 1]]], jnp.int32)
    cnt = jnp.asarray([[1, 3]], jnp.int32)
    out = _bsa_bhsd(q, k, v, idx.reshape(1, -1), cnt, scale=d ** -0.5,
                    kmax=3, interpret=True)
    ref = _bsa_reference(q, k, v, idx, cnt, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_bsa_full_selection_equals_dense(rng):
    """sparsity=0 (keep all blocks) must reproduce dense attention."""
    grid = (4, 8, 8)  # 256 tokens = 2 chunks of (2,4,8)=64... use 128 chunks
    b, h, d = 1, 2, 32
    s = 4 * 8 * 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    out = bsa_attention_3d(q, k, v, grid, grid, sparsity=0.0,
                           chunk_3d_shape_q=(2, 8, 8),
                           chunk_3d_shape_k=(2, 8, 8),
                           impl="pallas_interpret")
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_selection_matches_reference(rng):
    """Block selection vs the reference's pure-torch gating functions
    (bsa_interface.py:168-288; triton import stubbed)."""
    import pytest
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import import_longcat_dit
    import importlib

    import_longcat_dit()   # installs stubs + longcat packages
    import torch._dynamo
    torch._dynamo.config.suppress_errors = True   # @torch.compile -> eager
    bi = importlib.import_module(
        "longcat_video.block_sparse_attention.bsa_interface")

    import jax.numpy as jnp
    from worldforge_tpu.ops.bsa import mean_pool_chunks, select_blocks_from_pooled

    q = rng.standard_normal((2, 512, 64)).astype(np.float32)   # [BH, S, D]
    k = rng.standard_normal((2, 512, 64)).astype(np.float32)
    qt = torch.tensor(q)[None].transpose(0, 1)   # [B=2, H=1, S, D]? keep BH->B,H=1
    qt = torch.tensor(q).unsqueeze(1)            # [BH, 1, S, D]
    kt = torch.tensor(k).unsqueeze(1)
    with torch.no_grad():
        qc = bi.mean_pooling_compression(qt, 128)
        kc = bi.mean_pooling_compression(kt, 128)

    qc_j = mean_pool_chunks(jnp.asarray(q), 128)
    np.testing.assert_allclose(np.asarray(qc_j), qc[:, 0].numpy(), atol=1e-5)

    for sparsity, cdf in ((0.5, None), (None, 0.7), (0.5, 0.7)):
        with torch.no_grad():
            idx_r, len_r = bi.get_select_indices(qc, kc, sparsity, cdf)
        idx_g, len_g = select_blocks_from_pooled(
            np.asarray(qc[:, 0]), np.asarray(kc[:, 0]), sparsity=sparsity,
            cdf_threshold=cdf, head_dim=64)
        np.testing.assert_array_equal(np.asarray(len_g),
                                      len_r[:, 0].numpy())
        # indices must agree over the selected prefix
        lr = len_r[:, 0].numpy()
        for b in range(2):
            for qi in range(idx_r.shape[2]):
                n = int(lr[b, qi]) if lr.ndim == 2 else int(lr[b, qi])
                got = set(np.asarray(idx_g[b, qi, :n]).tolist())
                ref = set(idx_r[b, 0, qi, :n].numpy().tolist())
                assert got == ref, (sparsity, cdf, b, qi)


def test_bsa_gathered_equals_reference(rng):
    """The differentiable gathered-block form (the backward's recompute)
    must equal the dense-masked oracle bit-for-bit in fp32."""
    from worldforge_tpu.ops.bsa import _bsa_gathered

    bh, sq, d = 2, 512, 16
    q = jnp.asarray(rng.standard_normal((bh, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, sq, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, sq, d)), jnp.float32)
    idx, cnt = select_blocks(q, k, sparsity=0.5)
    a = np.asarray(_bsa_reference(q, k, v, idx, cnt, 0.25))
    b = np.asarray(_bsa_gathered(q, k, v, idx, cnt, 0.25))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_bsa_backward_matches_masked_oracle_grads(rng):
    """BSA backward (reference capability: Triton bwd at
    flash_attn_bsa_varlen_mask.py:289-946): gradients through
    bsa_attention_3d must equal autodiff through the dense-masked oracle
    with the SAME fixed selection (the hard top-k carries no gradient)."""
    from worldforge_tpu.ops.bsa import CHUNK_Q, _bsa_reference

    grid = (4, 4, 8)      # 128 tokens = 1 chunk of (4,4,8)... use 4 chunks
    grid = (8, 8, 8)      # 512 tokens -> 4 chunks of (4,4,8)
    s = 8 * 8 * 8
    b, h, d = 1, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    def loss(q, k, v):
        o = bsa_attention_3d(q, k, v, grid, grid, sparsity=0.5,
                             impl="reference")
        return jnp.sum((o - tgt) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    # oracle: same flat layout + FIXED selection, dense-masked autodiff
    from worldforge_tpu.ops.bsa import rearrange_thw_to_blocks
    import math as _m

    def flat(x):
        xb = rearrange_thw_to_blocks(x, grid, (4, 4, 8))
        return xb.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    qf, kf, vf = flat(q), flat(k), flat(v)
    idx, cnt = select_blocks(qf, kf, sparsity=0.5)

    def oracle_loss(q, k, v):
        of = _bsa_reference(flat(q), flat(k), flat(v), idx, cnt,
                            1.0 / _m.sqrt(d))
        ob = of.reshape(b, h, s, d).transpose(0, 2, 1, 3)
        from worldforge_tpu.ops.bsa import rearrange_blocks_to_thw
        o = rearrange_blocks_to_thw(ob, grid, (4, 4, 8))
        return jnp.sum((o - tgt) ** 2)

    oq, ok, ov = jax.grad(oracle_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(oq), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(ok), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ov), rtol=2e-4,
                               atol=2e-4)


def test_bsa_backward_through_pallas_interpret(rng):
    """The custom-vjp backward is independent of the forward impl: pallas
    (interpret on CPU) and reference forwards must give identical grads."""
    grid = (8, 8, 8)
    s = 512
    b, h, d = 1, 1, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    def make_loss(impl):
        def loss(q, k, v):
            o = bsa_attention_3d(q, k, v, grid, grid, sparsity=0.5,
                                 impl=impl)
            return jnp.sum(o * o)
        return loss

    g1 = jax.grad(make_loss("reference"))(q, k, v)
    g2 = jax.grad(make_loss("pallas_interpret"))(q, k, v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-4)


def test_bsa_zero_count_rows_output_zeros(rng):
    """Regression: a q chunk with count==0 (reachable via the CDF path)
    must output ZEROS in kernel, masked oracle, and gathered/backward
    forms alike — not the uniform attention an all-masked softmax
    degenerates to."""
    from worldforge_tpu.ops.bsa import _bsa_gathered

    bh, nq, nk, d = 1, 2, 4, 32
    q = jnp.asarray(rng.standard_normal((bh, nq * 128, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, nk * 128, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, nk * 128, d)), jnp.float32)
    idx = jnp.asarray([[[0, 0], [1, 3]]], jnp.int32)
    cnt = jnp.asarray([[0, 2]], jnp.int32)       # row 0: nothing selected
    out_k = np.asarray(_bsa_bhsd(q, k, v, idx.reshape(1, -1), cnt,
                                 scale=d ** -0.5, kmax=2, interpret=True))
    out_r = np.asarray(_bsa_reference(q, k, v, idx, cnt, d ** -0.5))
    out_g = np.asarray(_bsa_gathered(q, k, v, idx, cnt, d ** -0.5))
    assert np.all(out_k[0, :128] == 0.0)
    assert np.all(out_r[0, :128] == 0.0)
    assert np.all(out_g[0, :128] == 0.0)
    np.testing.assert_allclose(out_k, out_r, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(out_g, out_r, atol=2e-3, rtol=2e-3)
