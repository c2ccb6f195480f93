"""Context-parallel BSA: ring KV + per-rank index partitioning vs the
single-device path (8 virtual CPU devices, interpret-mode kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.core.mesh import make_mesh
from worldforge_tpu.ops.bsa import bsa_attention_3d
from worldforge_tpu.parallel.bsa_cp import bsa_attention_3d_cp


@pytest.mark.parametrize("sp,sparsity,cdf", [(4, 0.5, None), (8, None, 0.6)])
def test_bsa_cp_matches_single_device(rng, sp, sparsity, cdf):
    if len(jax.devices()) < sp:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(dp=len(jax.devices()) // sp, fsdp=1, sp=sp)
    grid = (8, 8, 16)   # 1024 tokens = 8 chunks of (4,4,8)
    s = grid[0] * grid[1] * grid[2]
    b, h, d = 1, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    ref = bsa_attention_3d(q, k, v, grid, grid, sparsity=sparsity,
                           cdf_threshold=cdf, impl="reference")
    got = bsa_attention_3d_cp(q, k, v, grid, grid, mesh=mesh,
                              sparsity=sparsity, cdf_threshold=cdf)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-8)
    assert rel < 2e-4, rel


def test_longcat_bsa_dispatches_cp(rng):
    """LongCat DiT with an sp>1 mesh + bsa_params routes through the
    ring-CP BSA and matches the single-device forward."""
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit,
                                                   longcat_dit_forward)

    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(dp=1, fsdp=1, sp=2)
    cfg = LongCatDiTConfig.tiny()
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    # latent grid (8, 4, 8) = 256 tokens = 2 chunks of (4,4,8)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 8, 16)), jnp.float32)
    t = jnp.asarray([700.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, cfg.caption_channels)),
                      jnp.float32)
    bsa = {"sparsity": 0.5}
    ref = longcat_dit_forward(params, cfg, x, t, ctx, policy=FP32_POLICY,
                              bsa_params=bsa)
    with mesh:
        got = longcat_dit_forward(params, cfg, x, t, ctx,
                                  policy=FP32_POLICY, mesh=mesh,
                                  bsa_params=bsa)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-8)
    assert rel < 2e-4, rel
