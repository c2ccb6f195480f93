"""Multi-device tests on the 8-virtual-CPU mesh: Ulysses parity, FSDP
sharding, full dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from worldforge_tpu.core.mesh import make_mesh
from worldforge_tpu.ops.attention import sdpa_reference
from worldforge_tpu.parallel.sharding import fsdp_spec, shard_params_fsdp
from worldforge_tpu.parallel.ulysses import (sequence_local_cross_attention,
                                             ulysses_attention)


def test_ulysses_matches_unsharded(rng):
    mesh = make_mesh(dp=2, fsdp=1, sp=4)
    b, s, h, d = 2, 64, 8, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    ref = sdpa_reference(q, k, v)
    with mesh:
        shd = NamedSharding(mesh, P("dp", "sp", None, None))
        qs, ks, vs = (jax.device_put(x, shd) for x in (q, k, v))
        out = jax.jit(lambda a, b_, c: ulysses_attention(
            a, b_, c, mesh=mesh))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sequence_local_cross_attention_matches(rng):
    mesh = make_mesh(dp=1, fsdp=1, sp=4)
    b, sq, sk, h, d = 1, 32, 12, 4, 16
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    ref = sdpa_reference(q, k, v)
    with mesh:
        out = jax.jit(lambda a, b_, c: sequence_local_cross_attention(
            a, b_, c, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fsdp_spec_heuristic():
    assert fsdp_spec((128, 512), 4) == P(None, "fsdp")
    assert fsdp_spec((512, 128), 4) == P("fsdp", None)
    assert fsdp_spec((7, 13), 4) == P()  # nothing divisible
    # stacked layer axis skipped
    assert fsdp_spec((4, 128, 512), 4, skip_axes=1) == P(None, None, "fsdp")


def test_sharded_dit_matches_single_device(rng):
    """The Wan DiT forward must produce identical outputs with and without
    mesh sharding (Ulysses + FSDP + constraints)."""
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               wan_dit_forward)
    cfg = WanDiTConfig(model_type="i2v", in_dim=12, out_dim=4, dim=64,
                       ffn_dim=128, num_heads=4, num_layers=2, text_len=16,
                       text_dim=32, freq_dim=16)
    params = init_wan_dit(jax.random.key(0), cfg)
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.key(9), params["head"]["head"]["w"].shape, jnp.float32
    ).astype(params["head"]["head"]["w"].dtype)
    x = jax.random.normal(jax.random.key(1), (1, 4, 2, 8, 8), jnp.float32)
    y = jax.random.normal(jax.random.key(2), (1, 8, 2, 8, 8), jnp.float32)
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(3), (1, 16, 32), jnp.float32)
    clip = jax.random.normal(jax.random.key(4), (1, 257, 1280), jnp.float32)

    ref = wan_dit_forward(params, cfg, x, t, ctx, clip_fea=clip, y=y)

    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    with mesh:
        sp_params = shard_params_fsdp(params, mesh)
        out = jax.jit(lambda p, x, y: wan_dit_forward(
            p, cfg, x, t, ctx, clip_fea=clip, y=y, mesh=mesh))(sp_params, x, y)
    # sharded matmul/reduction order differs; allow small fp32 drift
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=0)


def test_full_dryrun_entrypoint():
    from worldforge_tpu.parallel.dryrun import run_dryrun
    run_dryrun(8)


def test_ulysses_kv_lens_matches_unsharded(rng):
    """Regression: kv_lens must survive onto the sharded (sp>1) path —
    padded keys get zero weight exactly as on one chip."""
    mesh = make_mesh(dp=2, fsdp=1, sp=4)
    b, s, h, d = 2, 64, 8, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    lens = jnp.asarray([40, 64], jnp.int32)
    ref = sdpa_reference(q, k, v, kv_lens=lens)
    with mesh:
        shd = NamedSharding(mesh, P("dp", "sp", None, None))
        qs, ks, vs = (jax.device_put(x, shd) for x in (q, k, v))
        ls = jax.device_put(lens, NamedSharding(mesh, P("dp")))
        out = jax.jit(lambda a, b_, c, le: ulysses_attention(
            a, b_, c, mesh=mesh, kv_lens=le))(qs, ks, vs, ls)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # and it must DIFFER from the unmasked result (the bug returned this)
    unmasked = sdpa_reference(q, k, v)
    assert float(jnp.abs(out - unmasked).max()) > 1e-3
