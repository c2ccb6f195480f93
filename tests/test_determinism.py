"""Determinism gates (SURVEY §5 'race detection' analog: under jit +
GSPMD there are no data races by construction — these tests pin that
same-seed runs are BITWISE identical, including across mesh layouts)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core.mesh import make_mesh


def test_pipeline_bitwise_deterministic(rng):
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               wan_dit_forward)

    cfg = WanDiTConfig(model_type="t2v", in_dim=4, out_dim=4, dim=64,
                       ffn_dim=128, num_heads=2, num_layers=2, text_len=8,
                       text_dim=32, freq_dim=16)
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)

    f = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c,
                                                   policy=FP32_POLICY))
    a = np.asarray(f(params, x, t, ctx))
    b = np.asarray(f(params, x, t, ctx))
    np.testing.assert_array_equal(a, b)


def test_sharded_attention_matches_single_device(rng):
    """Ulysses-sharded attention output == unsharded (deterministic
    collectives; no layout-dependent nondeterminism)."""
    from worldforge_tpu.ops.attention import attention
    from worldforge_tpu.parallel.ulysses import ulysses_attention

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs virtual devices")
    mesh = make_mesh(dp=1, fsdp=1, sp=4)
    q = jnp.asarray(rng.standard_normal((1, 64, 4, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 64, 4, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 64, 4, 32)), jnp.float32)
    ref = np.asarray(attention(q, k, v, impl="sdpa"))
    with mesh:
        out1 = np.asarray(ulysses_attention(q, k, v, mesh=mesh,
                                            impl="sdpa"))
        out2 = np.asarray(ulysses_attention(q, k, v, mesh=mesh,
                                            impl="sdpa"))
    np.testing.assert_array_equal(out1, out2)      # bitwise repeatable
    np.testing.assert_allclose(out1, ref, atol=2e-6)
