"""Ring attention parity vs unsharded reference on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from worldforge_tpu.core.mesh import make_mesh
from worldforge_tpu.ops.attention import sdpa_reference
from worldforge_tpu.parallel.ring import ring_attention


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_reference(rng, sp):
    mesh = make_mesh(dp=1, fsdp=1, sp=sp)
    b, s, h, d = 1, 64, 3, 16  # heads NOT divisible by sp: ring handles it
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    ref = sdpa_reference(q, k, v)
    with mesh:
        shd = NamedSharding(mesh, P("dp", "sp", None, None))
        out = jax.jit(lambda a, b_, c: ring_attention(a, b_, c, mesh=mesh),
                      in_shardings=(shd, shd, shd))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_extreme_logits(rng):
    """LSE correction must stay stable with large score magnitudes."""
    mesh = make_mesh(dp=1, fsdp=1, sp=4)
    q = jnp.asarray(rng.standard_normal((1, 32, 2, 8)) * 30, jnp.float32)
    ref = sdpa_reference(q, q, q)
    with mesh:
        out = jax.jit(lambda a: ring_attention(a, a, a, mesh=mesh))(q)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
