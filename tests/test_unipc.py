"""UniPC flow-sigma solver vs an independent fp64 oracle of the reference
equations (scheduling_unipc_multistep_clean.py:816-823, 978-1099)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.sampling.unipc import (
    FlowUniPCSchedule, add_noise, dsg_extrapolate, flow_pred_x0,
    make_flow_unipc_schedule, unip_update)


def test_flow_sigma_schedule_values():
    s = make_flow_unipc_schedule(50, shift=5.0)
    # sigma_0 should be the largest (= shift*s/(1+(shift-1)s) at s=1-1/1000)
    x = 1.0 - 1.0 / 1000.0
    expected0 = 5.0 * x / (1.0 + 4.0 * x)
    assert abs(s.sigmas[0] - expected0) < 1e-12
    assert s.sigmas[-1] == 0.0
    assert np.all(np.diff(s.sigmas) < 0)  # strictly decreasing
    # reference casts timesteps to int64 (set_timesteps :826-827)
    np.testing.assert_allclose(s.timesteps,
                               np.floor(s.sigmas[:-1] * 1000.0))
    np.testing.assert_array_equal(s.resample_timesteps,
                                  s.timesteps.astype(np.int64))


def _oracle_unip(sigmas, i, x, m0, m1, order):
    """Direct fp64 transcription of the UniP-bh2 predictor equations."""
    s0, st = sigmas[i], sigmas[i + 1]
    a_t, a_s0 = 1 - st, 1 - s0

    def lam(s):
        return math.inf if s == 0 else math.log(1 - s) - math.log(s)

    h = lam(st) - lam(s0)
    hh = -h
    phi1 = math.expm1(hh) if math.isfinite(hh) else -1.0
    b_h = phi1  # bh2
    x_t_ = st / s0 * x - a_t * phi1 * m0
    if order == 1:
        return x_t_
    l_s1 = lam(sigmas[i - 1])
    rk = (l_s1 - lam(s0)) / h
    d1 = (m1 - m0) / rk
    return x_t_ - a_t * b_h * 0.5 * d1


@pytest.mark.parametrize("i,order", [(0, 1), (1, 2), (25, 2), (48, 2), (49, 1)])
def test_unip_update_matches_oracle(rng, i, order):
    s = make_flow_unipc_schedule(50, shift=5.0)
    x = rng.standard_normal((2, 4, 3, 4, 4))
    m0 = rng.standard_normal(x.shape)
    m1 = rng.standard_normal(x.shape)
    out = unip_update(s, i, order, jnp.asarray(x, jnp.float32),
                      jnp.asarray(m0, jnp.float32), jnp.asarray(m1, jnp.float32))
    ref = _oracle_unip(s.sigmas, i, x, m0, m1, order)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_final_step_returns_x0():
    """At sigma_t=0 the order-1 update must return exactly m0 (x0)."""
    s = make_flow_unipc_schedule(10, shift=5.0)
    x = jnp.ones((1, 2, 2))
    m0 = jnp.full((1, 2, 2), 3.0)
    out = unip_update(s, 9, 1, x, m0)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)


def test_pred_x0_and_add_noise_inverse(rng):
    """x0 = x - sigma*v and re-noising: add_noise(x0, eps) at the same step
    then converting with the true v recovers x0."""
    s = make_flow_unipc_schedule(20, shift=3.0)
    i = 7
    x0 = jnp.asarray(rng.standard_normal((1, 4, 2, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    x_noisy = add_noise(s, i, x0, eps)
    # flow model's ground-truth velocity: v = eps - x0 so that
    # x_noisy - sigma*v = (1-s) x0 + s e - s(e - x0) = x0
    v = eps - x0
    rec = flow_pred_x0(s, i, v, x_noisy)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-5)


def test_dsg_identity_when_equal(rng):
    """theta=0 between identical predictions -> better == good."""
    g = jnp.asarray(rng.standard_normal((1, 4, 4)), jnp.float32)
    out = dsg_extrapolate(g, g, omega=4.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(g), atol=1e-5)


def test_dsg_orthogonal_oracle():
    """Hand-checked case: orthogonal good/worse, equal norms."""
    g = jnp.asarray([[1.0, 0.0]], jnp.float32)
    w = jnp.asarray([[0.0, 1.0]], jnp.float32)
    # cos=0, sin=1, ratio=1 -> better = g + omega*(g - 0) = (1+omega)*g
    out = dsg_extrapolate(g, w, omega=2.0)
    np.testing.assert_allclose(np.asarray(out), [[3.0, 0.0]], atol=1e-5)


def test_order_for_step():
    s = make_flow_unipc_schedule(50)
    assert s.order_for_step(0, 0) == 1       # first step: no history
    assert s.order_for_step(1, 1) == 2
    assert s.order_for_step(25, 2) == 2
    assert s.order_for_step(49, 2) == 1      # lower_order_final
