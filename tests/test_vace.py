"""VACE model tests (tiny, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.wan.vace import VaceConfig, init_vace, vace_forward


@pytest.fixture(scope="module")
def vace():
    cfg = VaceConfig.tiny()
    params = init_vace(jax.random.key(0), cfg, dtype=jnp.float32)
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.key(9), params["head"]["head"]["w"].shape, jnp.float32)
    return cfg, params


def _inputs(cfg, rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((1, cfg.vace_in_dim, 3, 8, 8)),
                     jnp.float32)
    ctx = jnp.asarray(rng.standard_normal(
        (1, cfg.base.text_len, cfg.base.text_dim)), jnp.float32)
    t = jnp.asarray([500.0])
    return x, vc, ctx, t


def test_vace_layers_default():
    cfg = VaceConfig.tiny()  # base tiny has 2 layers
    assert cfg.layers == (0,)
    assert 0 in cfg.layers  # reference asserts 0 in vace_layers


def test_vace_forward_shapes(vace, rng):
    cfg, params = vace
    x, vc, ctx, t = _inputs(cfg, rng)
    out = vace_forward(params, cfg, x, t, vc, ctx)
    assert out.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_vace_zero_init_hints_match_base(vace, rng):
    """With zero-init before/after projections, hints are zero -> the VACE
    forward must equal the base t2v forward (the adapter starts as a
    no-op, vace_model.py:25-31)."""
    from worldforge_tpu.models.wan.dit import wan_dit_forward
    cfg, params = vace
    x, vc, ctx, t = _inputs(cfg, rng)
    out_vace = vace_forward(params, cfg, x, t, vc, ctx)
    out_base = wan_dit_forward(params, cfg.base, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_vace), np.asarray(out_base),
                               atol=1e-5)


def test_vace_context_scale_controls_hints(vace, rng):
    cfg, params = vace
    x, vc, ctx, t = _inputs(cfg, rng)
    # activate the adapter
    params = jax.tree_util.tree_map(lambda p: p, params)
    blk0 = params["vace_blocks"][0]
    blk0["after_proj"] = {"w": 0.05 * jax.random.normal(
        jax.random.key(3), blk0["after_proj"]["w"].shape, jnp.float32),
        "b": jnp.zeros_like(blk0["after_proj"]["b"])}
    o0 = vace_forward(params, cfg, x, t, vc, ctx, vace_context_scale=0.0)
    o1 = vace_forward(params, cfg, x, t, vc, ctx, vace_context_scale=1.0)
    o2 = vace_forward(params, cfg, x, t, vc, ctx, vace_context_scale=2.0)
    assert np.abs(np.asarray(o1 - o0)).max() > 1e-5
    # hints enter the LAST vace layer linearly only if no further blocks
    # follow; here just require monotone growth of the perturbation
    d1 = np.abs(np.asarray(o1 - o0)).max()
    d2 = np.abs(np.asarray(o2 - o0)).max()
    assert d2 > d1
