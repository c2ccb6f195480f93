"""Wan DiT structural + numeric tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.wan.dit import (
    WanDiTConfig, init_wan_dit, init_wan_dit_layer, patchify, unpatchify,
    sinusoidal_embedding_1d, wan_dit_forward, wan_dit_layer_forward)
from worldforge_tpu.ops.rope import rope_cos_sin


@pytest.fixture(scope="module")
def tiny():
    cfg = WanDiTConfig.tiny()
    params = init_wan_dit(jax.random.key(0), cfg)
    return cfg, params


def _inputs(cfg, f=3, h=8, w=8, b=1):
    kx, ky, kc, ki = jax.random.split(jax.random.key(1), 4)
    x = jax.random.normal(kx, (b, 16, f, h, w), jnp.float32)
    y = jax.random.normal(ky, (b, cfg.in_dim - 16, f, h, w), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jax.random.normal(kc, (b, cfg.text_len, cfg.text_dim), jnp.float32)
    clip = jax.random.normal(ki, (b, 257, cfg.clip_dim), jnp.float32)
    return x, y, t, ctx, clip


def test_patchify_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 4, 6, 8)), jnp.float32)
    tok = patchify(x, (1, 2, 2))
    assert tok.shape == (2, 4 * 3 * 4, 1 * 2 * 2 * 16)
    back = unpatchify(tok, (4, 3, 4), (1, 2, 2), 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_sinusoidal_embedding_matches_formula():
    dim, t = 32, jnp.asarray([0.0, 500.0])
    emb = np.asarray(sinusoidal_embedding_1d(dim, t))
    half = dim // 2
    freqs = 10000.0 ** (-np.arange(half) / half)
    ang = np.outer(np.asarray(t), freqs)
    ref = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
    np.testing.assert_allclose(emb, ref, atol=1e-5)
    np.testing.assert_allclose(emb[0], np.concatenate(
        [np.ones(half), np.zeros(half)]), atol=1e-6)


def test_forward_shapes_and_zero_head(tiny):
    cfg, params = tiny
    x, y, t, ctx, clip = _inputs(cfg)
    out = wan_dit_forward(params, cfg, x, t, ctx, clip_fea=clip, y=y)
    assert out.shape == (1, cfg.out_dim, 3, 8, 8)
    assert out.dtype == jnp.float32
    # head projection is zero-initialized (model.py:631) -> output must be 0
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_forward_nonzero_after_head_perturbation(tiny):
    cfg, params = tiny
    x, y, t, ctx, clip = _inputs(cfg)
    params = jax.tree_util.tree_map(lambda p: p, params)  # shallow copy
    params["head"] = dict(params["head"])
    params["head"]["head"] = {
        "w": jnp.ones_like(params["head"]["head"]["w"]) * 0.01,
        "b": params["head"]["head"]["b"],
    }
    out = wan_dit_forward(params, cfg, x, t, ctx, clip_fea=clip, y=y)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) > 0


def test_forward_jit_and_determinism(tiny):
    cfg, params = tiny
    x, y, t, ctx, clip = _inputs(cfg)
    f = jax.jit(lambda p, x, t, c, cf, y: wan_dit_forward(p, cfg, x, t, c,
                                                          clip_fea=cf, y=y))
    o1 = f(params, x, t, ctx, clip, y)
    o2 = f(params, x, t, ctx, clip, y)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_t2v_variant():
    cfg = WanDiTConfig.tiny(model_type="t2v")
    params = init_wan_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 16, 3, 8, 8), jnp.float32)
    t = jnp.asarray([100.0])
    ctx = jax.random.normal(jax.random.key(2), (1, cfg.text_len, cfg.text_dim))
    out = wan_dit_forward(params, cfg, x, t, ctx)
    assert out.shape == (1, 16, 3, 8, 8)
    assert "img_emb" not in params


def test_layer_forward_standalone(tiny):
    cfg, params = tiny
    f, h, w = 2, 4, 4
    seq = f * h * w
    x = jax.random.normal(jax.random.key(3), (1, seq, cfg.dim), jnp.float32)
    e0 = jax.random.normal(jax.random.key(4), (1, 6, cfg.dim), jnp.float32)
    ctx = jax.random.normal(jax.random.key(5), (1, 257 + cfg.text_len, cfg.dim))
    layer = init_wan_dit_layer(jax.random.key(6), cfg)
    cos, sin = rope_cos_sin(f, h, w, cfg.head_dim)
    out = wan_dit_layer_forward(layer, cfg, x, e0, ctx, cos, sin,
                                img_ctx_len=257)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # residual structure: zero-gated layer == pure cross-attn residual change
    assert float(jnp.abs(out - x).max()) > 0


def test_token_chunk_exact(tiny):
    """token_chunk (the fused-program 16 GB capacity knob, round 4) is
    exact math: the FFN rows are independent, so lax.map over token chunks
    reproduces the single-pass forward up to XLA reassociation (~1 ulp).
    Tokens = 3*4*4 = 48; chunks 2, 3; a non-divisor (5) must fall back to
    the unchunked path bitwise."""
    cfg, params = tiny
    # the head is zero-init -> perturb so the comparison is not vacuous
    h = params["head"]["head"]
    params = dict(params)
    params["head"] = dict(params["head"],
                          head=dict(h, w=0.1 * jax.random.normal(
                              jax.random.key(9), h["w"].shape)))
    x, y, t, ctx, clip = _inputs(cfg)
    ref = np.asarray(wan_dit_forward(params, cfg, x, t, ctx, clip_fea=clip,
                                     y=y))
    for nc in (2, 3):
        got = np.asarray(wan_dit_forward(params, cfg, x, t, ctx,
                                         clip_fea=clip, y=y, token_chunk=nc))
        np.testing.assert_allclose(got, ref, rtol=3e-6, atol=3e-6,
                                   err_msg=f"token_chunk={nc}")
    got5 = np.asarray(wan_dit_forward(params, cfg, x, t, ctx, clip_fea=clip,
                                      y=y, token_chunk=5))
    np.testing.assert_array_equal(got5, ref)  # 48 % 5 != 0 -> same program
