"""Fused modulated-LayerNorm kernel parity (CPU interpret mode — the
advisor's round-1 rule: every Pallas kernel must run in CI, not only on
TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.ops.fused_norm import (modulated_layer_norm,
                                           modulated_layer_norm_ref)


def test_modulated_layer_norm_matches_xla(rng):
    b, s, d = 2, 264, 256
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((b, 1, d)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((b, 1, d)), jnp.float32)
    got = modulated_layer_norm(x, sc, sh, interpret=True)
    want = modulated_layer_norm_ref(x, sc, sh)
    assert got.dtype == jnp.bfloat16
    # same fp32 op order, but interpret-mode FMA contraction differs from
    # XLA's by 1 bf16 ulp on ~1e-5 of elements
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-3, atol=4e-3)


def test_modulated_layer_norm_fp32_out_and_odd_seq(rng):
    # s with no multiple-of-8 divisor below block_q -> full-axis block
    b, s, d = 1, 84, 128   # 84 = 4*21, largest 8-multiple divisor: none<=64
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    sc = jnp.zeros((b, 1, d), jnp.float32)
    sh = jnp.zeros((b, 1, d), jnp.float32)
    got = modulated_layer_norm(x, sc, sh, block_q=64,
                               out_dtype=jnp.float32, interpret=True)
    # zero modulation == plain LayerNorm
    from worldforge_tpu.core import params as P
    want = P.layer_norm({}, x, eps=1e-6, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_wan_layer_fused_norm_path_matches_fallback(rng):
    """The wired layer path (use_fused_norm=True, interpret) must match
    the XLA chain at bf16 tolerance."""
    from worldforge_tpu.models.wan.dit import (WanDiTConfig,
                                               init_wan_dit_layer,
                                               wan_dit_layer_forward)
    from worldforge_tpu.ops.rope import rope_cos_sin
    import worldforge_tpu.models.wan.dit as dit_mod

    cfg = WanDiTConfig.tiny("t2v")
    layer = init_wan_dit_layer(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 20, cfg.dim)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((1, 6, cfg.dim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.dim)),
                      jnp.float32)
    cos, sin = rope_cos_sin(5, 2, 2, cfg.head_dim)

    base = wan_dit_layer_forward(layer, cfg, x, e, ctx, cos, sin)
    old = dit_mod._FUSED_NORM_MODE
    try:
        dit_mod._FUSED_NORM_MODE = "interpret"
        fused = wan_dit_layer_forward(layer, cfg, x, e, ctx, cos, sin)
    finally:
        dit_mod._FUSED_NORM_MODE = old
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused),
                               rtol=2e-2, atol=2e-2)  # bf16 matmul inputs
