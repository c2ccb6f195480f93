"""The 2D-decomposed causal conv3d (vae._CONV3D_MODE='2d') must equal the
native 3D lowering bit-for-bit in fp32 (same math, different conv emitter)
— at the conv level and through a full VAE encode/decode roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

import worldforge_tpu.models.wan.vae as vae_mod
from worldforge_tpu.core import params as P
from worldforge_tpu.models.wan.vae import (WanVAEConfig, init_wan_vae,
                                           vae_decode, vae_encode)


def _conv_both(p, x, **kw):
    old = vae_mod._CONV3D_MODE
    try:
        vae_mod._CONV3D_MODE = "3d"
        a = vae_mod._causal_conv3d(p, x, **kw)
        vae_mod._CONV3D_MODE = "2d"
        b = vae_mod._causal_conv3d(p, x, **kw)
    finally:
        vae_mod._CONV3D_MODE = old
    return np.asarray(a), np.asarray(b)


def test_conv3d_2d_decomposition_exact(rng):
    p = P.conv_init(jax.random.key(0), 8, 12, (3, 3, 3))
    x = jnp.asarray(rng.standard_normal((1, 5, 6, 7, 8)), jnp.float32)
    a, b = _conv_both(p, x)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_conv3d_2d_stride2_temporal(rng):
    # downsample3d time path: stride_t=2, front_pad=0 (vae.py:143-159)
    p = P.conv_init(jax.random.key(1), 6, 6, (3, 3, 3))
    x = jnp.asarray(rng.standard_normal((1, 7, 4, 4, 6)), jnp.float32)
    a, b = _conv_both(p, x, stride_t=2, front_pad=0)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_vae_roundtrip_modes_match(rng):
    cfg = WanVAEConfig.tiny()
    params = init_wan_vae(jax.random.key(2), cfg)
    video = jnp.asarray(rng.standard_normal((1, 3, 9, 32, 32)), jnp.float32)
    old = vae_mod._CONV3D_MODE
    try:
        vae_mod._CONV3D_MODE = "3d"
        z3 = vae_encode(params, cfg, video)
        v3 = vae_decode(params, cfg, z3)
        vae_mod._CONV3D_MODE = "2d"
        z2 = vae_encode(params, cfg, video)
        v2 = vae_decode(params, cfg, z2)
    finally:
        vae_mod._CONV3D_MODE = old
    np.testing.assert_allclose(np.asarray(z3), np.asarray(z2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v2),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_pallas_matches_native(rng):
    """ops/conv3d.py halo-tile kernel (interpret) vs the native lowering —
    bf16-tap tolerance (the kernel casts fp32 inputs to bf16 for the MXU
    dots, as XLA's own bf16 conv passes do)."""
    p = P.conv_init(jax.random.key(3), 16, 24, (3, 3, 3))
    x = jnp.asarray(rng.standard_normal((1, 7, 8, 16, 16)), jnp.float32)
    old = vae_mod._CONV3D_MODE
    try:
        vae_mod._CONV3D_MODE = "3d"
        a = np.asarray(vae_mod._causal_conv3d(p, x))
        vae_mod._CONV3D_MODE = "pallas_interpret"
        b = np.asarray(vae_mod._causal_conv3d(p, x))
    finally:
        vae_mod._CONV3D_MODE = old
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
    assert rel < 8e-3, rel


def test_vae_decode_pallas_mode(rng):
    """Whole tiny decode through the pallas mode: stride-1 3x3x3 convs run
    the kernel, everything else (1x1x1, time convs, 2D resamplers) falls
    back — output within bf16 drift of the native decode."""
    cfg = WanVAEConfig.tiny()
    params = init_wan_vae(jax.random.key(4), cfg)
    z = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 3, 8, 8)),
                    jnp.float32)
    old = vae_mod._CONV3D_MODE
    try:
        vae_mod._CONV3D_MODE = "3d"
        a = np.asarray(vae_decode(params, cfg, z))
        vae_mod._CONV3D_MODE = "pallas_interpret"
        b = np.asarray(vae_decode(params, cfg, z))
    finally:
        vae_mod._CONV3D_MODE = old
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
    # max (not RMS) drift through ~10 stacked bf16-tap convs on RANDOM-init
    # weights (which amplify; trained VAEs are contractive). Per-conv error
    # is pinned at 8e-3 above; this guards wiring, not numerics.
    assert rel < 0.15, rel
    rms = np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((a ** 2).mean()) + 1e-8)
    assert rms < 0.02, rms
