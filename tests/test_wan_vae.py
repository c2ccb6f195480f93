"""Wan causal-3D VAE: shape contracts + causality/streaming-prefix tests.

The reference's canonical path is streaming (chunks of 1+4k frames with a
feat cache, vae.py:516-568). Our single-pass implementation is equivalent
iff the temporal *prefix property* holds exactly: processing the first
frames alone must give the same result as slicing a longer run — that is
what per-chunk streaming computes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.wan.vae import (
    WanVAEConfig, init_wan_vae, vae_decode, vae_encode)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = WanVAEConfig.tiny()
    params = init_wan_vae(jax.random.key(0), cfg)
    return cfg, params


def test_encode_decode_shapes(tiny_vae):
    cfg, params = tiny_vae
    video = jax.random.normal(jax.random.key(1), (1, 3, 9, 16, 16))
    z = vae_encode(params, cfg, video)
    assert z.shape == (1, cfg.z_dim, 3, 2, 2)  # T: 1+(9-1)/4, spatial /8
    out = vae_decode(params, cfg, z)
    assert out.shape == (1, 3, 9, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) <= 1.0  # clamp(-1, 1)


def test_encoder_temporal_prefix_property(tiny_vae):
    """Streaming equivalence: latents of a 5-frame prefix == first 2 latent
    frames of the 9-frame encode (causal convs, per-chunk streaming)."""
    cfg, params = tiny_vae
    video = jax.random.normal(jax.random.key(2), (1, 3, 9, 16, 16))
    z_full = vae_encode(params, cfg, video)
    z_pre = vae_encode(params, cfg, video[:, :, :5])
    np.testing.assert_allclose(np.asarray(z_pre),
                               np.asarray(z_full[:, :, :2]),
                               atol=1e-5, rtol=1e-5)


def test_encoder_causality(tiny_vae):
    """Changing future frames must not change earlier latent frames."""
    cfg, params = tiny_vae
    video = jax.random.normal(jax.random.key(3), (1, 3, 9, 16, 16))
    pert = video.at[:, :, 5:].add(10.0)
    z1 = vae_encode(params, cfg, video)
    z2 = vae_encode(params, cfg, pert)
    np.testing.assert_allclose(np.asarray(z1[:, :, :2]),
                               np.asarray(z2[:, :, :2]), atol=1e-5)
    assert float(jnp.abs(z1[:, :, 2] - z2[:, :, 2]).max()) > 1e-4


def test_decoder_temporal_prefix_property(tiny_vae):
    cfg, params = tiny_vae
    z = jax.random.normal(jax.random.key(4), (1, cfg.z_dim, 3, 2, 2))
    full = vae_decode(params, cfg, z)
    pre = vae_decode(params, cfg, z[:, :, :2])
    np.testing.assert_allclose(np.asarray(pre),
                               np.asarray(full[:, :, :5]),
                               atol=1e-5, rtol=1e-5)


def test_latent_normalization_roundtrip():
    """encode applies (mu-mean)/std, decode inverts it (vae.py:536-551)."""
    cfg = WanVAEConfig.wan_2_1()
    from worldforge_tpu.models.wan.vae import WAN_LATENTS_MEAN, WAN_LATENTS_STD
    assert WAN_LATENTS_MEAN.shape == (16,) and WAN_LATENTS_STD.shape == (16,)
    assert (WAN_LATENTS_STD > 0).all()
