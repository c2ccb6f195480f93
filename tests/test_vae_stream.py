"""Streaming VAE (scan + conv caches) == single-pass VAE (which is itself
parity-tested against the reference torch streaming code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.wan.vae import (WanVAEConfig, init_wan_vae,
                                           vae_decode, vae_encode)
from worldforge_tpu.models.wan.vae_stream import (vae_decode_streaming,
                                                  vae_encode_streaming)


@pytest.fixture(scope="module")
def vae():
    cfg = WanVAEConfig.tiny()
    params = init_wan_vae(jax.random.key(0), cfg)
    return cfg, params


def test_streaming_encode_matches_single_pass(vae, rng):
    cfg, params = vae
    video = jnp.asarray(rng.standard_normal((1, 3, 9, 16, 16)) * 0.5,
                        jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    z_full = vae_encode(params, cfg, video, mean=mean, std=std)
    z_stream = vae_encode_streaming(params, cfg, video, mean=mean, std=std)
    assert z_stream.shape == z_full.shape
    np.testing.assert_allclose(np.asarray(z_stream), np.asarray(z_full),
                               atol=1e-4, rtol=1e-4)


def test_streaming_decode_matches_single_pass(vae, rng):
    cfg, params = vae
    z = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 3, 2, 2)),
                    jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    full = vae_decode(params, cfg, z, mean=mean, std=std)
    stream = vae_decode_streaming(params, cfg, z, mean=mean, std=std)
    assert stream.shape == full.shape
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_streaming_single_frame(vae, rng):
    cfg, params = vae
    video = jnp.asarray(rng.standard_normal((1, 3, 1, 16, 16)), jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    z = vae_encode_streaming(params, cfg, video, mean=mean, std=std)
    assert z.shape[2] == 1
    out = vae_decode_streaming(params, cfg, z, mean=mean, std=std)
    assert out.shape == video.shape


@pytest.mark.parametrize("chunk", [2, 4])
def test_streaming_decode_chunked_matches(vae, rng, chunk):
    """Any chunk size carries the same conv-cache state: chunked decode is
    mathematically identical to the 1-frame-per-step schedule (differences
    limited to XLA conv reassociation at different tile shapes, ~1e-6)."""
    cfg, params = vae
    z = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 5, 2, 2)),
                    jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    base = vae_decode_streaming(params, cfg, z, mean=mean, std=std)
    chunked = vae_decode_streaming(params, cfg, z, mean=mean, std=std,
                                   chunk=chunk)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n_strips", [2, 4])
def test_streaming_decode_spatial_strips_exact(vae, rng, n_strips):
    """H-strip-tiled spatial convs (the 720p-next-to-DiT capacity knob)
    produce the SAME dot products as the single-pass lowering: VALID-H
    convs over halo strips gathered from zero-padded inputs, so the zero
    halo at true borders reproduces SAME padding exactly. Differences are
    XLA conv-tiling reassociation only (~1e-6)."""
    cfg, params = vae
    z = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 3, 4, 2)),
                    jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    base = vae_decode_streaming(params, cfg, z, mean=mean, std=std)
    tiled = vae_decode_streaming(params, cfg, z, mean=mean, std=std,
                                 spatial_chunks=n_strips)
    assert tiled.shape == base.shape
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_streaming_decode_spatial_strips_indivisible_falls_back(vae, rng):
    """A strip count that does not divide a stage's H falls back to the
    untiled path for that stage — results identical either way."""
    cfg, params = vae
    z = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 3, 5, 2)),
                    jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    base = vae_decode_streaming(params, cfg, z, mean=mean, std=std)
    out = vae_decode_streaming(params, cfg, z, mean=mean, std=std,
                               spatial_chunks=3)  # 5 % 3 != 0 at stage 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_streaming_decode_strips_with_temporal_chunk(vae, rng):
    """spatial_chunks composes with the temporal chunk knob."""
    cfg, params = vae
    z = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 5, 4, 2)),
                    jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    base = vae_decode_streaming(params, cfg, z, mean=mean, std=std)
    both = vae_decode_streaming(params, cfg, z, mean=mean, std=std,
                                chunk=2, spatial_chunks=2)
    np.testing.assert_allclose(np.asarray(both), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n_strips", [2, 4])
def test_streaming_encode_spatial_strips_exact(vae, rng, n_strips):
    """Encoder twin of the decode strip test: res-cell convs (halo kh//2)
    and the stride-2 downsample (no left halo, bottom zero pad) tile
    exactly over H strips."""
    cfg, params = vae
    video = jnp.asarray(rng.standard_normal((1, 3, 9, 32, 16)) * 0.5,
                        jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    base = vae_encode_streaming(params, cfg, video, mean=mean, std=std)
    tiled = vae_encode_streaming(params, cfg, video, mean=mean, std=std,
                                 spatial_chunks=n_strips)
    assert tiled.shape == base.shape
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_streaming_encode_strips_indivisible_falls_back(vae, rng):
    cfg, params = vae
    video = jnp.asarray(rng.standard_normal((1, 3, 5, 24, 16)) * 0.5,
                        jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    base = vae_encode_streaming(params, cfg, video, mean=mean, std=std)
    out = vae_encode_streaming(params, cfg, video, mean=mean, std=std,
                               spatial_chunks=5)  # 24 % 5 != 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_streaming_decode_bad_chunk_falls_back(vae, rng):
    cfg, params = vae
    z = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 4, 2, 2)),
                    jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    base = vae_decode_streaming(params, cfg, z, mean=mean, std=std)
    out = vae_decode_streaming(params, cfg, z, mean=mean, std=std, chunk=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_encode_dispatch_drops_tail_like_reference(vae, rng):
    """The pipelines' shape-aware encode mirrors the reference encoder's
    implicit tail-drop for T != 1+4k inputs (autoencoder_kl_wan.py:
    1155-1166: iter_ = 1+(T-1)//4, last chunk reads [1+4(i-1):1+4i] — a
    T=12 input encodes frames [0:9]). Round-4 fix: generate_refine's
    BSA-granularity padding produces T=4k, which previously fell back to
    the single-pass encoder over ALL T frames (a value deviation, and a
    24 GB OOM at the 720p production shape)."""
    from worldforge_tpu.pipelines.vae_dispatch import vae_fn_pair

    cfg, params = vae
    video = jnp.asarray(rng.standard_normal((1, 3, 12, 16, 16)) * 0.5,
                        jnp.float32)
    mean = jnp.zeros((cfg.z_dim,))
    std = jnp.ones((cfg.z_dim,))
    want = vae_encode_streaming(params, cfg, video[:, :, :9],
                                mean=mean, std=std)
    for streaming in (True, False):
        _, enc = vae_fn_pair(streaming)
        got = enc(params, cfg, video)  # dispatch default latent norm
        got9 = enc(params, cfg, video[:, :, :9])
        assert got.shape[2] == want.shape[2] == 3  # 1 + (9-1)/4 latents
        np.testing.assert_allclose(np.asarray(got), np.asarray(got9),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"streaming={streaming}")
