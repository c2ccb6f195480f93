"""LongCat generate_refine (SDEdit upscale) test with and without BSA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                               init_longcat_dit)
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.longcat import LongCatPipeline


@pytest.fixture(scope="module")
def refine_pipe():
    vae_cfg = WanVAEConfig.tiny()  # z=4
    cfg = LongCatDiTConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "in_channels": 4, "out_channels": 4})
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    return LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)


def test_generate_refine_spatial_only(refine_pipe, rng):
    stage1 = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    pe = jnp.asarray(rng.standard_normal(
        (1, 6, refine_pipe.dit_cfg.caption_channels)), jnp.float32)
    pmask = jnp.ones((1, 6), jnp.int32)
    out = refine_pipe.generate_refine(
        jax.random.key(2), stage1, pe, pmask, height=32, width=32,
        num_inference_steps=6, t_thresh=0.5, spatial_refine_only=True,
        use_bsa=False)
    # granularity padding dropped; 2x spatial
    assert out.shape == (1, 3, 5, 32, 32)
    assert np.isfinite(out).all()


def test_generate_refine_temporal_2x(refine_pipe, rng):
    stage1 = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    pe = jnp.asarray(rng.standard_normal(
        (1, 6, refine_pipe.dit_cfg.caption_channels)), jnp.float32)
    pmask = jnp.ones((1, 6), jnp.int32)
    out = refine_pipe.generate_refine(
        jax.random.key(3), stage1, pe, pmask, height=32, width=32,
        num_inference_steps=4, t_thresh=0.6, spatial_refine_only=False,
        use_bsa=False)
    assert out.shape == (1, 3, 8, 32, 32)


def test_generate_refine_bsa_grid(refine_pipe, rng):
    """Grid that satisfies BSA (4,4,8) chunking: latent (T=4, 8, 16)."""
    stage1 = rng.uniform(0, 1, (13, 64, 128, 3)).astype(np.float32)
    pe = jnp.asarray(rng.standard_normal(
        (1, 6, refine_pipe.dit_cfg.caption_channels)), jnp.float32)
    pmask = jnp.ones((1, 6), jnp.int32)
    out = refine_pipe.generate_refine(
        jax.random.key(4), stage1, pe, pmask, height=128, width=256,
        num_inference_steps=2, t_thresh=0.5, spatial_refine_only=True,
        use_bsa=True, bsa_sparsity=0.5)
    assert out.shape == (1, 3, 13, 128, 256)
    assert np.isfinite(out).all()


def test_generate_refine_streaming_vae(refine_pipe, rng):
    """Regression: refine pads frames to T % 4 == 0 (BSA granularity,
    reference :1411-1428), which the streaming encoder's 1+4k chunking
    cannot take — the shape-aware dispatch must fall back to the
    single-pass encoder instead of crashing, and match the non-streaming
    result (the decode side still streams)."""
    import dataclasses
    stage1 = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    pe = jnp.asarray(rng.standard_normal(
        (1, 6, refine_pipe.dit_cfg.caption_channels)), jnp.float32)
    pmask = jnp.ones((1, 6), jnp.int32)
    spipe = dataclasses.replace(refine_pipe, streaming_vae=True)
    kw = dict(height=32, width=32, num_inference_steps=3, t_thresh=0.5,
              spatial_refine_only=True, use_bsa=False)
    out_s = spipe.generate_refine(jax.random.key(5), stage1, pe, pmask, **kw)
    out_d = refine_pipe.generate_refine(jax.random.key(5), stage1, pe,
                                        pmask, **kw)
    assert out_s.shape == (1, 3, 5, 32, 32)
    np.testing.assert_allclose(out_s, out_d, atol=2e-5, rtol=2e-5)


def test_prepare_refine_latents_path_matches_inline(refine_pipe, rng):
    """The phase-ordered 16 GB recipe (prepare_refine_latents before the
    DiT is resident, then generate_refine(stage1_latents=...)) is
    bit-identical to the inline encode path — same key split, same
    schedule."""
    stage1 = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    pe = jnp.asarray(rng.standard_normal(
        (1, 6, refine_pipe.dit_cfg.caption_channels)), jnp.float32)
    pmask = jnp.ones((1, 6), jnp.int32)
    kw = dict(height=32, width=32, num_inference_steps=3, t_thresh=0.5,
              spatial_refine_only=True, use_bsa=False)
    lat_up = refine_pipe.prepare_refine_latents(
        stage1, height=32, width=32, spatial_refine_only=True)
    out_pre = refine_pipe.generate_refine(jax.random.key(7), stage1, pe,
                                          pmask, stage1_latents=lat_up, **kw)
    out_inl = refine_pipe.generate_refine(jax.random.key(7), stage1, pe,
                                          pmask, **kw)
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_inl))
