"""LongCat fused-scan i2v == python loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                               init_longcat_dit)
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.longcat import LongCatPipeline
from worldforge_tpu.sampling.guidance import GuidanceConfig


@pytest.fixture(scope="module")
def lc_pipe():
    vae_cfg = WanVAEConfig.tiny()
    cfg = LongCatDiTConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "in_channels": 4, "out_channels": 4})
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    return LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)


def test_fused_matches_loop_guided(lc_pipe, rng):
    ks = jax.random.split(jax.random.key(2), 5)
    image = jax.random.uniform(ks[0], (1, 3, 16, 16), minval=-1, maxval=1)
    pe = jax.random.normal(ks[1], (1, 6, lc_pipe.dit_cfg.caption_channels))
    ne = jax.random.normal(ks[2], (1, 6, lc_pipe.dit_cfg.caption_channels))
    pm = jnp.ones((1, 6), jnp.int32)
    ref = jax.random.uniform(ks[3], (1, 3, 5, 16, 16))
    m = jnp.ones((1, 1, 5, 16, 16))
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=4,
                  guidance_scale=4.0, video_ref=ref, mask=m,
                  guidance=GuidanceConfig(guided=True, guide_steps=3,
                                          resample_steps=2,
                                          resample_round=3, use_flf=False,
                                          flf_backend="longcat"))
    o_loop = lc_pipe.generate_i2v(ks[4], image, pe, pm, ne, pm, **kwargs)
    o_scan = lc_pipe.generate_i2v(ks[4], image, pe, pm, ne, pm, fused=True,
                                  **kwargs)
    np.testing.assert_allclose(o_scan, o_loop, atol=1e-5, rtol=1e-5)


def test_fused_with_flf_smoke(lc_pipe, rng):
    ks = jax.random.split(jax.random.key(5), 5)
    image = jax.random.uniform(ks[0], (1, 3, 16, 16), minval=-1, maxval=1)
    pe = jax.random.normal(ks[1], (1, 6, lc_pipe.dit_cfg.caption_channels))
    pm = jnp.ones((1, 6), jnp.int32)
    ref = jax.random.uniform(ks[3], (1, 3, 5, 16, 16))
    m = jnp.ones((1, 1, 5, 16, 16))
    out = lc_pipe.generate_i2v(
        ks[4], image, pe, pm, None, None, height=16, width=16,
        num_frames=5, num_inference_steps=3, guidance_scale=1.0,
        use_distill=True, video_ref=ref, mask=m, fused=True,
        guidance=GuidanceConfig(guided=True, guide_steps=2,
                                resample_steps=2, resample_round=2,
                                use_flf=True, flf_backend="longcat"))
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()


def test_chunked_execution_matches_fused(lc_pipe, rng):
    """exec_chunk (watchdog-limited serving: the same scan body dispatched
    in <=k-step executions — docs/COMPONENTS.md deviation 9) must be
    bit-identical to the one-program fused scan for every chunk size,
    guided and unguided."""
    ks = jax.random.split(jax.random.key(7), 5)
    image = jax.random.uniform(ks[0], (1, 3, 16, 16), minval=-1, maxval=1)
    pe = jax.random.normal(ks[1], (1, 6, lc_pipe.dit_cfg.caption_channels))
    ne = jax.random.normal(ks[2], (1, 6, lc_pipe.dit_cfg.caption_channels))
    pm = jnp.ones((1, 6), jnp.int32)
    ref = jax.random.uniform(ks[3], (1, 3, 5, 16, 16))
    m = jnp.ones((1, 1, 5, 16, 16))
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=5,
                  guidance_scale=4.0, video_ref=ref, mask=m,
                  output_type="latent",
                  guidance=GuidanceConfig(guided=True, guide_steps=3,
                                          resample_steps=2,
                                          resample_round=4, use_flf=False,
                                          flf_backend="longcat"))
    o_fused = lc_pipe.generate_i2v(ks[4], image, pe, pm, ne, pm, fused=True,
                                   **kwargs)
    for k in (1, 2, 3):
        o_chunk = lc_pipe.generate_i2v(ks[4], image, pe, pm, ne, pm,
                                       fused=True, exec_chunk=k, **kwargs)
        np.testing.assert_array_equal(np.asarray(o_chunk),
                                      np.asarray(o_fused),
                                      err_msg=f"exec_chunk={k}")

    # unguided distilled (the bisect shape): chunked == fused
    kwargs_u = dict(height=16, width=16, num_frames=5,
                    num_inference_steps=4, guidance_scale=1.0,
                    use_distill=True, output_type="latent",
                    guidance=GuidanceConfig(guided=False,
                                            flf_backend="longcat"))
    o_fused_u = lc_pipe.generate_i2v(ks[4], image, pe, pm, None, None,
                                     fused=True, **kwargs_u)
    o_chunk_u = lc_pipe.generate_i2v(ks[4], image, pe, pm, None, None,
                                     fused=True, exec_chunk=3, **kwargs_u)
    np.testing.assert_array_equal(np.asarray(o_chunk_u),
                                  np.asarray(o_fused_u))
