"""DepthCrafter stack: SVD UNet / VAE / EDM scheduler / windowed pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.depthcrafter.unet import (
    SVDUNetConfig, init_svd_unet, sinusoidal_timestep_embedding,
    svd_unet_forward)
from worldforge_tpu.models.depthcrafter.vae import (SVDVAEConfig,
                                                    init_svd_vae,
                                                    svd_vae_decode,
                                                    svd_vae_encode)
from worldforge_tpu.pipelines.depthcrafter import (DepthCrafterPipeline,
                                                   normalize_depth)
from worldforge_tpu.sampling.euler_edm import (edm_euler_step,
                                               edm_scale_model_input,
                                               make_edm_euler_schedule)


def test_edm_schedule():
    s = make_edm_euler_schedule(25)
    assert s.sigmas[0] == pytest.approx(700.0)
    assert s.sigmas[-2] == pytest.approx(0.002)
    assert s.sigmas[-1] == 0.0
    assert s.init_noise_sigma == pytest.approx(np.sqrt(700.0 ** 2 + 1))
    np.testing.assert_allclose(s.timesteps, 0.25 * np.log(s.sigmas[:-1]))


def test_edm_step_perfect_denoiser(rng):
    """With the ground-truth v, one Euler step moves exactly along the
    noise ray: x_next = x0 + sigma_next * eps."""
    s = make_edm_euler_schedule(10)
    i = 3
    x0 = jnp.asarray(rng.standard_normal((1, 2, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    sig = float(s.sigmas[i])
    x = x0 + sig * eps
    # EDM v-target such that pred_x0 == x0:
    # x0 = v*c_out + x*c_skip -> v = (x0 - x*c_skip)/c_out
    c_out = -sig / np.sqrt(sig ** 2 + 1)
    c_skip = 1 / (sig ** 2 + 1)
    v = (x0 - x * c_skip) / c_out
    x_next = edm_euler_step(s, i, x, v)
    expected = x0 + float(s.sigmas[i + 1]) * eps
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(expected),
                               atol=1e-4)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = SVDUNetConfig.tiny()
    params = init_svd_unet(jax.random.key(0), cfg)
    return cfg, params


def test_svd_unet_shapes(tiny_unet):
    cfg, params = tiny_unet
    b, f, hh, ww = 1, 3, 64, 64
    x = jax.random.normal(jax.random.key(1), (b, f, 8, hh, ww))
    ctx = jax.random.normal(jax.random.key(2),
                            (b, f, 1, cfg.cross_attention_dim))
    ids = jnp.asarray([[7.0, 127.0, 0.02]])
    out = svd_unet_forward(params, cfg, x, 1.5, ctx, ids)
    assert out.shape == (b, f, 4, hh, ww)
    assert np.isfinite(np.asarray(out)).all()


def test_svd_unet_temporal_mixing_sees_other_frames(tiny_unet):
    """Changing frame 2 must change frame 0's output (temporal attention +
    temporal convs)."""
    cfg, params = tiny_unet
    x = jax.random.normal(jax.random.key(3), (1, 3, 8, 64, 64))
    ctx = jnp.zeros((1, 3, 1, cfg.cross_attention_dim))
    ids = jnp.asarray([[7.0, 127.0, 0.02]])
    o1 = svd_unet_forward(params, cfg, x, 1.5, ctx, ids)
    o2 = svd_unet_forward(params, cfg, x.at[:, 2].add(5.0), 1.5, ctx, ids)
    assert np.abs(np.asarray(o1[:, 0] - o2[:, 0])).max() > 1e-6


def test_svd_vae_roundtrip_shapes(rng):
    cfg = SVDVAEConfig.tiny()
    params = init_svd_vae(jax.random.key(0), cfg)
    frames = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    z = svd_vae_encode(params, cfg, frames)
    assert z.shape == (2, 4, 4, 4)
    out = svd_vae_decode(params, cfg, z)
    assert out.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_depthcrafter_pipeline_windowed(tiny_unet, rng):
    cfg, params = tiny_unet
    vae_cfg = SVDVAEConfig.tiny()
    vae_params = init_svd_vae(jax.random.key(1), vae_cfg)
    pipe = DepthCrafterPipeline(unet_params=params, unet_cfg=cfg,
                                vae_params=vae_params, vae_cfg=vae_cfg)
    video = rng.uniform(0, 1, (7, 64, 64, 3)).astype(np.float32)
    out = pipe(jax.random.key(2), video, num_inference_steps=2,
               window_size=4, overlap=2, decode_chunk_size=4)
    assert out.shape == (7, 64, 64, 3)
    assert np.isfinite(out).all()
    depth = normalize_depth(out)
    assert depth.shape == (7, 64, 64)
    assert depth.min() == 0.0 and depth.max() == pytest.approx(1.0)


def test_depthcrafter_pipeline_single_window(tiny_unet, rng):
    cfg, params = tiny_unet
    vae_cfg = SVDVAEConfig.tiny()
    vae_params = init_svd_vae(jax.random.key(1), vae_cfg)
    pipe = DepthCrafterPipeline(unet_params=params, unet_cfg=cfg,
                                vae_params=vae_params, vae_cfg=vae_cfg)
    video = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    out = pipe(jax.random.key(2), video, num_inference_steps=2,
               window_size=8, overlap=3)
    assert out.shape == (3, 64, 64, 3)


def test_svd_unet_attn_chunks_exact(tiny_unet):
    """attn_chunks (the 16 GB high-res capacity knob, round 4) is exact
    math: every transformer-block row is independent, so lax.map over
    leading-axis chunks reproduces the single-pass program up to XLA's
    per-program reduction reassociation (~1 ulp — the chunked and
    unchunked programs fuse norms/softmax differently).
    f=4 chunks over BF=4 rows and (divisor-rounded) over B*H*W."""
    cfg, params = tiny_unet
    b, f, hh, ww = 1, 4, 16, 16
    x = jax.random.normal(jax.random.key(5), (b, f, 8, hh, ww))
    ctx = jax.random.normal(jax.random.key(6),
                            (b, f, 1, cfg.cross_attention_dim))
    ids = jnp.asarray([[7.0, 127.0, 0.02]])
    ref = np.asarray(svd_unet_forward(params, cfg, x, 1.5, ctx, ids))
    for nc in (2, 4, 3):  # 3 does not divide BF=4 -> rounds up to 4
        got = np.asarray(svd_unet_forward(params, cfg, x, 1.5, ctx, ids,
                                          attn_chunks=nc))
        np.testing.assert_allclose(got, ref, rtol=3e-6, atol=3e-6,
                                   err_msg=f"chunks={nc}")
