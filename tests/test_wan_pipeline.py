"""End-to-end Wan I2V WorldForge pipeline on tiny models (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline
from worldforge_tpu.sampling.guidance import GuidanceConfig
from worldforge_tpu.warp.masks import soften_mask


@pytest.fixture(scope="module")
def tiny_pipe():
    vae_cfg = WanVAEConfig.tiny()  # z=4
    dit_cfg = WanDiTConfig(model_type="i2v", in_dim=4 + 4 + vae_cfg.z_dim,
                           out_dim=vae_cfg.z_dim, dim=64, ffn_dim=128,
                           num_heads=2, num_layers=2, text_len=8,
                           text_dim=32, freq_dim=16)
    k = jax.random.key(0)
    dit_params = init_wan_dit(k, dit_cfg)
    # perturb zero-init head so outputs are non-trivial
    dit_params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(k, dit_params["head"]["head"]["w"].shape,
                                 jnp.float32).astype(
            dit_params["head"]["head"]["w"].dtype))
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    return WanI2VPipeline(dit_params=dit_params, dit_cfg=dit_cfg,
                          vae_params=vae_params, vae_cfg=vae_cfg)


def _inputs(pipe, b=1, frames=5, hw=16):
    k = jax.random.key(2)
    ks = jax.random.split(k, 5)
    image = jax.random.uniform(ks[0], (b, 3, hw, hw), minval=-1, maxval=1)
    pe = jax.random.normal(ks[1], (b, pipe.dit_cfg.text_len,
                                   pipe.dit_cfg.text_dim))
    ne = jax.random.normal(ks[2], (b, pipe.dit_cfg.text_len,
                                   pipe.dit_cfg.text_dim))
    ie = jax.random.normal(ks[3], (b, 257, 1280))
    ref = jax.random.uniform(ks[4], (b, 3, frames, hw, hw))
    mask = jnp.ones((b, 1, frames, hw, hw), jnp.float32)
    return image, pe, ne, ie, ref, mask


def test_generate_unguided(tiny_pipe):
    image, pe, ne, ie, _, _ = _inputs(tiny_pipe)
    out = tiny_pipe.generate(
        jax.random.key(3), image, pe, ne, ie, height=16, width=16,
        num_frames=5, num_inference_steps=4, guidance_scale=4.0,
        guidance=GuidanceConfig(guided=False, resample_steps=1))
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_generate_guided_irr_flf_dsg(tiny_pipe):
    """Full guided path: IRR resampling, pixel-space fusion, FLF, DSG."""
    image, pe, ne, ie, ref, mask = _inputs(tiny_pipe)
    out = tiny_pipe.generate(
        jax.random.key(4), image, pe, ne, ie, height=16, width=16,
        num_frames=5, num_inference_steps=4, guidance_scale=4.0,
        guidance=GuidanceConfig(guided=True, guide_steps=3,
                                resample_steps=2, resample_round=3,
                                omega=4.0, use_flf=True),
        video_ref=ref, mask=mask)
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()


def test_guided_differs_from_unguided(tiny_pipe):
    image, pe, ne, ie, ref, mask = _inputs(tiny_pipe)
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=3,
                  guidance_scale=4.0)
    o1 = tiny_pipe.generate(jax.random.key(5), image, pe, ne, ie,
                            guidance=GuidanceConfig(guided=False,
                                                    resample_steps=1),
                            **kwargs)
    o2 = tiny_pipe.generate(jax.random.key(5), image, pe, ne, ie,
                            guidance=GuidanceConfig(guided=True,
                                                    guide_steps=3,
                                                    resample_steps=1,
                                                    use_flf=False),
                            video_ref=ref, mask=mask, **kwargs)
    assert np.abs(o1 - o2).max() > 1e-4


def test_seed_determinism(tiny_pipe):
    image, pe, ne, ie, _, _ = _inputs(tiny_pipe)
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=2,
                  guidance_scale=4.0,
                  guidance=GuidanceConfig(guided=False, resample_steps=1))
    o1 = tiny_pipe.generate(jax.random.key(7), image, pe, ne, ie, **kwargs)
    o2 = tiny_pipe.generate(jax.random.key(7), image, pe, ne, ie, **kwargs)
    np.testing.assert_array_equal(o1, o2)


def test_fused_scan_pipeline_matches_loop(tiny_pipe):
    """fused=True (one jitted lax.scan program) must reproduce the python
    loop exactly (same RNG split sequence by construction)."""
    image, pe, ne, ie, ref, mask = _inputs(tiny_pipe)
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=4,
                  guidance_scale=4.0, video_ref=ref, mask=mask,
                  guidance=GuidanceConfig(guided=True, guide_steps=3,
                                          resample_steps=2,
                                          resample_round=3, use_flf=False))
    o_loop = tiny_pipe.generate(jax.random.key(11), image, pe, ne, ie,
                                **kwargs)
    o_scan = tiny_pipe.generate(jax.random.key(11), image, pe, ne, ie,
                                fused=True, **kwargs)
    np.testing.assert_allclose(o_scan, o_loop, atol=1e-5, rtol=1e-5)


def test_fused_scan_with_device_flf(tiny_pipe):
    image, pe, ne, ie, ref, mask = _inputs(tiny_pipe)
    out = tiny_pipe.generate(
        jax.random.key(12), image, pe, ne, ie, height=16, width=16,
        num_frames=5, num_inference_steps=3, guidance_scale=4.0,
        video_ref=ref, mask=mask, fused=True,
        guidance=GuidanceConfig(guided=True, guide_steps=3,
                                resample_steps=2, resample_round=2,
                                use_flf=True))
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()


def test_soften_mask():
    m = np.zeros((1, 32, 32), np.float32)
    m[0, 8:24, 8:24] = 1.0
    s = soften_mask(m, transition_distance=4, decay_type="sine")
    assert s.shape == m.shape
    assert s.min() >= 0.0 and s.max() <= 1.0
    # deep interior stays 1; boundary band ramps
    assert s[0, 16, 16] == 1.0
    assert 0.0 < s[0, 8, 16] < 1.0     # on the boundary ring
    assert (s[0, m[0] == 0] == 0).all()  # outside untouched
    # all-ones frame untouched
    ones = np.ones((1, 8, 8), np.float32)
    np.testing.assert_array_equal(soften_mask(ones, 3), ones)


def test_chunked_execution_matches_fused(tiny_pipe):
    """exec_chunk (watchdog-limited fused serving: same scan body
    dispatched in <=k-step executions, UniPC m0/m1 history riding the
    carry — docs/COMPONENTS.md deviation 9) must match the one-program
    fused scan for every chunk size. Tolerance: the chunk programs take
    the xs tables as runtime args where the one-program scan embeds them
    as constants, so XLA's folding differs by ~1 ulp in the UniPC update
    (measured max 1.2e-7 guided); the unguided case is exact."""
    image, pe, ne, ie, ref, mask = _inputs(tiny_pipe)
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=5,
                  guidance_scale=4.0, video_ref=ref, mask=mask,
                  output_type="latent",
                  guidance=GuidanceConfig(guided=True, guide_steps=3,
                                          resample_steps=2,
                                          resample_round=4, use_flf=True))
    o_fused = tiny_pipe.generate(jax.random.key(13), image, pe, ne, ie,
                                 fused=True, **kwargs)
    for k in (1, 2, 3):
        o_chunk = tiny_pipe.generate(jax.random.key(13), image, pe, ne, ie,
                                     fused=True, exec_chunk=k, **kwargs)
        np.testing.assert_allclose(np.asarray(o_chunk),
                                   np.asarray(o_fused),
                                   rtol=0, atol=3e-6,
                                   err_msg=f"exec_chunk={k}")

    # unguided: chunked == fused (chunk boundary inside a plain segment)
    kw_u = dict(height=16, width=16, num_frames=5, num_inference_steps=4,
                guidance_scale=4.0, output_type="latent",
                guidance=GuidanceConfig(guided=False, resample_steps=1))
    o_f = tiny_pipe.generate(jax.random.key(14), image, pe, ne, ie,
                             fused=True, **kw_u)
    o_c = tiny_pipe.generate(jax.random.key(14), image, pe, ne, ie,
                             fused=True, exec_chunk=3, **kw_u)
    np.testing.assert_array_equal(np.asarray(o_c), np.asarray(o_f))
