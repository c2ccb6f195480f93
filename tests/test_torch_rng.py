"""torch-compatible RNG + injection into the Wan pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from worldforge_tpu.utils.torch_rng import TorchCompatibleRNG, torch_randn


def test_matches_torch_stream():
    rng = TorchCompatibleRNG(42)
    a = rng.randn(2, 3)
    b = rng.randn(4)
    g = torch.Generator().manual_seed(42)
    ta = torch.randn((2, 3), generator=g).numpy()
    tb = torch.randn((4,), generator=g).numpy()
    np.testing.assert_array_equal(a, ta)
    np.testing.assert_array_equal(b, tb)
    np.testing.assert_array_equal(torch_randn((2, 3), 42), ta)


def test_noise_injection_into_pipeline(rng):
    from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline
    from worldforge_tpu.sampling.guidance import GuidanceConfig

    vae_cfg = WanVAEConfig.tiny()
    cfg = WanDiTConfig(model_type="i2v", in_dim=8 + vae_cfg.z_dim,
                       out_dim=vae_cfg.z_dim, dim=64, ffn_dim=128,
                       num_heads=2, num_layers=1, text_len=8, text_dim=32,
                       freq_dim=16)
    params = init_wan_dit(jax.random.key(0), cfg)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    pipe = WanI2VPipeline(dit_params=params, dit_cfg=cfg,
                          vae_params=vae_params, vae_cfg=vae_cfg)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 16)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    ie = jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.float32)

    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=2,
                  guidance_scale=1.0,
                  guidance=GuidanceConfig(guided=False, resample_steps=1))
    o1 = pipe.generate(jax.random.key(2), image, pe, None, ie,
                       noise_fn=lambda s: TorchCompatibleRNG(7).randn(*s),
                       **kwargs)
    o2 = pipe.generate(jax.random.key(99), image, pe, None, ie,
                       noise_fn=lambda s: TorchCompatibleRNG(7).randn(*s),
                       **kwargs)
    # same torch seed -> identical output regardless of the JAX key
    np.testing.assert_array_equal(o1, o2)
