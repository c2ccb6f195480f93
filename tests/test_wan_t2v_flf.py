"""Wan t2v + flf2v pipeline facades."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.wan_t2v import WanT2VPipeline


def _mk(model_type, vae_cfg):
    in_dim = 16 if model_type == "t2v" else 4 + 4 + vae_cfg.z_dim
    cfg = WanDiTConfig(model_type=model_type,
                       in_dim=(vae_cfg.z_dim if model_type == "t2v"
                               else 4 + 2 * vae_cfg.z_dim),
                       out_dim=vae_cfg.z_dim, dim=64, ffn_dim=128,
                       num_heads=2, num_layers=2, text_len=8, text_dim=32,
                       freq_dim=16)
    params = init_wan_dit(jax.random.key(0), cfg)
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.key(9), params["head"]["head"]["w"].shape,
        jnp.float32).astype(params["head"]["head"]["w"].dtype)
    return cfg, params


def test_t2v_generate(rng):
    vae_cfg = WanVAEConfig.tiny()
    cfg, params = _mk("t2v", vae_cfg)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    pipe = WanT2VPipeline(dit_params=params, dit_cfg=cfg,
                          vae_params=vae_params, vae_cfg=vae_cfg)
    pe = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    ne = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    out = pipe.generate(jax.random.key(2), pe, ne, height=16, width=16,
                        num_frames=5, num_inference_steps=3,
                        guidance_scale=5.0)
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()


def test_flf2v_generate(rng):
    vae_cfg = WanVAEConfig.tiny()
    cfg, params = _mk("flf2v", vae_cfg)
    assert "emb_pos" in params["img_emb"]
    assert params["img_emb"]["emb_pos"].shape == (1, 514, 1280)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    pipe = WanT2VPipeline(dit_params=params, dit_cfg=cfg,
                          vae_params=vae_params, vae_cfg=vae_cfg)
    pe = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    first = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 16)), jnp.float32)
    last = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 16)), jnp.float32)
    clip2 = jnp.asarray(rng.standard_normal((1, 514, 1280)), jnp.float32)
    out = pipe.generate(jax.random.key(2), pe, None, height=16, width=16,
                        num_frames=5, num_inference_steps=2,
                        guidance_scale=1.0, first_frame=first,
                        last_frame=last, image_embeds=clip2)
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()
