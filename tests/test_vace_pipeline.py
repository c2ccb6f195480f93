"""VACE context prep + generation facade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.wan.vace import VaceConfig, init_vace
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.wan_vace import (WanVacePipeline,
                                               encode_vace_masks,
                                               prepare_vace_context)
from worldforge_tpu.models.wan.dit import WanDiTConfig


def test_encode_vace_masks_shapes_and_shuffle(rng):
    # time-constant mask isolates the 8x8 spatial pixel-shuffle from the
    # nearest temporal resampling
    frame = rng.integers(0, 2, (16, 16)).astype(np.float32)
    m = jnp.asarray(np.broadcast_to(frame, (1, 1, 5, 16, 16)))
    enc = encode_vace_masks(m)
    assert enc.shape == (1, 64, 2, 2, 2)
    e = np.asarray(enc)
    # channel (i*8+j) at latent (y,x) == mask pixel (y*8+i, x*8+j)
    for (i, j, y, x) in [(0, 0, 0, 0), (2, 3, 1, 1), (7, 7, 0, 1)]:
        assert e[0, i * 8 + j, 0, y, x] == frame[y * 8 + i, x * 8 + j]


def test_prepare_vace_context(rng):
    vae_cfg = WanVAEConfig.tiny()  # z=4
    vae_params = init_wan_vae(jax.random.key(0), vae_cfg)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 3, 5, 16, 16)), jnp.float32)
    masks = jnp.asarray(rng.integers(0, 2, (1, 1, 5, 16, 16)), jnp.float32)
    ctx = prepare_vace_context(frames, masks, vae_params, vae_cfg)
    # 2*z + 64 channels at latent grid
    assert ctx.shape == (1, 2 * vae_cfg.z_dim + 64, 2, 2, 2)
    assert np.isfinite(np.asarray(ctx)).all()


def test_vace_pipeline_generate(rng):
    vae_cfg = WanVAEConfig.tiny()
    base = WanDiTConfig(model_type="t2v", in_dim=vae_cfg.z_dim,
                        out_dim=vae_cfg.z_dim, dim=64, ffn_dim=128,
                        num_heads=2, num_layers=2, text_len=8, text_dim=32,
                        freq_dim=16)
    cfg = VaceConfig(base=base, vace_in_dim=2 * vae_cfg.z_dim + 64)
    params = init_vace(jax.random.key(0), cfg, dtype=jnp.float32)
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.key(9), params["head"]["head"]["w"].shape, jnp.float32)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    pipe = WanVacePipeline(vace_params=params, vace_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)
    video = jnp.asarray(rng.uniform(-1, 1, (1, 3, 5, 16, 16)), jnp.float32)
    masks = jnp.ones((1, 1, 5, 16, 16), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    ne = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    out = pipe.generate(jax.random.key(2), video, masks, pe, ne,
                        num_inference_steps=3, guidance_scale=5.0)
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()
