"""LongCat DiT / flow-match scheduler / pipeline tests (tiny, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.longcat.dit import (
    LongCatDiTConfig, init_longcat_dit, longcat_dit_forward, merge_lora,
    unmerge_lora, timestep_embedding)
from worldforge_tpu.pipelines.longcat import LongCatPipeline
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.sampling.flow_match import (
    cfg_zero_combine, fm_add_noise, fm_euler_step, fm_pred_x0,
    longcat_sigmas, make_flow_match_schedule)
from worldforge_tpu.sampling.guidance import GuidanceConfig


def test_ffn_hidden_formula():
    assert LongCatDiTConfig.longcat_13b().ffn_hidden == 11008


def test_timestep_embedding_formula():
    emb = np.asarray(timestep_embedding(jnp.asarray([0.0]), 8))
    np.testing.assert_allclose(emb, [[1, 1, 1, 1, 0, 0, 0, 0]], atol=1e-6)


def test_sigma_tables():
    s = longcat_sigmas(50, use_distill=False)
    assert s[0] == 0.999 and s[-1] == 0.0 and len(s) == 50
    sd = longcat_sigmas(16, use_distill=True)
    assert len(sd) == 16
    np.testing.assert_allclose(sd[-1], 0.0, atol=1e-12)
    # reference uses integer division: indices k*(1000//16) = k*62,
    # so sigma[0] = (16*62 - 62)/1000 = 0.93
    np.testing.assert_allclose(sd[0], (992 - 62) / 1000, atol=1e-9)
    # shift changes midpoints but keeps endpoints 0
    sched = make_flow_match_schedule(10, shift=5.0)
    assert sched.sigmas[-1] == 0.0
    assert sched.sigmas.shape == (11,)


def test_euler_and_renoise_roundtrip(rng):
    sched = make_flow_match_schedule(10, shift=2.0)
    i = 3
    x0 = jnp.asarray(rng.standard_normal((1, 4, 2, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    x = fm_add_noise(sched, i, x0, eps)
    v = eps - x0  # true flow velocity
    np.testing.assert_allclose(np.asarray(fm_pred_x0(sched, i, v, x)),
                               np.asarray(x0), atol=1e-5)
    # exact euler with true v lands on the next sigma's noisy point
    x_next = fm_euler_step(sched, i, x, v)
    expected = fm_add_noise(sched, i + 1, x0, eps)
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(expected),
                               atol=1e-5)


def test_cfg_zero_identity_when_parallel(rng):
    """If v_c == v_u, st*=1 and output == v_c for any scale."""
    v = jnp.asarray(rng.standard_normal((2, 4, 2, 4, 4)), jnp.float32)
    out = cfg_zero_combine(v, v, 7.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-4)


@pytest.fixture(scope="module")
def tiny_lc():
    cfg = LongCatDiTConfig.tiny()
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_longcat_forward_shapes(tiny_lc):
    cfg, params = tiny_lc
    x = jax.random.normal(jax.random.key(1), (1, 16, 3, 8, 8), jnp.float32)
    t = jnp.asarray([[500.0, 500.0, 0.0]])[:, [2, 0, 1]]  # per-frame [B,T]
    ctx = jax.random.normal(jax.random.key(2), (1, 10, cfg.caption_channels))
    cmask = jnp.ones((1, 10), jnp.int32)
    out = longcat_dit_forward(params, cfg, x, t, ctx, cmask)
    assert out.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_token_chunk_equivalence(tiny_lc):
    """token_chunk tiles the FFN over tokens — row-wise identical math (the
    capacity lever that fits the full int8 model on 16 GB; docs/PERF.md)."""
    cfg, params = tiny_lc
    x = jax.random.normal(jax.random.key(1), (1, 16, 3, 8, 8), jnp.float32)
    t = jnp.asarray([[500.0, 300.0, 100.0]])
    ctx = jax.random.normal(jax.random.key(2), (1, 10, cfg.caption_channels))
    cmask = jnp.ones((1, 10), jnp.int32)
    base = longcat_dit_forward(params, cfg, x, t, ctx, cmask)
    # N = 3*4*4 = 48 tokens; chunk 4 divides it
    chunked = longcat_dit_forward(params, cfg, x, t, ctx, cmask, token_chunk=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(base),
                               rtol=0, atol=1e-5)
    # non-dividing chunk falls back to the unchunked path
    fallback = longcat_dit_forward(params, cfg, x, t, ctx, cmask, token_chunk=7)
    np.testing.assert_array_equal(np.asarray(fallback), np.asarray(base))


def test_longcat_cond_split_blocks_noise_to_cond_influence(tiny_lc):
    """With num_cond_latents=1, changing NOISE frames must not change the
    cond-frame self-attn output path... cond tokens attend only to cond."""
    cfg, params = tiny_lc
    x = jax.random.normal(jax.random.key(3), (1, 16, 3, 8, 8), jnp.float32)
    t = jnp.zeros((1, 3), jnp.float32)
    ctx = jax.random.normal(jax.random.key(4), (1, 6, cfg.caption_channels))
    cmask = jnp.ones((1, 6), jnp.int32)
    o1 = longcat_dit_forward(params, cfg, x, t, ctx, cmask,
                             num_cond_latents=1)
    x2 = x.at[:, :, 1:].add(3.0)
    o2 = longcat_dit_forward(params, cfg, x2, t, ctx, cmask,
                             num_cond_latents=1)
    # cond frame output unaffected by noise frames (self-attn cond-only +
    # zero cross-attn + per-frame FFN/modulation)
    np.testing.assert_allclose(np.asarray(o1[:, :, 0]),
                               np.asarray(o2[:, :, 0]), atol=1e-5)
    assert np.abs(np.asarray(o1[:, :, 1:] - o2[:, :, 1:])).max() > 1e-3


def test_lora_merge_unmerge(tiny_lc):
    cfg, params = tiny_lc
    rng = np.random.default_rng(0)
    path = "final/linear"
    r = 4
    w = params["final"]["linear"]["w"]
    lora = {path: {
        "down": jnp.asarray(rng.standard_normal((w.shape[0], r)), jnp.float32),
        "up": jnp.asarray(rng.standard_normal((r, w.shape[1])), jnp.float32),
        "alpha": 2.0, "multiplier": 1.0}}
    merged = merge_lora(params, lora)
    assert np.abs(np.asarray(merged["final"]["linear"]["w"] - w)).max() > 0
    restored = unmerge_lora(merged, lora)
    np.testing.assert_allclose(np.asarray(restored["final"]["linear"]["w"]),
                               np.asarray(w), atol=1e-5)
    # other weights untouched
    np.testing.assert_array_equal(
        np.asarray(merged["x_embedder"]["w"]),
        np.asarray(params["x_embedder"]["w"]))


def test_longcat_pipeline_i2v_guided(tiny_lc):
    cfg, params = tiny_lc
    vae_cfg = WanVAEConfig.tiny()  # z=4
    cfg = LongCatDiTConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "in_channels": 4, "out_channels": 4})
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)
    ks = jax.random.split(jax.random.key(2), 5)
    image = jax.random.uniform(ks[0], (1, 3, 16, 16), minval=-1, maxval=1)
    pe = jax.random.normal(ks[1], (1, 6, cfg.caption_channels))
    ne = jax.random.normal(ks[2], (1, 6, cfg.caption_channels))
    pmask = jnp.ones((1, 6), jnp.int32)
    ref = jax.random.uniform(ks[3], (1, 3, 5, 16, 16))
    m = jnp.ones((1, 1, 5, 16, 16))
    out = pipe.generate_i2v(
        ks[4], image, pe, pmask, ne, pmask, height=16, width=16,
        num_frames=5, num_inference_steps=3, guidance_scale=4.0,
        video_ref=ref, mask=m,
        guidance=GuidanceConfig(guided=True, guide_steps=2,
                                resample_steps=2, resample_round=2,
                                use_flf=True, flf_backend="longcat"))
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()


def test_longcat_pipeline_distill(tiny_lc):
    vae_cfg = WanVAEConfig.tiny()
    cfg = LongCatDiTConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "in_channels": 4, "out_channels": 4})
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)
    ks = jax.random.split(jax.random.key(7), 3)
    image = jax.random.uniform(ks[0], (1, 3, 16, 16), minval=-1, maxval=1)
    pe = jax.random.normal(ks[1], (1, 6, cfg.caption_channels))
    pmask = jnp.ones((1, 6), jnp.int32)
    out = pipe.generate_i2v(
        ks[2], image, pe, pmask, None, None, height=16, width=16,
        num_frames=5, num_inference_steps=4, guidance_scale=1.0,
        use_distill=True,
        guidance=GuidanceConfig(guided=False, resample_steps=1))
    assert out.shape == (1, 3, 5, 16, 16)
    assert np.isfinite(out).all()
