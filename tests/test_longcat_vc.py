"""LongCat t2v + KV-cache video continuation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.models.longcat.dit import (
    LongCatDiTConfig, init_longcat_dit, longcat_dit_cache_cond,
    longcat_dit_forward, longcat_dit_forward_with_cache)
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.longcat import LongCatPipeline


@pytest.fixture(scope="module")
def lc():
    vae_cfg = WanVAEConfig.tiny()
    cfg = LongCatDiTConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "in_channels": 4, "out_channels": 4})
    params = init_longcat_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    return cfg, params, vae_cfg, vae_params


def test_kv_cache_matches_joint_forward(lc, rng):
    """Denoising with cached cond KV must equal the joint forward's noise-
    token outputs when timesteps match (cond frames at t=0, noise at t)."""
    cfg, params, _, _ = lc
    b, tc, tn, hh, ww = 1, 2, 3, 8, 8
    cond = jnp.asarray(rng.standard_normal((b, 4, tc, hh, ww)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((b, 4, tn, hh, ww)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 6, cfg.caption_channels)),
                      jnp.float32)
    mask = jnp.ones((b, 6), jnp.int32)
    t_val = 700.0

    # joint forward: full latents, per-frame t with cond frames at 0,
    # num_cond_latents=tc (cond/noise split attention, zero cond cross-attn)
    from worldforge_tpu.core.dtypes import FP32_POLICY
    full = jnp.concatenate([cond, noise], axis=2)
    tb = jnp.full((b, tc + tn), t_val, jnp.float32)
    tb = tb.at[:, :tc].set(0.0)
    out_joint = longcat_dit_forward(params, cfg, full, tb, ctx, mask,
                                    num_cond_latents=tc, policy=FP32_POLICY)

    kv = longcat_dit_cache_cond(params, cfg, cond, policy=FP32_POLICY)
    assert kv.shape[0] == cfg.depth and kv.shape[1] == 2
    tb_n = jnp.full((b, tn), t_val, jnp.float32)
    out_cache = longcat_dit_forward_with_cache(
        params, cfg, noise, tb_n, ctx, kv, (tc,),
        encoder_attention_mask=mask, policy=FP32_POLICY)

    np.testing.assert_allclose(np.asarray(out_cache),
                               np.asarray(out_joint[:, :, tc:]),
                               atol=5e-4, rtol=5e-4)


def test_vc_cached_forward_ulysses_parity(lc, rng):
    """The vc KV-cache path over a (dp,fsdp,sp) mesh — cache build and
    cached denoise both through the Ulysses all-to-all attention with a
    sequence-sharded cache — must match the single-device forward (the
    multi-chip vc serving layout; VERDICT r4 item 6 follow-through)."""
    from jax.sharding import NamedSharding, PartitionSpec as PS
    from worldforge_tpu.core.mesh import make_mesh
    from worldforge_tpu.core.dtypes import FP32_POLICY
    from worldforge_tpu.parallel.sharding import shard_params_fsdp

    cfg, params, _, _ = lc
    cfg = type(cfg)(**{**cfg.__dict__, "num_heads": 4})
    params = init_longcat_dit(jax.random.key(5), cfg, dtype=jnp.float32)
    b, tc, tn, hh, ww = 1, 2, 3, 8, 8   # Sc=8, Sn=12, Sc+Sn=20 — all %4==0
    cond = jnp.asarray(rng.standard_normal((b, 4, tc, hh, ww)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((b, 4, tn, hh, ww)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 6, cfg.caption_channels)),
                      jnp.float32)
    mask = jnp.ones((b, 6), jnp.int32)
    tb = jnp.full((b, tn), 640.0, jnp.float32)

    kv_ref = longcat_dit_cache_cond(params, cfg, cond, policy=FP32_POLICY)
    out_ref = longcat_dit_forward_with_cache(
        params, cfg, noise, tb, ctx, kv_ref, (tc,),
        encoder_attention_mask=mask, policy=FP32_POLICY)

    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    sharded = shard_params_fsdp(params, mesh)
    with mesh:
        kv = jax.jit(lambda p, c: longcat_dit_cache_cond(
            p, cfg, c, policy=FP32_POLICY, mesh=mesh))(sharded, cond)
        out = jax.jit(lambda p, n, kv_: longcat_dit_forward_with_cache(
            p, cfg, n, tb, ctx, kv_, (tc,), encoder_attention_mask=mask,
            policy=FP32_POLICY, mesh=mesh))(sharded, noise, kv)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(kv_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-4, rtol=5e-4)


def test_generate_vc(lc, rng):
    cfg, params, vae_cfg, vae_params = lc
    pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)
    video = jnp.asarray(rng.uniform(-1, 1, (1, 3, 5, 16, 16)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, 6, cfg.caption_channels)),
                     jnp.float32)
    pm = jnp.ones((1, 6), jnp.int32)
    out = pipe.generate_vc(jax.random.key(2), video, pe, pm, height=16,
                           width=16, num_frames=13, num_cond_frames=5,
                           num_inference_steps=3, enhance_hf=False)
    assert out.shape == (1, 3, 13, 16, 16)
    assert np.isfinite(out).all()


def test_vc_bf16_cache_drift(lc, rng):
    """bf16 cond-token KV cache (the 16 GB serving recipe: the production
    fp32 cache alone is 9.1 GB and OOMs next to the int4 DiT — round-4
    measurement) must track the fp32-cache continuation closely. Only the
    fp32->bf16 rounding BEFORE RoPE differs; the attention consuming the
    cache runs bf16 q/k/v either way under the default policy."""
    cfg, params, vae_cfg, vae_params = lc
    video = jnp.asarray(rng.uniform(-1, 1, (1, 3, 5, 16, 16)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, 6, cfg.caption_channels)),
                     jnp.float32)
    pm = jnp.ones((1, 6), jnp.int32)
    kwargs = dict(height=16, width=16, num_frames=13, num_cond_frames=5,
                  num_inference_steps=3, enhance_hf=False,
                  output_type="latent")
    outs = {}
    for cdt in ("float32", "bfloat16"):
        pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                               vae_params=vae_params, vae_cfg=vae_cfg,
                               vc_cache_dtype=cdt)
        outs[cdt] = np.asarray(
            pipe.generate_vc(jax.random.key(2), video, pe, pm, **kwargs))
    ref = outs["float32"]
    drift = np.abs(outs["bfloat16"] - ref).max() / (np.abs(ref).max() + 1e-8)
    assert drift < 2e-2, f"bf16-cache drift {drift:.4f}"
    assert drift > 0.0  # the rounding is real — a vacuous gate would hide
    # a cache_dtype that silently stopped being threaded


def test_generate_vc_enhance_hf_schedule(lc, rng):
    cfg, params, vae_cfg, vae_params = lc
    pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)
    video = jnp.asarray(rng.uniform(-1, 1, (1, 3, 5, 16, 16)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, 6, cfg.caption_channels)),
                     jnp.float32)
    pm = jnp.ones((1, 6), jnp.int32)
    out = pipe.generate_vc(jax.random.key(3), video, pe, pm, height=16,
                           width=16, num_frames=13, num_cond_frames=5,
                           num_inference_steps=4, enhance_hf=True)
    assert out.shape == (1, 3, 13, 16, 16)


def test_generate_t2v(lc, rng):
    cfg, params, vae_cfg, vae_params = lc
    pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                           vae_params=vae_params, vae_cfg=vae_cfg)
    pe = jnp.asarray(rng.standard_normal((1, 6, cfg.caption_channels)),
                     jnp.float32)
    ne = jnp.asarray(rng.standard_normal((1, 6, cfg.caption_channels)),
                     jnp.float32)
    pm = jnp.ones((1, 6), jnp.int32)
    out = pipe.generate_t2v(jax.random.key(4), pe, pm, ne, pm, height=16,
                            width=16, num_frames=9, num_inference_steps=2,
                            guidance_scale=4.0)
    assert out.shape == (1, 3, 9, 16, 16)
    assert np.isfinite(out).all()
