"""runtime/layouts.py: AUTO entry-layout compilation + weight relayout
(the round-3 fix that lets the guided DiT+VAE program fit 16 GB — on CPU
layouts are trivially row-major, so these tests pin the mechanics, not the
memory win)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.runtime.layouts import (auto_layouts_supported,
                                            compile_auto_layouts,
                                            jit_matching_layouts)


def test_jit_matching_layouts_on_relaid_args(rng):
    """A SECOND program over weights that compile_auto_layouts already
    relaid must pin its entry layouts to the weights' concrete formats:
    AUTO on already-relaid args raises ('Layout passed to jit does not
    match the layout on the respective arg' — hit on the e2e guided
    phase breakdown), and default layouts would re-insert copies."""
    params = {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)

    def f(p, x):
        return x @ p["w"]

    def f2(p, x):          # a different program over the same weights
        return (x @ p["w"]).sum(axis=1)

    want = np.asarray(f2(params, x))   # before relayout donates the source
    _, (relaid, x2) = compile_auto_layouts(f, (params, x), auto_argnums=(0,))
    g = jit_matching_layouts(f2, (relaid, x2), argnums=(0,))
    got = np.asarray(g(relaid, x2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_compile_auto_layouts_matches_plain(rng):
    params = {"a": jnp.asarray(rng.standard_normal((8, 16)), jnp.float32),
              "b": {"c": jnp.asarray(rng.standard_normal((16, 4)),
                                     jnp.float32)}}
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)

    def f(p, x):
        return (x @ p["a"]) @ p["b"]["c"]

    want = np.asarray(f(params, x))
    compiled, (new_params, new_x) = compile_auto_layouts(
        f, (params, x), auto_argnums=(0,))
    got = np.asarray(compiled(new_params, new_x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # tree structure preserved
    assert jax.tree.structure(new_params) == jax.tree.structure(params)
    assert auto_layouts_supported()


def test_pipeline_fused_auto_layout_path(rng):
    """The product fused guided pipeline with auto_layout=True produces
    the same latents as auto_layout=False (same key, same config)."""
    from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline
    from worldforge_tpu.sampling.guidance import GuidanceConfig

    vae_cfg = WanVAEConfig.tiny()
    cfg = WanDiTConfig(model_type="i2v", in_dim=4 + 2 * vae_cfg.z_dim,
                       out_dim=vae_cfg.z_dim, dim=32, ffn_dim=64,
                       num_heads=2, num_layers=2, text_len=8, text_dim=16,
                       freq_dim=16, clip_dim=32)
    dit_params = init_wan_dit(jax.random.key(0), cfg)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)

    image = jnp.asarray(rng.standard_normal((1, 3, 32, 32)) * 0.1,
                        jnp.float32)   # drawn ONCE: both gens see it

    def gen(auto):
        pipe = WanI2VPipeline(dit_params, cfg, vae_params, vae_cfg,
                              auto_layout=auto)
        pe = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
        ie = jnp.zeros((1, 257, cfg.clip_dim), jnp.float32)
        ref = jnp.zeros((1, 3, 5, 32, 32), jnp.float32) + 0.5
        mask = jnp.ones((1, 1, 5, 32, 32), jnp.float32)
        g = GuidanceConfig(guided=True, guide_steps=2, resample_steps=2,
                           use_flf=False)
        return np.asarray(pipe.generate(
            jax.random.key(2), image, pe, pe, ie, height=32, width=32,
            num_frames=5, num_inference_steps=3, guidance_scale=4.0,
            video_ref=ref, mask=mask, guidance=g, output_type="latent",
            fused=True))

    base = gen(False)
    auto = gen(True)
    np.testing.assert_allclose(auto, base, rtol=1e-5, atol=1e-5)


def test_longcat_pipeline_fused_auto_layout_path(rng):
    """LongCat fused guided i2v with auto_layout=True == auto_layout=False."""
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit)
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.longcat import LongCatPipeline
    from worldforge_tpu.sampling.guidance import GuidanceConfig
    import dataclasses as dc

    vae_cfg = WanVAEConfig.tiny()
    cfg = dc.replace(LongCatDiTConfig.tiny(),
                     in_channels=vae_cfg.z_dim, out_channels=vae_cfg.z_dim)
    dit_params = init_longcat_dit(jax.random.key(0), cfg)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)

    image = jnp.asarray(rng.standard_normal((1, 3, 32, 32)) * 0.1,
                        jnp.float32)   # drawn ONCE: both gens see it

    def gen(auto):
        pipe = LongCatPipeline(dit_params, cfg, vae_params, vae_cfg,
                               auto_layout=auto)
        pe = jnp.zeros((1, 6, cfg.caption_channels), jnp.float32)
        ref = jnp.zeros((1, 3, 5, 32, 32), jnp.float32) + 0.5
        mask = jnp.ones((1, 1, 5, 32, 32), jnp.float32)
        g = GuidanceConfig(guided=True, guide_steps=2, resample_steps=2,
                           use_flf=False, flf_backend="longcat")
        return np.asarray(pipe.generate_i2v(
            jax.random.key(2), image, pe, None, None, None, height=32,
            width=32, num_frames=5, num_inference_steps=3,
            guidance_scale=1.0, use_distill=True, video_ref=ref, mask=mask,
            guidance=g, output_type="latent", fused=True))

    base = gen(False)
    auto = gen(True)
    np.testing.assert_allclose(auto, base, rtol=1e-5, atol=1e-5)
