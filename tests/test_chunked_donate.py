"""run_fused_chunked buffer-ownership contract (ADVICE r4 medium +
VERDICT r4 item 2's donate-data lever):

- default (donate_data=False): the caller's condition/video_ref/mask
  buffers stay ALIVE after a clip — repeat-clip serving reuses them;
- donate_data=True: ownership transfers, the pre-relayout originals are
  deleted during the first compile (the capacity lever);
- a second clip through the cached programs must produce the same
  latents as the first (program cache + per-call data relayout).

Runs the auto-layout path on CPU (layouts are supported there too).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline
from worldforge_tpu.runtime.layouts import auto_layouts_supported
from worldforge_tpu.sampling.guidance import GuidanceConfig


def _tiny_pipe(auto_layout):
    vae_cfg = WanVAEConfig.tiny()
    cfg = WanDiTConfig(model_type="i2v", in_dim=4 + 2 * vae_cfg.z_dim,
                       out_dim=vae_cfg.z_dim, dim=64, ffn_dim=128,
                       num_heads=4, num_layers=2, text_len=16, text_dim=32,
                       freq_dim=16, clip_dim=64)
    return WanI2VPipeline(
        dit_params=init_wan_dit(jax.random.key(0), cfg),
        dit_cfg=cfg,
        vae_params=init_wan_vae(jax.random.key(1), vae_cfg),
        vae_cfg=vae_cfg, auto_layout=auto_layout)


def _clip_args(pipe, key=7):
    cfg = pipe.dit_cfg
    hpx = wpx = 32
    nf = 5
    b = 1
    image = jax.random.uniform(jax.random.key(key), (b, 3, hpx, wpx),
                               jnp.float32) * 2.0 - 1.0
    pe = jax.random.normal(jax.random.key(key + 1),
                           (b, cfg.text_len, cfg.text_dim))
    ne = jax.random.normal(jax.random.key(key + 2),
                           (b, cfg.text_len, cfg.text_dim))
    ie = jax.random.normal(jax.random.key(key + 3), (b, 257, cfg.clip_dim))
    ref = jax.random.uniform(jax.random.key(key + 4),
                             (b, 3, nf, hpx, wpx), jnp.float32)
    mask = jnp.ones((b, 1, nf, hpx, wpx), jnp.float32)
    return image, pe, ne, ie, ref, mask, hpx, wpx, nf


@pytest.mark.parametrize("auto_layout", [False, True])
def test_repeat_clip_keeps_caller_buffers(auto_layout):
    if auto_layout and not auto_layouts_supported():
        pytest.skip("no layout API in this jax")
    pipe = _tiny_pipe(auto_layout)
    image, pe, ne, ie, ref, mask, hpx, wpx, nf = _clip_args(pipe)
    g = GuidanceConfig(guided=True, guide_steps=2, resample_steps=2,
                       resample_round=2, use_flf=False)

    def one_clip():
        return pipe.generate(
            jax.random.key(9), image, pe, ne, ie, height=hpx, width=wpx,
            num_frames=nf, num_inference_steps=4, guidance_scale=4.0,
            video_ref=ref, mask=mask, guidance=g, output_type="latent",
            fused=True, exec_chunk=2)

    out1 = np.asarray(one_clip())
    # the caller's buffers must survive clip 1 (repeat-clip serving)
    assert not ref.is_deleted() and not mask.is_deleted()
    out2 = np.asarray(one_clip())   # through the cached chunk programs
    np.testing.assert_allclose(out2, out1, atol=1e-5, rtol=1e-5)


def test_donate_data_transfers_ownership():
    if not auto_layouts_supported():
        pytest.skip("no layout API in this jax")
    pipe = _tiny_pipe(auto_layout=True)
    image, pe, ne, ie, ref, mask, hpx, wpx, nf = _clip_args(pipe)
    g = GuidanceConfig(guided=True, guide_steps=2, resample_steps=2,
                       resample_round=2, use_flf=False)
    latents, condition = pipe.prepare_latents(jax.random.key(8), image, 1,
                                              hpx, wpx, nf)
    out = pipe.run_fused_chunked(
        g, 4, 5.0, True, True, 4.0, 2, latents, condition, pe, ne, ie,
        ref, mask, jax.random.key(9), donate_data=True)
    assert np.isfinite(np.asarray(out)).all()
    # ownership transferred: the pre-relayout originals were freed during
    # compile IF XLA picked a non-default layout for them; either way the
    # call must have succeeded — and with donate_data=False (other test)
    # the originals are guaranteed alive. Nothing further to assert
    # portably here: deletion only happens when a relayout copy was made.
