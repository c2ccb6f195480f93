"""Avatar generation facade (end-to-end at toy scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core.dtypes import FP32_POLICY
from worldforge_tpu.models.encoders.wav2vec2 import (Wav2Vec2Config,
                                                     init_wav2vec2)
from worldforge_tpu.models.longcat.avatar import AvatarConfig, init_avatar_dit
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.avatar import (AvatarPipeline,
                                             encode_audio_windows)


def test_encode_audio_windows_shapes(rng):
    cfg = Wav2Vec2Config.tiny()
    params = init_wav2vec2(jax.random.key(0), cfg)
    wav = jnp.asarray(rng.standard_normal((1, 3200)), jnp.float32)
    w = encode_audio_windows(params, cfg, wav, num_frames=9, window=5)
    assert w.shape == (1, 9, 5, cfg.num_layers, cfg.hidden_size)


def test_avatar_forward_ulysses_parity(rng):
    """Avatar self-attention over a (dp,fsdp,sp) mesh (Ulysses through
    _self_attention_lc) must match the single-device forward."""
    from worldforge_tpu.core.mesh import make_mesh
    from worldforge_tpu.models.longcat.avatar import avatar_dit_forward
    from worldforge_tpu.models.longcat.dit import LongCatDiTConfig
    from worldforge_tpu.parallel.sharding import shard_params_fsdp

    base = LongCatDiTConfig(in_channels=4, out_channels=4, hidden_size=64,
                            depth=2, num_heads=4, caption_channels=32,
                            adaln_tembed_dim=32,
                            frequency_embedding_size=16)
    cfg = AvatarConfig(base=base, audio_blocks=2, audio_channels=8,
                       intermediate_dim=16, output_dim=8, context_tokens=4)
    params = init_avatar_dit(jax.random.key(10), cfg, dtype=jnp.float32)
    b, t_lat, hh, ww = 1, 3, 8, 8       # 16 tokens/frame: 48 total, %4==0
    lat = jnp.asarray(rng.standard_normal((b, 4, t_lat, hh, ww)),
                      jnp.float32)
    tb = jnp.full((b, t_lat), 500.0, jnp.float32)
    tb = tb.at[:, 0].set(0.0)
    ctx = jnp.asarray(rng.standard_normal((b, 6, 32)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal(
        (b, 1 + (t_lat - 1) * 4, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)), jnp.float32)

    ref = avatar_dit_forward(params, cfg, lat, tb, ctx, audio,
                             num_cond_latents=1, policy=FP32_POLICY)
    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    sharded = shard_params_fsdp(params, mesh)
    with mesh:
        out = jax.jit(lambda p, x: avatar_dit_forward(
            p, cfg, x, tb, ctx, audio, num_cond_latents=1,
            policy=FP32_POLICY, mesh=mesh))(sharded, lat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_avatar_pipeline_generate(rng):
    vae_cfg = WanVAEConfig.tiny()   # z=4, stride (4,8,8)
    from worldforge_tpu.models.longcat.dit import LongCatDiTConfig
    base = LongCatDiTConfig(in_channels=vae_cfg.z_dim,
                            out_channels=vae_cfg.z_dim, hidden_size=64,
                            depth=2, num_heads=2, caption_channels=32,
                            adaln_tembed_dim=32,
                            frequency_embedding_size=16)
    cfg = AvatarConfig(base=base, audio_blocks=2, audio_channels=8,
                       intermediate_dim=16, output_dim=8, context_tokens=4)
    params = init_avatar_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)

    num_frames, h, w = 9, 16, 16
    pipe = AvatarPipeline(dit_params=params, dit_cfg=cfg,
                          vae_params=vae_params, vae_cfg=vae_cfg,
                          policy=FP32_POLICY)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 3, h, w)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal(
        (1, num_frames, cfg.audio_window, cfg.audio_blocks,
         cfg.audio_channels)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    ne = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)

    out = pipe.generate_i2v_audio(jax.random.key(2), image, audio, pe, None,
                                  ne, None, height=h, width=w,
                                  num_frames=num_frames,
                                  num_inference_steps=2,
                                  guidance_scale=3.0)
    assert out.shape == (1, 3, num_frames, h, w)
    assert np.isfinite(out).all()
