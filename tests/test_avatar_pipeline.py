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
