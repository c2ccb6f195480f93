"""Checkpoint loading / pipeline assembly.

Real checkpoints: converted from the reference's torch/safetensors weights
(torch CPU is available in-image for reading; see convert_* helpers as they
land). ``random_init=True`` assembles a reduced-size random-weight pipeline
— the smoke-test/bench path for machines without the 14B weights (the one
real v5e chip here cannot hold Wan-14B bf16 anyway).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline


def _hash_embed(text: str, shape, scale: float = 1.0) -> jnp.ndarray:
    """Deterministic pseudo-embedding from text (random-init debug path)."""
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:4], "little")
    return scale * jax.random.normal(jax.random.key(seed), shape, jnp.float32)


def load_wan_pipeline(models_dir: Optional[str], variant: str = "480p",
                      random_init: bool = False
                      ) -> Tuple[WanI2VPipeline, Callable, Callable]:
    """Returns (pipeline, encode_text(str)->[1,L,D], encode_image(img)->
    [1,257,1280])."""
    if random_init or models_dir is None:
        vae_cfg = WanVAEConfig(dim=32, z_dim=16, dim_mult=(1, 2, 2, 2),
                               num_res_blocks=1)
        dit_cfg = WanDiTConfig(model_type="i2v", in_dim=36, out_dim=16,
                               dim=256, ffn_dim=512, num_heads=4,
                               num_layers=4)
        dit_params = init_wan_dit(jax.random.key(0), dit_cfg)
        # non-zero head so random-init output isn't the trivial zero field
        k = jax.random.key(99)
        dit_params["head"]["head"]["w"] = 0.02 * jax.random.normal(
            k, dit_params["head"]["head"]["w"].shape, jnp.float32).astype(
            dit_params["head"]["head"]["w"].dtype)
        vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
        pipe = WanI2VPipeline(dit_params=dit_params, dit_cfg=dit_cfg,
                              vae_params=vae_params, vae_cfg=vae_cfg)

        def encode_text(text: str) -> jnp.ndarray:
            return _hash_embed(text, (1, dit_cfg.text_len, dit_cfg.text_dim))

        def encode_image(img: np.ndarray) -> jnp.ndarray:
            h = hashlib.sha256(np.ascontiguousarray(img).tobytes()).digest()
            seed = int.from_bytes(h[:4], "little")
            return jax.random.normal(jax.random.key(seed), (1, 257, 1280),
                                     jnp.float32)

        return pipe, encode_text, encode_image

    from worldforge_tpu.io.convert_wan import load_converted_wan
    return load_converted_wan(models_dir, variant)


def load_longcat_pipeline(checkpoint_dir: Optional[str],
                          random_init: bool = False,
                          use_distill: bool = False):
    """Returns (LongCatPipeline, encode_text(str) -> (embeds, mask))."""
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit)
    from worldforge_tpu.pipelines.longcat import LongCatPipeline

    if random_init or checkpoint_dir is None:
        vae_cfg = WanVAEConfig(dim=32, z_dim=16, dim_mult=(1, 2, 2, 2),
                               num_res_blocks=1)
        cfg = LongCatDiTConfig(hidden_size=256, depth=4, num_heads=4,
                               caption_channels=4096, adaln_tembed_dim=64)
        params = init_longcat_dit(jax.random.key(0), cfg)
        vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
        pipe = LongCatPipeline(dit_params=params, dit_cfg=cfg,
                               vae_params=vae_params, vae_cfg=vae_cfg)

        def encode_text(text: str, max_len: int = 512):
            emb = _hash_embed(text, (1, max_len, cfg.caption_channels))
            n = min(max(len(text) // 4, 1), max_len)
            mask = jnp.zeros((1, max_len), jnp.int32).at[:, :n].set(1)
            return emb, mask

        return pipe, encode_text

    from worldforge_tpu.io.convert_longcat import load_converted_longcat
    return load_converted_longcat(checkpoint_dir, use_distill=use_distill)


def load_avatar_pipeline(checkpoint_dir: Optional[str],
                         random_init: bool = False,
                         use_distill: bool = False):
    """Returns (AvatarPipeline, encode_text, encode_audio(wav, n_frames)).

    Converted checkpoints expect <dir>/avatar_dit.safetensors (names per
    io/convert_longcat.py block mapping + avatar extras), <dir>/vae and
    <dir>/wav2vec2 (io/convert_wav2vec2.py)."""
    del use_distill  # distill sigmas handled inside generate
    from worldforge_tpu.models.encoders.wav2vec2 import Wav2Vec2Config
    from worldforge_tpu.models.longcat.avatar import (AvatarConfig,
                                                      init_avatar_dit)
    from worldforge_tpu.models.longcat.dit import LongCatDiTConfig
    from worldforge_tpu.pipelines.avatar import (AvatarPipeline,
                                                 encode_audio_windows)

    if random_init or checkpoint_dir is None:
        vae_cfg = WanVAEConfig(dim=32, z_dim=16, dim_mult=(1, 2, 2, 2),
                               num_res_blocks=1)
        base = LongCatDiTConfig(hidden_size=256, depth=4, num_heads=4,
                                caption_channels=4096, adaln_tembed_dim=64)
        cfg = AvatarConfig(base=base, audio_blocks=12, audio_channels=768,
                           intermediate_dim=128, output_dim=768,
                           context_tokens=8)
        w2v_cfg = Wav2Vec2Config(hidden_size=768, num_layers=12,
                                 num_heads=12, intermediate_size=1536)
        from worldforge_tpu.models.encoders.wav2vec2 import init_wav2vec2

        params = init_avatar_dit(jax.random.key(0), cfg)
        vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
        w2v_params = init_wav2vec2(jax.random.key(2), w2v_cfg)
        pipe = AvatarPipeline(dit_params=params, dit_cfg=cfg,
                              vae_params=vae_params, vae_cfg=vae_cfg)

        def encode_text(text: str, max_len: int = 512):
            emb = _hash_embed(text, (1, max_len, base.caption_channels))
            n = min(max(len(text) // 4, 1), max_len)
            mask = jnp.zeros((1, max_len), jnp.int32).at[:, :n].set(1)
            return emb, mask

        def encode_audio(wav: np.ndarray, num_frames: int,
                         window: int = cfg.audio_window):
            return encode_audio_windows(w2v_params, w2v_cfg,
                                        jnp.asarray(wav), num_frames,
                                        window=window)

        return pipe, encode_text, encode_audio

    import os

    from worldforge_tpu.io.convert_encoders import load_umt5_encoder
    from worldforge_tpu.io.convert_longcat import convert_avatar_dit
    from worldforge_tpu.io.convert_wan import convert_wan_vae
    from worldforge_tpu.io.convert_wav2vec2 import convert_wav2vec2
    from worldforge_tpu.io.torch_load import load_state_dict

    base = LongCatDiTConfig.longcat_13b()
    cfg = AvatarConfig(base=base)
    params = convert_avatar_dit(
        load_state_dict(os.path.join(checkpoint_dir, "dit")), cfg)
    vae_cfg = WanVAEConfig.wan_2_1()
    vae_params = convert_wan_vae(
        load_state_dict(os.path.join(checkpoint_dir, "vae")), vae_cfg)
    w2v_cfg = Wav2Vec2Config()
    w2v_params = convert_wav2vec2(
        load_state_dict(os.path.join(checkpoint_dir, "wav2vec2")), w2v_cfg)
    pipe = AvatarPipeline(dit_params=params, dit_cfg=cfg,
                          vae_params=vae_params, vae_cfg=vae_cfg)

    encode = load_umt5_encoder(os.path.join(checkpoint_dir, "text_encoder"),
                               os.path.join(checkpoint_dir, "tokenizer"))

    def encode_text(text: str, max_len: int = 512):
        emb = encode(text)
        mask = (jnp.abs(emb).sum(-1) > 0).astype(jnp.int32)
        return emb, mask

    def encode_audio(wav: np.ndarray, num_frames: int,
                     window: int = cfg.audio_window):
        return encode_audio_windows(w2v_params, w2v_cfg, jnp.asarray(wav),
                                    num_frames, window=window)

    return pipe, encode_text, encode_audio
