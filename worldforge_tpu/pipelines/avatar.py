"""Avatar (audio-driven talking-head) generation facade.

The reference vendors the avatar DiT + audio encoder without an in-repo
pipeline (longcat_video/modules/avatar/, audio_process/ — upstream
LongCat-Video capability, SURVEY §2.4); generation follows the base
LongCat i2v recipe (pipeline_longcat_video.py:619-1006) with the avatar
model: first latent frame = VAE-encoded reference image with t=0, CFG-zero
combination, Euler flow-match updates on noise frames, and per-latent-frame
audio context tokens threaded into every block.

Audio path: waveform -> wav2vec2 (features resampled to the VIDEO frame
count) -> per-frame sliding windows -> AudioProjModel inside the DiT.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core.dtypes import DEFAULT_POLICY, Policy
from worldforge_tpu.models.encoders.wav2vec2 import (Wav2Vec2Config,
                                                     get_audio_windows,
                                                     wav2vec2_forward)
from worldforge_tpu.models.longcat.avatar import (AvatarConfig,
                                                  avatar_dit_forward)
from worldforge_tpu.models.wan.vae import (WanVAEConfig, vae_decode,
                                           vae_encode)
from worldforge_tpu.sampling.flow_match import (cfg_zero_combine,
                                                fm_euler_step,
                                                make_flow_match_schedule)


def encode_audio_windows(w2v_params, w2v_cfg: Wav2Vec2Config,
                         waveform: jnp.ndarray, num_frames: int,
                         window: int = 5) -> jnp.ndarray:
    """[B, L] waveform -> [B, num_frames, window, blocks, C] per-frame
    audio windows for the avatar DiT."""
    feats = wav2vec2_forward(w2v_params, w2v_cfg, waveform,
                             seq_len=num_frames)
    return get_audio_windows(feats, window=window)


@dataclasses.dataclass(eq=False)
class AvatarPipeline:
    dit_params: dict
    dit_cfg: AvatarConfig
    vae_params: dict
    vae_cfg: WanVAEConfig
    policy: Policy = DEFAULT_POLICY
    vae_scale_t: int = 4
    vae_scale_s: int = 8
    # jax.sharding.Mesh: sp>1 routes the base self-attention through
    # Ulysses (models/longcat/avatar.py)
    mesh: object = None

    @functools.cached_property
    def _dit_fn(self):
        cfg, policy = self.dit_cfg, self.policy

        @functools.partial(jax.jit, static_argnums=(6,))
        def run(params, latents, t_per_frame, ctx, ctx_mask, audio,
                num_cond):
            return avatar_dit_forward(params, cfg, latents, t_per_frame,
                                      ctx, audio,
                                      encoder_attention_mask=ctx_mask,
                                      num_cond_latents=num_cond,
                                      policy=policy, mesh=self.mesh)

        return run

    def generate_i2v_audio(
        self,
        key,
        image: jnp.ndarray,                    # [B,3,H,W] in [-1,1]
        audio_embs: jnp.ndarray,               # [B,T_video,W,S,C_a]
        prompt_embeds: jnp.ndarray,
        prompt_mask: Optional[jnp.ndarray],
        negative_prompt_embeds: Optional[jnp.ndarray],
        negative_prompt_mask: Optional[jnp.ndarray],
        *,
        height: int = 480,
        width: int = 832,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        use_distill: bool = False,
        flow_shift: float = 1.0,
        output_type: str = "np",
    ):
        b = image.shape[0]
        do_cfg = (guidance_scale > 1 and negative_prompt_embeds is not None
                  and not use_distill)
        sched = make_flow_match_schedule(num_inference_steps,
                                         shift=flow_shift,
                                         use_distill=use_distill)
        t_lat = (num_frames - 1) // self.vae_scale_t + 1
        h_lat = height // self.vae_scale_s
        w_lat = width // self.vae_scale_s
        z = self.dit_cfg.base.in_channels

        key, k_noise = jax.random.split(key)
        latents = jax.random.normal(k_noise, (b, z, t_lat, h_lat, w_lat),
                                    jnp.float32)
        cond_lat = vae_encode(self.vae_params, self.vae_cfg,
                              image[:, :, None].astype(jnp.float32))
        latents = latents.at[:, :, :1].set(cond_lat)

        dit = self._dit_fn
        for i in range(sched.num_steps):
            tb = jnp.full((b, t_lat), float(sched.timesteps[i]), jnp.float32)
            tb = tb.at[:, 0].set(0.0)          # cond frame
            v = dit(self.dit_params, latents, tb, prompt_embeds, prompt_mask,
                    audio_embs, 1)
            if do_cfg:
                vu = dit(self.dit_params, latents, tb,
                         negative_prompt_embeds, negative_prompt_mask,
                         audio_embs, 1)
                v = cfg_zero_combine(v, vu, guidance_scale)
            v = -v                              # scheduler-compat negation
            latents = latents.at[:, :, 1:].set(
                fm_euler_step(sched, i, latents[:, :, 1:], v[:, :, 1:]))

        if output_type == "latent":
            return latents
        video = vae_decode(self.vae_params, self.vae_cfg, latents)
        out = (np.asarray(video, np.float32) + 1.0) / 2.0
        return np.clip(out, 0.0, 1.0)
