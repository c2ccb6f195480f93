"""Wan2.1 text-to-video and first-last-frame-to-video pipelines.

Behavioral reference: the vendored generation facades WanT2V
(wan/text2video.py:29-271) and WanFLF2V (wan/first_last_frame2video.py
:32-377): plain CFG denoise loop on the flow-UniPC schedule; FLF2V
conditions on BOTH the first and last frames (mask frames 0 and -1 set to
1, conditioning latents from an [first, zeros..., last] video, CLIP tokens
of both frames concatenated: 2x257).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core.dtypes import Policy, DEFAULT_POLICY
from worldforge_tpu.models.wan.dit import WanDiTConfig, wan_dit_forward
from worldforge_tpu.models.wan.vae import (WanVAEConfig, vae_decode,
                                           vae_encode)
from worldforge_tpu.sampling.unipc import (flow_pred_x0,
                                           make_flow_unipc_schedule,
                                           unip_update)


@dataclasses.dataclass
class WanT2VPipeline:
    """Also serves flf2v when dit_cfg.model_type == 'flf2v'."""

    dit_params: dict
    dit_cfg: WanDiTConfig
    vae_params: dict
    vae_cfg: WanVAEConfig
    policy: Policy = DEFAULT_POLICY
    vae_scale_t: int = 4
    vae_scale_s: int = 8
    # scan-streaming VAE decode: bounds activation memory to one temporal
    # chunk — required for 480p x 49f on small-HBM chips (the single-pass
    # decode OOMs on 16 GB; streaming runs in ~3.3 s/clip on a v5e)
    streaming_vae: bool = False
    streaming_vae_chunk: int = 1

    def generate(
        self,
        key,
        prompt_embeds: jnp.ndarray,
        negative_prompt_embeds: Optional[jnp.ndarray],
        *,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        flow_shift: float = 5.0,
        first_frame: Optional[jnp.ndarray] = None,   # [B,3,H,W] in [-1,1]
        last_frame: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,  # [B, 514, 1280] flf2v
        output_type: str = "np",
    ):
        if num_frames % self.vae_scale_t != 1:
            num_frames = num_frames // self.vae_scale_t * self.vae_scale_t + 1
        b = prompt_embeds.shape[0]
        do_cfg = guidance_scale > 1 and negative_prompt_embeds is not None
        flf = self.dit_cfg.model_type == "flf2v"

        sched = make_flow_unipc_schedule(num_inference_steps, flow_shift)
        t_lat = (num_frames - 1) // self.vae_scale_t + 1
        h_lat, w_lat = height // self.vae_scale_s, width // self.vae_scale_s
        z = self.dit_cfg.out_dim
        key, k_lat = jax.random.split(key)
        latents = jax.random.normal(k_lat, (b, z, t_lat, h_lat, w_lat),
                                    jnp.float32)

        cond = None
        if flf:
            assert first_frame is not None and last_frame is not None
            video_cond = jnp.concatenate([
                first_frame[:, :, None],
                jnp.zeros((b, 3, num_frames - 2, height, width),
                          first_frame.dtype),
                last_frame[:, :, None]], axis=2)
            cond_lat = vae_encode(self.vae_params, self.vae_cfg,
                                  video_cond.astype(jnp.float32))
            mask = np.zeros((b, 1, num_frames, h_lat, w_lat), np.float32)
            mask[:, :, 0] = 1.0
            mask[:, :, -1] = 1.0
            first = np.repeat(mask[:, :, 0:1], self.vae_scale_t, axis=2)
            mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
            mask = mask.reshape(b, t_lat, self.vae_scale_t, h_lat, w_lat)
            mask = mask.transpose(0, 2, 1, 3, 4)
            cond = jnp.concatenate([jnp.asarray(mask), cond_lat], axis=1)

        @jax.jit
        def dit(params, x, t, ctx):
            return wan_dit_forward(params, self.dit_cfg,
                                   x.astype(jnp.float32),
                                   jnp.broadcast_to(t, (b,)), ctx,
                                   clip_fea=image_embeds, y=cond,
                                   policy=self.policy)

        m0 = m1 = None
        for i in range(sched.num_steps):
            order = sched.order_for_step(i, min(i, 2))
            t = jnp.float32(sched.timesteps[i])
            v = dit(self.dit_params, latents, t, prompt_embeds)
            if do_cfg:
                vu = dit(self.dit_params, latents, t, negative_prompt_embeds)
                # vendored T2V CFG: uncond + g*(cond - uncond)
                # (text2video.py:253-255)
                v = vu + guidance_scale * (v - vu)
            m1 = m0
            m0 = flow_pred_x0(sched, i, v, latents)
            latents = unip_update(sched, i, order, latents, m0,
                                  m1 if order >= 2 else None)

        if output_type == "latent":
            return latents
        if self.streaming_vae:
            from worldforge_tpu.models.wan.vae_stream import \
                vae_decode_streaming
            video = vae_decode_streaming(self.vae_params, self.vae_cfg,
                                         latents,
                                         chunk=self.streaming_vae_chunk)
        else:
            video = vae_decode(self.vae_params, self.vae_cfg, latents)
        out = (np.asarray(video, np.float32) + 1.0) / 2.0
        return np.clip(out, 0.0, 1.0)
