"""VACE generation facade: context preparation + denoise loop.

Behavioral reference: WanVace (wan/vace.py:37-477):
  - vace_encode_frames (:139-172): masked split into inactive
    (frames*(1-m)) and reactive (frames*m), each VAE-encoded (16ch) ->
    32 channels
  - vace_encode_masks (:174-207): the binary mask pixel-shuffled 8x8 into
    64 channels at latent spatial resolution, nearest temporal resize to
    the latent frame count
  - vace_latent (:209-210): context = [latents(32) || mask(64)] = 96ch
  - generate (:479-700): flow-UniPC CFG loop over the VACE model
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.models.wan.vace import VaceConfig, vace_forward
from worldforge_tpu.models.wan.vae import (WanVAEConfig, vae_decode,
                                           vae_encode)
from worldforge_tpu.sampling.unipc import (flow_pred_x0,
                                           make_flow_unipc_schedule,
                                           unip_update)


def encode_vace_masks(masks: jnp.ndarray, vae_stride=(4, 8, 8)
                      ) -> jnp.ndarray:
    """[B, 1, T, H, W] {0,1} -> [B, 64, T', H/8, W/8]
    (vace_encode_masks :174-207): 8x8 spatial pixel-shuffle into channels,
    nearest temporal resize to 1 + (T-1)//4 ... reference uses
    (T+3)//4 latent frames."""
    b, _, t, h, w = masks.shape
    st, sh, sw = vae_stride
    new_t = (t + 3) // st
    hh, ww = h // sh, w // sw
    m = masks[:, 0].reshape(b, t, hh, sh, ww, sw)
    m = m.transpose(0, 3, 5, 1, 2, 4).reshape(b, sh * sw, t, hh, ww)
    m = jax.image.resize(m, (b, sh * sw, new_t, hh, ww), method="nearest")
    return m


def prepare_vace_context(frames: jnp.ndarray, masks: Optional[jnp.ndarray],
                         vae_params, vae_cfg: WanVAEConfig,
                         ref_images: Optional[list] = None) -> jnp.ndarray:
    """frames [B,3,T,H,W] in [-1,1]; masks [B,1,T,H,W]; optional
    ref_images (list of [B,3,1,H,W]) -> vace_context [B, 96, T', H', W']
    (vace.py:139-210). Ref images are encoded as single-latent-frame
    prefixes: inactive half = ref latent, reactive half = zeros
    (vace.py:158-172), mask channels zero over the ref frames
    (vace.py:203-206)."""
    if masks is None:
        masks = jnp.ones(frames.shape[:1] + (1,) + frames.shape[2:],
                         frames.dtype)
    m = jnp.where(masks > 0.5, 1.0, 0.0)
    inactive = vae_encode(vae_params, vae_cfg, frames * (1.0 - m))
    reactive = vae_encode(vae_params, vae_cfg, frames * m)
    mask_enc = encode_vace_masks(m)
    t_lat = inactive.shape[2]
    mask_enc = mask_enc[:, :, :t_lat].astype(inactive.dtype)
    if ref_images:
        ref_lats = [vae_encode(vae_params, vae_cfg, r) for r in ref_images]
        ref = jnp.concatenate(ref_lats, axis=2)        # [B, z, R, h, w]
        inactive = jnp.concatenate([ref, inactive], axis=2)
        zpad = jnp.zeros_like(ref)
        reactive = jnp.concatenate([zpad, reactive], axis=2)
        mpad = jnp.zeros(mask_enc.shape[:2] + (ref.shape[2],)
                         + mask_enc.shape[3:], mask_enc.dtype)
        mask_enc = jnp.concatenate([mpad, mask_enc], axis=2)
    return jnp.concatenate([inactive, reactive, mask_enc], axis=1)


@dataclasses.dataclass(eq=False)
class WanVacePipeline:
    vace_params: dict
    vace_cfg: VaceConfig
    vae_params: dict
    vae_cfg: WanVAEConfig
    vae_scale_t: int = 4
    vae_scale_s: int = 8
    # see WanI2VPipeline.streaming_vae (required for 480p x 49f on 16 GB)
    streaming_vae: bool = False
    streaming_vae_chunk: int = 1

    def generate(
        self,
        key,
        src_video: jnp.ndarray,               # [B,3,T,H,W] in [-1,1]
        src_mask: Optional[jnp.ndarray],      # [B,1,T,H,W] (1 = edit region)
        prompt_embeds: jnp.ndarray,
        negative_prompt_embeds: Optional[jnp.ndarray],
        *,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        flow_shift: float = 5.0,
        context_scale: float = 1.0,
        output_type: str = "np",
    ):
        b, _, t, h, w = src_video.shape
        do_cfg = guidance_scale > 1 and negative_prompt_embeds is not None

        vace_context = prepare_vace_context(src_video, src_mask,
                                            self.vae_params, self.vae_cfg)
        sched = make_flow_unipc_schedule(num_inference_steps, flow_shift)
        t_lat = vace_context.shape[2]
        key, k_lat = jax.random.split(key)
        latents = jax.random.normal(
            k_lat, (b, self.vace_cfg.base.out_dim, t_lat,
                    h // self.vae_scale_s, w // self.vae_scale_s),
            jnp.float32)

        @jax.jit
        def dit(params, x, tval, ctx):
            return vace_forward(params, self.vace_cfg, x,
                                jnp.broadcast_to(tval, (b,)), vace_context,
                                ctx, vace_context_scale=context_scale)

        m0 = m1 = None
        for i in range(sched.num_steps):
            order = sched.order_for_step(i, min(i, 2))
            tval = jnp.float32(sched.timesteps[i])
            v = dit(self.vace_params, latents, tval, prompt_embeds)
            if do_cfg:
                vu = dit(self.vace_params, latents, tval,
                         negative_prompt_embeds)
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
