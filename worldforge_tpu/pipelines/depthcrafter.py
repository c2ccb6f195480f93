"""DepthCrafter pipeline: SVD-based video depth diffusion with sliding
windows.

Behavioral reference: DepthCrafterPipeline.__call__
(/root/reference/DepthCrafter/DepthCrafter/depthcrafter/depth_crafter_ppl.py
:87-366):

  - per-frame CLIP image embeds [1, T, 1024] (encode_video :20-48)
  - frames noise-augmented (sigma 0.02) then VAE-encoded as conditioning,
    concatenated on channels with the noisy latents (:272-274)
  - added_time_ids = (fps=7, motion_bucket=127, noise_aug) (:200-208)
  - sliding windows of `window_size` with `overlap`: first window denoises
    from pure noise; later windows re-initialize their overlap region from
    the previous window's result re-noised to sigma_0
    (latents[:, :overlap] = prev + noise/init_sigma*sigma_0, :260-266),
    and results blend with linspace weights over the overlap (:330-333)
  - EDM Euler scheduler (v-prediction), optional CFG with zeroed
    conditioning (:280-300)
  - decode, average RGB channels to depth, min-max normalize
    (warp_depthcrafter.py run_depth_estimation :96-97)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.models.depthcrafter.unet import (SVDUNetConfig,
                                                     svd_unet_forward)
from worldforge_tpu.models.depthcrafter.vae import (SVDVAEConfig,
                                                    svd_vae_decode,
                                                    svd_vae_encode)
from worldforge_tpu.sampling.euler_edm import (EDMEulerSchedule,
                                               edm_euler_step,
                                               edm_scale_model_input,
                                               make_edm_euler_schedule)


@dataclasses.dataclass
class DepthCrafterPipeline:
    unet_params: dict
    unet_cfg: SVDUNetConfig
    vae_params: dict
    vae_cfg: SVDVAEConfig
    encode_frames_clip: Optional[callable] = None  # [T,3,H,W]->[T,1024]
    # exact-math transformer-block chunking (models/depthcrafter/unet.py::
    # _map_chunked): the 16 GB capacity knob for the published 1024x576
    # high-res windows (the reference needs 26 GB, README.md:180-184).
    # 1 = original single-pass program.
    attn_chunks: int = 1

    @functools.cached_property
    def _unet(self):
        cfg = self.unet_cfg
        chunks = self.attn_chunks

        @jax.jit
        def run(params, latents, t, ctx, add_ids):
            return svd_unet_forward(params, cfg, latents, t, ctx, add_ids,
                                    attn_chunks=chunks)

        return run

    def __call__(
        self,
        key,
        video: np.ndarray,               # [T, H, W, 3] in [0, 1]
        *,
        num_inference_steps: int = 25,
        guidance_scale: float = 1.0,
        window_size: int = 110,
        overlap: int = 25,
        noise_aug_strength: float = 0.02,
        decode_chunk_size: int = 8,
    ) -> np.ndarray:
        """Returns decoded frames [T, H, W, 3] in [-1, 1] (depth is the
        channel mean, normalized by the caller)."""
        t_frames, H, W, _ = video.shape
        if t_frames <= window_size:
            window_size, overlap = t_frames, 0
        stride = window_size - overlap

        frames = jnp.asarray(video.transpose(0, 3, 1, 2), jnp.float32)
        frames = frames * 2.0 - 1.0

        if self.encode_frames_clip is not None:
            clip_embeds = self.encode_frames_clip(frames)  # [T, D]
        else:
            clip_embeds = jnp.zeros((t_frames, self.unet_cfg.cross_attention_dim),
                                    jnp.float32)
        ctx_all = clip_embeds[None, :, None, :]  # [1, T, 1, D]

        key, k_aug = jax.random.split(key)
        frames_aug = frames + noise_aug_strength * jax.random.normal(
            k_aug, frames.shape, frames.dtype)
        cond_latents = []
        for s0 in range(0, t_frames, decode_chunk_size):
            cond_latents.append(svd_vae_encode(
                self.vae_params, self.vae_cfg,
                frames_aug[s0:s0 + decode_chunk_size], scale=False))
        video_latents = jnp.concatenate(cond_latents, axis=0)[None]
        # conditioning latents are the RAW latent_dist.mode() — the
        # reference applies NO scaling factor here
        # (depth_crafter_ppl.py:64,181); [1, T, 4, h, w]

        sched = make_edm_euler_schedule(num_inference_steps)
        add_ids = jnp.asarray([[7.0, 127.0, noise_aug_strength]], jnp.float32)
        do_cfg = guidance_scale > 1.0

        h_lat, w_lat = H // 8, W // 8
        zc = self.vae_cfg.latent_channels
        key, k_lat = jax.random.split(key)
        latents_init = jax.random.normal(
            k_lat, (1, window_size, zc, h_lat, w_lat), jnp.float32
        ) * sched.init_noise_sigma

        latents_all = None
        idx_start = 0
        weights = (jnp.linspace(0, 1, overlap).reshape(1, overlap, 1, 1, 1)
                   if overlap > 0 else None)

        while idx_start < t_frames - overlap or latents_all is None:
            idx_end = min(idx_start + window_size, t_frames)
            latents = latents_init[:, : idx_end - idx_start]
            latents_init = jnp.concatenate(
                [latents_init[:, -overlap:] if overlap else latents_init[:, :0],
                 latents_init[:, :stride]], axis=1)

            cond_cur = video_latents[:, idx_start:idx_end]
            ctx_cur = ctx_all[:, idx_start:idx_end]

            for i in range(sched.num_steps):
                if latents_all is not None and i == 0 and overlap > 0:
                    patch = (latents_all[:, -overlap:]
                             + latents[:, :overlap] / sched.init_noise_sigma
                             * float(sched.sigmas[0]))
                    latents = latents.at[:, :overlap].set(patch)

                t_cont = float(sched.timesteps[i])
                x_in = edm_scale_model_input(sched, i, latents)
                model_in = jnp.concatenate([x_in, cond_cur], axis=2)
                v = self._unet(self.unet_params, model_in, t_cont, ctx_cur,
                               add_ids)
                if do_cfg:
                    model_in_u = jnp.concatenate(
                        [x_in, jnp.zeros_like(x_in)], axis=2)
                    vu = self._unet(self.unet_params, model_in_u, t_cont,
                                    jnp.zeros_like(ctx_cur), add_ids)
                    v = vu + guidance_scale * (v - vu)
                latents = edm_euler_step(sched, i, latents, v)

            if latents_all is None:
                latents_all = latents
            else:
                blended = (latents[:, :overlap] * weights
                           + latents_all[:, -overlap:] * (1 - weights))
                latents_all = jnp.concatenate(
                    [latents_all[:, :-overlap], blended,
                     latents[:, overlap:]], axis=1)
            idx_start += stride
            if idx_end >= t_frames:
                break

        outs = []
        lat_flat = latents_all[0]
        for s0 in range(0, lat_flat.shape[0], decode_chunk_size):
            outs.append(svd_vae_decode(self.vae_params, self.vae_cfg,
                                       lat_flat[s0:s0 + decode_chunk_size]))
        frames_out = jnp.concatenate(outs, axis=0)  # [T, 3, H, W]
        return np.asarray(frames_out.transpose(0, 2, 3, 1), np.float32)


def normalize_depth(frames: np.ndarray) -> np.ndarray:
    """Channel-mean + min-max normalization (warp_depthcrafter.py:96-97)."""
    depth = frames.mean(axis=-1)
    lo, hi = depth.min(), depth.max()
    return (depth - lo) / max(hi - lo, 1e-8)
