"""LongCat-Video WorldForge pipeline: generate_i2v (+t2v) with IRR/FLF/DSG.

Behavioral reference: LongCatVideoPipeline.generate_i2v
(/root/reference/longcat_for_worldforge/longcat_video/pipeline_longcat_video.py
:619-1006):

  - first frame VAE-encoded into latent slot 0 (prepare_latents :215-286,
    num_cond_latents=1); per-frame timesteps with t[:, 0] = 0 (:864-865)
  - CFG batch-doubling + CFG-zero optimized scale (:875-885), then the
    model output is NEGATED for the scheduler (:888)
  - scheduler.step on latents[:, :, 1:]; guided fuse runs on the FULL
    latents with a zeroed first-frame model output, then drops frame 0
    (scheduler :860-889)
  - IRR re-noise of pred_x0 at sigma_i (:923-939); DSG extrapolation with a
    plain (unguided) Euler re-step (:946-986), gated on `guided`
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core.dtypes import Policy, DEFAULT_POLICY
from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                               longcat_dit_forward)
from worldforge_tpu.models.wan.vae import WanVAEConfig
from worldforge_tpu.sampling.channel_select import apply_channel_replacement
from worldforge_tpu.sampling.flow_match import (FlowMatchSchedule,
                                                cfg_zero_combine,
                                                fm_euler_step,
                                                make_flow_match_schedule)
from worldforge_tpu.sampling.guidance import (GuidanceConfig, flf_select,
                                              fuse_latents)


@dataclasses.dataclass(eq=False)  # identity hash (lru_cache on methods)
class LongCatPipeline:
    dit_params: dict
    dit_cfg: LongCatDiTConfig
    vae_params: dict
    vae_cfg: WanVAEConfig
    policy: Policy = DEFAULT_POLICY
    vae_scale_t: int = 4
    vae_scale_s: int = 8
    streaming_vae: bool = False  # scan-streaming VAE (see WanI2VPipeline)
    streaming_vae_chunk: int = 1  # latent frames per decode scan step
    # H-strip tiling of the streaming decoder's spatial convs (exact;
    # vae_stream.py) — the 720p-decode-next-to-DiT capacity knob
    streaming_vae_spatial: int = 1
    # jax.sharding.Mesh for multi-chip serving: threaded into every DiT
    # forward (Ulysses sp / BSA ring-CP dispatch in models/longcat/dit.py)
    mesh: object = None
    # token-chunked FFN (exact math): shrinks the [N, ffn_hidden] gate
    # transients so the full int8 model + activations fit 16 GB HBM
    # (docs/SERVING.md); single-chip capacity knob, ignored under a mesh
    token_chunk: int = 1
    # compiler-chosen entry layouts for the DiT weights on the fused i2v
    # path (runtime/layouts.py — see WanI2VPipeline.auto_layout): removes
    # XLA's u8 layout copies of quantized stacks. Mutates self.dit_params.
    auto_layout: bool = False
    # generate_vc cond-token KV cache dtype: fp32 matches the reference
    # exactly (the CPU exact-match gate); "bfloat16" HALVES the cache —
    # the production vc config's fp32 cache alone is 9.1 GB and OOMs next
    # to the int4 DiT on 16 GB (measured round 4), bf16 (4.6 GB) fits.
    # Drift gated in tests/test_longcat_vc.py::test_vc_bf16_cache_drift.
    vc_cache_dtype: str = "float32"

    def _vae_fns(self):
        from worldforge_tpu.pipelines.vae_dispatch import vae_fn_pair
        return vae_fn_pair(self.streaming_vae, self.streaming_vae_chunk,
                           self.streaming_vae_spatial)

    @functools.cached_property
    def _vae_jit_fns(self):
        # params as a REAL jit arg, not a capture (vae_dispatch.jit_vae_fns);
        # cached because fresh jit wrappers re-compile the streaming VAE —
        # minutes per extra compile through the remote-compile tunnel
        d, e = self._vae_fns()
        jd = jax.jit(lambda p, z: d(p, self.vae_cfg, z))
        je = jax.jit(lambda p, v: e(p, self.vae_cfg, v))
        return (lambda z: jd(self.vae_params, z),
                lambda v: je(self.vae_params, v))

    def _vae_decode_fn(self):
        return self._vae_jit_fns[0]

    def _vae_encode_fn(self):
        return self._vae_jit_fns[1]

    @functools.cached_property
    def _dit_fn(self):
        cfg = self.dit_cfg

        @functools.partial(jax.jit, static_argnums=(5,))
        def run(params, latents, t_per_frame, ctx, ctx_mask,
                num_cond_latents):
            return longcat_dit_forward(
                params, cfg, latents.astype(jnp.float32), t_per_frame, ctx,
                encoder_attention_mask=ctx_mask,
                num_cond_latents=num_cond_latents, mesh=self.mesh,
                policy=self.policy, token_chunk=self.token_chunk)

        return run

    @functools.cached_property
    def _dit_fn_bsa(self):
        cfg = self.dit_cfg

        @functools.partial(jax.jit, static_argnums=(5, 6))
        def run(params, latents, t_per_frame, ctx, ctx_mask,
                num_cond_latents, sparsity):
            return longcat_dit_forward(
                params, cfg, latents.astype(jnp.float32), t_per_frame, ctx,
                encoder_attention_mask=ctx_mask,
                num_cond_latents=num_cond_latents,
                bsa_params={"sparsity": sparsity}, mesh=self.mesh,
                policy=self.policy, token_chunk=self.token_chunk)

        return run

    @functools.cached_property
    def _dit_fn_vc(self):
        """Jitted cached-KV continuation step + cond-cache builder — the
        generate_vc hot loop (one jit program each; without these the vc
        loop executes op-by-op, unusable through the device tunnel)."""
        from worldforge_tpu.models.longcat.dit import (
            longcat_dit_cache_cond, longcat_dit_forward_with_cache)
        cfg = self.dit_cfg

        @jax.jit
        def cache_cond(params, cond_lat):
            return longcat_dit_cache_cond(
                params, cfg, cond_lat, policy=self.policy,
                cache_dtype=jnp.dtype(self.vc_cache_dtype),
                mesh=self.mesh)

        @functools.partial(jax.jit, static_argnums=(5,))
        def step(params, latents, t_per_frame, ctx, kv_cache, cond_grid,
                 ctx_mask):
            return longcat_dit_forward_with_cache(
                params, cfg, latents.astype(jnp.float32), t_per_frame, ctx,
                kv_cache, cond_grid, encoder_attention_mask=ctx_mask,
                policy=self.policy, mesh=self.mesh)

        return cache_cond, step

    def _make_fused_fns(self, guidance: GuidanceConfig, do_cfg: bool,
                        guided_on: bool, gscale: float, dit_params,
                        vae_params, pe, pmask, ne, nmask, video_ref, mask,
                        t_lat: int):
        """model_fn/fuse_fn closures over TRACED args — shared by the
        one-program fused runner and the chunked-execution programs."""
        from worldforge_tpu.ops.flow import video_channel_flows_pair
        from worldforge_tpu.sampling.channel_select import (
            _flow_similarity_scores, select_mask_longcat_device)
        from worldforge_tpu.sampling.guidance import fuse_latents as _fuse

        cfg = self.dit_cfg

        def model_fn(lat, t):
            tb = jnp.broadcast_to(t, (lat.shape[0], t_lat))
            tb = tb.at[:, 0].set(0.0)
            v = longcat_dit_forward(dit_params, cfg,
                                    lat.astype(jnp.float32), tb, pe,
                                    encoder_attention_mask=pmask,
                                    num_cond_latents=1,
                                    mesh=self.mesh, policy=self.policy,
                                    token_chunk=self.token_chunk)
            if do_cfg:
                vu = longcat_dit_forward(dit_params, cfg,
                                         lat.astype(jnp.float32), tb,
                                         ne, encoder_attention_mask=nmask,
                                         num_cond_latents=1,
                                         mesh=self.mesh,
                                         policy=self.policy,
                                         token_chunk=self.token_chunk)
                v = cfg_zero_combine(v, vu, gscale)
            return -v

        fuse_fn = None
        if guided_on:
            def fuse_fn(x0_full, step):
                pre = x0_full
                _d, _e = self._vae_fns()
                fused = _fuse(
                    x0_full, video_ref, mask,
                    lambda z: _d(vae_params, self.vae_cfg, z),
                    lambda v: _e(vae_params, self.vae_cfg, v))
                if guidance.use_flf:
                    scores = _flow_similarity_scores(
                        *video_channel_flows_pair(pre, fused),
                        variant="longcat")
                    m = select_mask_longcat_device(
                        scores, step, guidance.distill,
                        guidance.max_replace)
                    m = m[None, :, None, None, None]
                    fused = fused * (1.0 - m) + pre * m
                return fused

        return model_fn, fuse_fn

    @functools.lru_cache(maxsize=8)
    def _fused_runner(self, guidance: GuidanceConfig, num_steps: int,
                      flow_shift: float, use_distill: bool, do_cfg: bool,
                      guided_on: bool, gscale: float):
        """One cached jit program for the whole i2v denoise loop."""
        from worldforge_tpu.sampling.engine import longcat_denoise_scan

        sched = make_flow_match_schedule(num_steps, shift=flow_shift,
                                         use_distill=use_distill)

        @jax.jit
        def run(dit_params, vae_params, latents, pe, pmask, ne, nmask,
                video_ref, mask, key):
            model_fn, fuse_fn = self._make_fused_fns(
                guidance, do_cfg, guided_on, gscale, dit_params, vae_params,
                pe, pmask, ne, nmask, video_ref, mask, latents.shape[2])
            return longcat_denoise_scan(model_fn, latents, sched, guidance,
                                        key=key, fuse_fn=fuse_fn)

        return run

    @functools.lru_cache(maxsize=16)
    def _chunk_prog(self, guidance: GuidanceConfig, do_cfg: bool,
                    guided_on: bool, gscale: float, seg_fuse: bool,
                    seg_irr: bool):
        """Jitted k-step scan program for chunked-execution fused serving
        (one program per (seg_fuse, seg_irr); jit re-specializes per chunk
        length). The fused math is IDENTICAL to longcat_denoise_scan —
        same make_longcat_body, same xs tables (longcat_scan_chunks) —
        split so no single device execution exceeds the runtime's
        watchdog (~65-72 s here; docs/COMPONENTS.md deviation 9,
        scripts/probe_long_execution.py)."""
        from worldforge_tpu.sampling.engine import make_longcat_body

        @jax.jit
        def run(dit_params, vae_params, lat, key, xs, pe, pmask, ne, nmask,
                video_ref, mask):
            model_fn, fuse_fn = self._make_fused_fns(
                guidance, do_cfg, guided_on, gscale, dit_params, vae_params,
                pe, pmask, ne, nmask, video_ref, mask, lat.shape[2])
            body = make_longcat_body(model_fn, fuse_fn, guidance,
                                     seg_fuse, seg_irr)
            (lat, key), _ = jax.lax.scan(body, (lat, key), xs)
            return lat, key

        return run

    def generate_i2v(
        self,
        key,
        image: jnp.ndarray,                    # [B,3,H,W] in [-1,1]
        prompt_embeds: jnp.ndarray,            # [B, M, 4096]
        prompt_mask: Optional[jnp.ndarray],    # [B, M]
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
        video_ref: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        guidance: GuidanceConfig = GuidanceConfig(flf_backend="longcat"),
        output_type: str = "np",
        noise_fn: Optional[Callable] = None,
        fused: bool = False,
        exec_chunk: int = 0,
    ):
        b = image.shape[0]
        do_cfg = guidance_scale > 1 and negative_prompt_embeds is not None \
            and not use_distill

        sched = make_flow_match_schedule(num_inference_steps,
                                         shift=flow_shift,
                                         use_distill=use_distill)
        t_lat = (num_frames - 1) // self.vae_scale_t + 1
        h_lat, w_lat = height // self.vae_scale_s, width // self.vae_scale_s
        z = self.dit_cfg.in_channels

        key, k_noise = jax.random.split(key)
        latents = jax.random.normal(k_noise, (b, z, t_lat, h_lat, w_lat),
                                    jnp.float32)
        enc = self._vae_encode_fn()
        dec = self._vae_decode_fn()
        cond_lat = enc(image[:, :, None].astype(jnp.float32))  # [B,z,1,h,w]
        latents = latents.at[:, :, :1].set(cond_lat)

        dit = self._dit_fn
        guided_on = guidance.guided and video_ref is not None and mask is not None
        gcfg = dataclasses.replace(guidance, flf_backend="longcat",
                                   distill=use_distill)

        if fused:
            ref_arg = video_ref if guided_on else jnp.zeros(
                (b, 3, num_frames, height, width), jnp.float32)
            mask_arg = mask if guided_on else jnp.zeros(
                (b, 1, num_frames, height, width), jnp.float32)
            if exec_chunk:
                # chunked-execution fused serving: the same compiled scan
                # body, dispatched in <=exec_chunk-step executions so no
                # single device execution exceeds the runtime watchdog
                # (~65-72 s here — docs/COMPONENTS.md deviation 9). Plain
                # jit (no relayout): the auto-layout win is Wan-i2v-sized
                # int4 stacks; LongCat compiles and fits without it.
                from worldforge_tpu.sampling.engine import \
                    longcat_scan_chunks
                plan = longcat_scan_chunks(sched, gcfg, guided_on,
                                           exec_chunk)
                ne_arg = (negative_prompt_embeds if do_cfg
                          else prompt_embeds)
                nm_arg = (negative_prompt_mask if do_cfg else prompt_mask)
                lat, k_run = latents, key
                for seg_fuse, seg_irr, xs in plan:
                    prog = self._chunk_prog(gcfg, do_cfg, guided_on,
                                            float(guidance_scale),
                                            seg_fuse, seg_irr)
                    xs_dev = tuple(jnp.asarray(t) for t in xs)
                    lat, k_run = prog(self.dit_params, self.vae_params,
                                      lat, k_run, xs_dev, prompt_embeds,
                                      prompt_mask, ne_arg, nm_arg,
                                      ref_arg, mask_arg)
                latents = lat
                if output_type == "latent":
                    return latents
                video = dec(latents)
                out = (np.asarray(video, np.float32) + 1.0) / 2.0
                return np.clip(out, 0.0, 1.0)
            runner = self._fused_runner(gcfg, num_inference_steps,
                                        flow_shift, use_distill, do_cfg,
                                        guided_on, float(guidance_scale))
            run_args = (self.dit_params, self.vae_params, latents,
                        prompt_embeds, prompt_mask,
                        negative_prompt_embeds if do_cfg else prompt_embeds,
                        negative_prompt_mask if do_cfg else prompt_mask,
                        ref_arg, mask_arg, key)
            if self.auto_layout:
                from worldforge_tpu.runtime.layouts import \
                    compile_auto_layouts
                compiled, run_args = compile_auto_layouts(
                    runner, run_args, auto_argnums=(0,))
                self.dit_params = run_args[0]   # now in preferred layout
                latents = compiled(*run_args)
            else:
                latents = runner(*run_args)
            if output_type == "latent":
                return latents
            video = dec(latents)
            out = (np.asarray(video, np.float32) + 1.0) / 2.0
            return np.clip(out, 0.0, 1.0)

        from worldforge_tpu.sampling.engine import longcat_denoise_loop

        def model_fn(lat, t_val, i, r):
            tb = jnp.full((b, t_lat), t_val, jnp.float32)
            tb = tb.at[:, 0].set(0.0)  # cond frame (:864-865)
            v = dit(self.dit_params, lat, tb, prompt_embeds, prompt_mask, 1)
            if do_cfg:
                vu = dit(self.dit_params, lat, tb,
                         negative_prompt_embeds, negative_prompt_mask, 1)
                v = cfg_zero_combine(v, vu, guidance_scale)
            return -v  # scheduler compatibility negation (:888)

        fuse_fn = None
        if guided_on:
            def fuse_fn(x0_full, i, r):
                pre_full = x0_full
                x0_full = fuse_latents(x0_full, video_ref, mask, dec, enc)
                if gcfg.use_flf:
                    sel = flf_select(pre_full, x0_full, i, gcfg)
                    if sel:
                        x0_full = apply_channel_replacement(
                            x0_full, pre_full, sel)
                return x0_full

        latents = longcat_denoise_loop(
            model_fn, latents, sched, gcfg, key=key, noise_fn=noise_fn,
            fuse_fn=fuse_fn)

        if output_type == "latent":
            return latents
        video = dec(latents)
        out = (np.asarray(video, np.float32) + 1.0) / 2.0
        return np.clip(out, 0.0, 1.0)

    def generate_t2v(
        self,
        key,
        prompt_embeds: jnp.ndarray,
        prompt_mask: Optional[jnp.ndarray],
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_mask: Optional[jnp.ndarray] = None,
        *,
        height: int = 480,
        width: int = 832,
        num_frames: int = 93,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        use_distill: bool = False,
        flow_shift: float = 1.0,
        output_type: str = "np",
    ):
        """Text-to-video (generate_t2v, pipeline :408-615: plain flow-match
        Euler loop, CFG-zero, no cond latents)."""
        b = prompt_embeds.shape[0]
        do_cfg = guidance_scale > 1 and negative_prompt_embeds is not None \
            and not use_distill
        sched = make_flow_match_schedule(num_inference_steps,
                                         shift=flow_shift,
                                         use_distill=use_distill)
        t_lat = (num_frames - 1) // self.vae_scale_t + 1
        key, k_n = jax.random.split(key)
        latents = jax.random.normal(
            k_n, (b, self.dit_cfg.in_channels, t_lat,
                  height // self.vae_scale_s, width // self.vae_scale_s),
            jnp.float32)
        dit = self._dit_fn
        for i in range(sched.num_steps):
            tb = jnp.full((b, t_lat), float(sched.timesteps[i]), jnp.float32)
            v = dit(self.dit_params, latents, tb, prompt_embeds,
                    prompt_mask, 0)
            if do_cfg:
                vu = dit(self.dit_params, latents, tb,
                         negative_prompt_embeds, negative_prompt_mask, 0)
                v = cfg_zero_combine(v, vu, guidance_scale)
            latents = fm_euler_step(sched, i, latents, -v)
        if output_type == "latent":
            return latents
        video = self._vae_decode_fn()(latents)
        out = (np.asarray(video, np.float32) + 1.0) / 2.0
        return np.clip(out, 0.0, 1.0)

    def generate_vc(
        self,
        key,
        video: jnp.ndarray,                    # [B,3,Tc,H,W] in [-1,1]
        prompt_embeds: jnp.ndarray,
        prompt_mask: Optional[jnp.ndarray],
        *,
        height: int = 480,
        width: int = 832,
        num_frames: int = 93,
        num_cond_frames: int = 13,
        num_inference_steps: int = 50,
        use_distill: bool = False,
        flow_shift: float = 1.0,
        enhance_hf: bool = True,
        output_type: str = "np",
    ):
        """Long-video continuation with per-block KV caches
        (generate_vc, pipeline :1010-1271): the DiT runs once over the
        clean conditioning latents collecting per-layer K/V; denoising then
        runs only on the noise latents attending to the cached cond tokens.
        enhance_hf replaces the timestep tail below 500 with a 10-step
        uniform ramp (:1157-1166); incompatible with distill."""
        from worldforge_tpu.sampling.flow_match import FlowMatchSchedule

        assert not (use_distill and enhance_hf), \
            "use_distill and enhance_hf cannot both be True (:1079)"
        b = video.shape[0]
        sched = make_flow_match_schedule(num_inference_steps,
                                         shift=flow_shift,
                                         use_distill=use_distill)
        if enhance_hf:
            keep = sched.timesteps[sched.timesteps > 500.0]
            tail = np.linspace(500.0, 0.0, 10, endpoint=False)
            ts = np.concatenate([keep, tail])
            sched = FlowMatchSchedule(
                sigmas=np.concatenate([ts / 1000.0, [0.0]]), timesteps=ts,
                num_steps=len(ts))

        n_cond_lat = 1 + (num_cond_frames - 1) // self.vae_scale_t
        t_lat = (num_frames - 1) // self.vae_scale_t + 1
        h_lat, w_lat = height // self.vae_scale_s, width // self.vae_scale_s

        enc = self._vae_encode_fn()
        cond_lat = enc(video[:, :, -num_cond_frames:].astype(jnp.float32))
        key, k_n = jax.random.split(key)
        noise = jax.random.normal(
            k_n, (b, self.dit_cfg.in_channels, t_lat - n_cond_lat,
                  h_lat, w_lat), jnp.float32)

        cache_cond, vc_step = self._dit_fn_vc
        kv_cache = cache_cond(self.dit_params, cond_lat)
        latents = noise
        for i in range(sched.num_steps):
            nt = latents.shape[2] // self.dit_cfg.patch_size[0]
            tb = jnp.full((b, nt), float(sched.timesteps[i]), jnp.float32)
            v = vc_step(self.dit_params, latents, tb, prompt_embeds,
                        kv_cache, (n_cond_lat,), prompt_mask)
            latents = fm_euler_step(sched, i, latents, -v)

        full = jnp.concatenate([cond_lat, latents], axis=2)
        if output_type == "latent":
            return full
        video_out = self._vae_decode_fn()(full)
        out = (np.asarray(video_out, np.float32) + 1.0) / 2.0
        return np.clip(out, 0.0, 1.0)

    def prepare_refine_latents(
        self,
        stage1_video: np.ndarray,              # [T, H_lo, W_lo, 3] in [0,1]
        *,
        height: int = 720,
        width: int = 1280,
        spatial_refine_only: bool = False,
        bsa_latent_granularity: int = 4,
    ) -> jnp.ndarray:
        """Upscale + pad + VAE-encode the stage-1 video (the front half of
        generate_refine, pipeline :1403-1428). Split out so a 16 GB serving
        host can run the 720p encode BEFORE the DiT is resident: at
        704x1280 the streaming encode's full-res conv transients OOM next
        to the int4 13.6B DiT (measured round 4), and the encode needs no
        DiT state."""
        t_in = stage1_video.shape[0]
        new_t = t_in if spatial_refine_only else 2 * t_in

        from worldforge_tpu.ops.sampling import resize3d_align_corners
        vid = jnp.asarray(stage1_video, jnp.float32).transpose(3, 0, 1, 2)[None]
        # align_corners=True bilinear+trilinear, matching the reference's
        # F.interpolate calls (pipeline :1403-1407) — jax.image.resize's
        # half-pixel mapping shifts the upscale by up to half a source px
        up = resize3d_align_corners(vid, new_t, height, width)
        up = up * 2.0 - 1.0

        # pad noise frames to BSA granularity (:1411-1424, no cond frames
        # in the WF upscale path)
        num_noise_latents = -(-new_t // self.vae_scale_t)
        num_noise_latents = (-(-num_noise_latents // bsa_latent_granularity)
                             * bsa_latent_granularity)
        frames_added = num_noise_latents * self.vae_scale_t - new_t
        if frames_added:
            pad_back = jnp.repeat(up[:, :, -1:], frames_added, axis=2)
            up = jnp.concatenate([up, pad_back], axis=2)

        return self._vae_encode_fn()(up)

    def generate_refine(
        self,
        key,
        stage1_video: Optional[np.ndarray],    # [T, H_lo, W_lo, 3] in [0,1]
        prompt_embeds: jnp.ndarray,
        prompt_mask: Optional[jnp.ndarray],
        *,
        height: int = 720,
        width: int = 1280,
        num_inference_steps: int = 50,
        flow_shift: float = 1.0,
        t_thresh: float = 0.5,
        spatial_refine_only: bool = False,
        bsa_latent_granularity: int = 4,
        use_bsa: bool = True,
        bsa_sparsity: float = 0.875,
        output_type: str = "np",
        stage1_latents: Optional[jnp.ndarray] = None,
    ):
        """SDEdit 480p->720p upscale (generate_refine, pipeline :1271-1511):
        bilinear spatial upscale (+trilinear 2x temporal unless
        spatial_refine_only), VAE encode, mix with noise at t_thresh,
        truncated Euler schedule from t_thresh, no CFG, noise frames padded
        to the BSA latent granularity. Pass `stage1_latents` (from
        prepare_refine_latents) to skip the upscale+encode — the 16 GB
        phase-ordering recipe (encode before the DiT is resident)."""
        if stage1_latents is not None:
            latent_up = stage1_latents
            new_t = (stage1_video.shape[0] if stage1_video is not None
                     else (latent_up.shape[2] - 1) * self.vae_scale_t + 1)
            if not spatial_refine_only and stage1_video is not None:
                new_t *= 2
        else:
            t_in = stage1_video.shape[0]
            new_t = t_in if spatial_refine_only else 2 * t_in
            latent_up = self.prepare_refine_latents(
                stage1_video, height=height, width=width,
                spatial_refine_only=spatial_refine_only,
                bsa_latent_granularity=bsa_latent_granularity)
        dec = self._vae_decode_fn()
        key, k_n = jax.random.split(key)
        noise = jax.random.normal(k_n, latent_up.shape, latent_up.dtype)
        latents = (1.0 - t_thresh) * latent_up + t_thresh * noise

        # truncated schedule: prepend t_thresh, keep steps below it (:1391-95)
        base = make_flow_match_schedule(num_inference_steps, shift=flow_shift)
        keep = base.timesteps[base.timesteps < t_thresh * 1000.0]
        timesteps = np.concatenate([[t_thresh * 1000.0], keep])
        sigmas = np.concatenate([timesteps / 1000.0, [0.0]])
        sched = FlowMatchSchedule(sigmas=sigmas, timesteps=timesteps,
                                  num_steps=len(timesteps))

        t_lat = latents.shape[2]
        # BSA requires the token grid to factor into (4,4,8) chunks
        hw_ok = (latents.shape[3] // 2) % 4 == 0 and \
                (latents.shape[4] // 2) % 8 == 0 and t_lat % 4 == 0
        if use_bsa and not hw_ok:
            print(f"generate_refine: BSA disabled — token grid "
                  f"({t_lat}, {latents.shape[3] // 2}, "
                  f"{latents.shape[4] // 2}) does not factor into (4,4,8) "
                  f"chunks; running dense attention (pick e.g. 768x1280 -> "
                  f"48x80 tokens for the sparse path)")
        for i in range(sched.num_steps):
            tb = jnp.full((1, t_lat), float(sched.timesteps[i]), jnp.float32)
            if use_bsa and hw_ok:
                v = self._dit_fn_bsa(self.dit_params, latents, tb,
                                     prompt_embeds, prompt_mask, 0,
                                     bsa_sparsity)
            else:
                v = self._dit_fn(self.dit_params, latents, tb, prompt_embeds,
                                 prompt_mask, 0)
            v = -v
            latents = fm_euler_step(sched, i, latents, v)

        if output_type == "latent":
            return latents
        video = dec(latents)
        out = (np.asarray(video, np.float32) + 1.0) / 2.0
        out = np.clip(out, 0.0, 1.0)
        return out[:, :, :new_t]  # drop granularity padding
