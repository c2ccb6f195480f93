"""Wan2.1 image-to-video WorldForge pipeline (IRR + FLF + DSG).

Behavioral reference: WanImageToVideoPipeline
(/root/reference/wan_for_worldforge/utils/pipeline_wan_i2v_clean.py:388-753).
The denoise loop reproduces the reference's exact state machine:

  per outer step i (timestep t):
    for r in range(resample_steps):              # IRR (:573-662)
      r>0: model timestep = floor(sigma_i*1000); solver order/rollback
      noise_pred = cond + g*(cond - uncond)      # WF CFG form (:611)
      x0 = x - sigma_i * v; guided -> fuse_latents (decode/blend/encode
           + FLF channel hand-back)
      prev = UniP(x, m0, m1)
      i < resample_round and r < last: x = (1-sigma_i)*x0_fused + sigma_i*eps
    DSG (:664-708): if >=2 noise preds recorded, angular-extrapolate
    (omega, or omega_resample past guide_steps), re-convert (unfused),
    replace m0, redo the UniP update from the ORIGINAL x of this step.

Stateful reference hacks (step_index/order rollback, :584-587,683-706) map
to pure function calls with the same (i, order) arguments. DiT forwards and
the VAE fuse round-trip are jit-compiled; solver updates are static-
coefficient axpys.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.core.dtypes import Policy, DEFAULT_POLICY
from worldforge_tpu.models.wan.dit import WanDiTConfig, wan_dit_forward
from worldforge_tpu.models.wan.vae import WanVAEConfig
from worldforge_tpu.sampling.guidance import (GuidanceConfig, flf_select,
                                              fuse_latents)
from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule
from worldforge_tpu.sampling.channel_select import apply_channel_replacement


@dataclasses.dataclass(eq=False)  # identity hash (lru_cache on methods)
class WanI2VPipeline:
    """Holds params/configs; generation is functional underneath."""

    dit_params: dict
    dit_cfg: WanDiTConfig
    vae_params: dict
    vae_cfg: WanVAEConfig
    policy: Policy = DEFAULT_POLICY
    vae_scale_t: int = 4
    vae_scale_s: int = 8
    # scan-streaming VAE: bounds activation memory to one temporal chunk —
    # required for 480p x 49f on small-HBM chips (the single-pass decode
    # OOMs on 16 GB; streaming runs in ~3.3 s/clip on a v5e)
    streaming_vae: bool = False
    # latent frames decoded per scan step (mathematically identical for any
    # value; >1 trades activation memory for conv efficiency, and silently
    # falls back to 1 when it does not divide t-1)
    streaming_vae_chunk: int = 1
    # H-strip tiling of the streaming decoder's spatial convs (exact math,
    # vae_stream.py): >1 shrinks the per-chunk conv transients ~n-fold —
    # the capacity knob for 720p decode next to a resident DiT (12.65 GiB
    # of temps untiled, measured). Pick a divisor of the latent height.
    streaming_vae_spatial: int = 1
    # jax.sharding.Mesh for multi-chip serving: threaded into every DiT
    # forward (Ulysses sp / 2D sp_h x sp_w dispatch in models/wan/dit.py)
    mesh: object = None
    # compile the fused program with compiler-chosen entry layouts for the
    # DiT weights and relayout them once (runtime/layouts.py) — removes the
    # ~5 GB of u8 layout copies XLA otherwise inserts for int4 stacks; the
    # difference between guided DiT+VAE fitting a 16 GB chip and OOM.
    # Mutates self.dit_params to the preferred layout on first fused call.
    auto_layout: bool = False
    # token-chunked FFN (exact math, models/wan/dit.py::_ffn_token_chunked):
    # shrinks the [N, ffn_dim] gate transients — the single-chip capacity
    # knob that closes the fused guided program's round-3 ~36 MB 16 GB
    # miss. Ignored under a mesh.
    token_chunk: int = 1

    # ------------------------------------------------------------ pieces

    @functools.cached_property
    def _vae_jit_fns(self):
        # cached: jit_vae_fns builds FRESH jit wrappers per call, and a new
        # wrapper means a full re-trace/re-compile of the streaming VAE —
        # minutes per extra compile through the remote-compile tunnel
        from worldforge_tpu.pipelines.vae_dispatch import jit_vae_fns
        return jit_vae_fns(self.vae_params, self.vae_cfg,
                           self.streaming_vae, self.streaming_vae_chunk,
                           self.streaming_vae_spatial)

    def _vae_decode_fn(self):
        return self._vae_jit_fns[0]

    def _vae_encode_fn(self):
        return self._vae_jit_fns[1]

    @functools.cached_property
    def _dit_step(self):
        cfg = self.dit_cfg

        @jax.jit
        def run(params, latents, condition, t, ctx, ctx_neg, clip_fea, gscale):
            x = latents.astype(jnp.float32)
            y = condition.astype(jnp.float32)
            tb = jnp.broadcast_to(t, (latents.shape[0],))
            pred = wan_dit_forward(params, cfg, x, tb, ctx,
                                   clip_fea=clip_fea, y=y, mesh=self.mesh,
                                   policy=self.policy,
                                   token_chunk=self.token_chunk)
            uncond = wan_dit_forward(params, cfg, x, tb, ctx_neg,
                                     clip_fea=clip_fea, y=y, mesh=self.mesh,
                                   policy=self.policy,
                                   token_chunk=self.token_chunk)
            # WF CFG form: pred + g*(pred - uncond) (:611)
            return pred + gscale * (pred - uncond)

        @jax.jit
        def run_nocfg(params, latents, condition, t, ctx, clip_fea):
            x = latents.astype(jnp.float32)
            y = condition.astype(jnp.float32)
            tb = jnp.broadcast_to(t, (latents.shape[0],))
            return wan_dit_forward(params, cfg, x, tb, ctx,
                                   clip_fea=clip_fea, y=y, mesh=self.mesh,
                                   policy=self.policy,
                                   token_chunk=self.token_chunk)

        return run, run_nocfg

    def _make_fused_fns(self, guidance: GuidanceConfig, do_cfg: bool,
                        guided_on: bool, gscale: float, dit_params,
                        vae_params, condition, pe, ne, ie, video_ref, mask):
        """model_fn/fuse_fn/flf_fn closures over TRACED args — shared by
        the one-program fused runner and the chunked-execution programs."""
        from worldforge_tpu.sampling.channel_select import (
            select_mask_wan_device, _flow_similarity_scores)
        from worldforge_tpu.ops.flow import video_channel_flows_pair
        from worldforge_tpu.pipelines.vae_dispatch import vae_fn_pair

        cfg = self.dit_cfg
        _dec, _enc = vae_fn_pair(self.streaming_vae,
                                 self.streaming_vae_chunk,
                                 self.streaming_vae_spatial)

        def model_fn(lat, t):
            x = lat.astype(jnp.float32)
            y = condition.astype(jnp.float32)
            tb = jnp.broadcast_to(t, (lat.shape[0],))
            pred = wan_dit_forward(dit_params, cfg, x, tb, pe,
                                   clip_fea=ie, y=y, mesh=self.mesh,
                                   policy=self.policy,
                                   token_chunk=self.token_chunk)
            if do_cfg:
                unc = wan_dit_forward(dit_params, cfg, x, tb, ne,
                                      clip_fea=ie, y=y, mesh=self.mesh,
                                      policy=self.policy,
                                      token_chunk=self.token_chunk)
                pred = pred + gscale * (pred - unc)
            return pred

        fuse_fn = None
        flf_fn = None
        if guided_on:
            def fuse_fn(x0, step):
                return fuse_latents(
                    x0, video_ref, mask,
                    lambda z: _dec(vae_params, self.vae_cfg, z),
                    lambda v: _enc(vae_params, self.vae_cfg, v))

            if guidance.use_flf:
                def flf_fn(pre, fused_x0, step):
                    scores = _flow_similarity_scores(
                        *video_channel_flows_pair(pre, fused_x0))
                    m = select_mask_wan_device(scores, step)
                    m = m[None, :, None, None, None]
                    return fused_x0 * (1.0 - m) + pre * m

        return model_fn, fuse_fn, flf_fn

    @functools.lru_cache(maxsize=8)
    def _fused_runner(self, guidance: GuidanceConfig, num_steps: int,
                      flow_shift: float, do_cfg: bool, guided_on: bool,
                      gscale: float):
        """One cached jit program for the whole denoise loop (keyed on the
        static config; shapes key the XLA cache underneath)."""
        from worldforge_tpu.sampling.engine import wan_denoise_scan

        sched = make_flow_unipc_schedule(num_steps, flow_shift)

        @jax.jit
        def run(dit_params, vae_params, latents, condition, pe, ne, ie,
                video_ref, mask, key):
            model_fn, fuse_fn, flf_fn = self._make_fused_fns(
                guidance, do_cfg, guided_on, gscale, dit_params, vae_params,
                condition, pe, ne, ie, video_ref, mask)
            return wan_denoise_scan(model_fn, latents, sched, guidance,
                                    key=key, fuse_fn=fuse_fn, flf_fn=flf_fn,
                                    record_r0=do_cfg)

        return run

    @functools.lru_cache(maxsize=16)
    def _chunk_fn_raw(self, guidance: GuidanceConfig, do_cfg: bool,
                      guided_on: bool, gscale: float, seg_fuse: bool,
                      seg_irr: bool):
        """Un-jitted k-step scan program for chunked-execution fused
        serving (the ~65-75 s single-execution watchdog; docs/
        COMPONENTS.md deviation 9). Math identical to wan_denoise_scan:
        same make_wan_body, same xs tables (wan_scan_chunks); the UniPC
        m0/m1 multistep history crosses chunks via the carry. Arg order:
        (dit_params, vae_params, lat, m0, m1, key, xs, condition, pe, ne,
        ie, video_ref, mask)."""
        from worldforge_tpu.sampling.engine import make_wan_body

        def run(dit_params, vae_params, lat, m0, m1, key, xs, condition,
                pe, ne, ie, video_ref, mask):
            model_fn, fuse_fn, flf_fn = self._make_fused_fns(
                guidance, do_cfg, guided_on, gscale, dit_params, vae_params,
                condition, pe, ne, ie, video_ref, mask)
            body = make_wan_body(model_fn, fuse_fn, flf_fn, guidance,
                                 do_cfg, seg_fuse, seg_irr)
            carry, _ = jax.lax.scan(body, (lat, m0, m1, key), xs)
            return carry

        return run

    @functools.lru_cache(maxsize=16)
    def _chunk_prog(self, guidance: GuidanceConfig, do_cfg: bool,
                    guided_on: bool, gscale: float, seg_fuse: bool,
                    seg_irr: bool):
        """Plain-jit chunk program (the no-auto-layout path)."""
        return jax.jit(self._chunk_fn_raw(guidance, do_cfg, guided_on,
                                          gscale, seg_fuse, seg_irr))

    def prepare_latents(self, key, image, batch_size: int, height: int,
                        width: int, num_frames: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Noise + [4ch temporal mask || first-frame cond latents]
        (pipeline_wan_i2v_clean.py:301-362). image: [B,3,H,W] in [-1,1]."""
        t_lat = (num_frames - 1) // self.vae_scale_t + 1
        h_lat = height // self.vae_scale_s
        w_lat = width // self.vae_scale_s
        z = self.dit_cfg.out_dim
        latents = jax.random.normal(
            key, (batch_size, z, t_lat, h_lat, w_lat), jnp.float32)

        video_cond = jnp.concatenate([
            image[:, :, None],
            jnp.zeros((batch_size, 3, num_frames - 1, height, width),
                      image.dtype)], axis=2)
        cond_lat = self._vae_encode_fn()(video_cond.astype(jnp.float32))

        # temporal mask: frame 0 -> 1 repeated vae_scale_t times, rest 0,
        # folded into 4 channels per latent frame (:353-360)
        mask = np.zeros((batch_size, 1, num_frames, h_lat, w_lat), np.float32)
        mask[:, :, 0] = 1.0
        first = np.repeat(mask[:, :, 0:1], self.vae_scale_t, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(batch_size, t_lat, self.vae_scale_t, h_lat, w_lat)
        mask = mask.transpose(0, 2, 1, 3, 4)  # [B, 4, T', h, w]
        condition = jnp.concatenate([jnp.asarray(mask), cond_lat], axis=1)
        return latents, condition

    # ------------------------------------------------------------ generate

    def _run_fused_one_program(self, guidance, num_inference_steps,
                               flow_shift, do_cfg, guided_on, gscale,
                               latents, condition, prompt_embeds, ne_arg,
                               image_embeds, ref_arg, mask_arg, key):
        runner = self._fused_runner(
            guidance, num_inference_steps, flow_shift, do_cfg,
            guided_on, gscale)
        run_args = (self.dit_params, self.vae_params, latents,
                    condition, prompt_embeds, ne_arg,
                    image_embeds, ref_arg, mask_arg, key)
        if self.auto_layout:
            from worldforge_tpu.runtime.layouts import \
                compile_auto_layouts
            # auto-layout the big DATA args too (latents/condition/
            # ref/mask), not just the weight trees: with default entry
            # layouts XLA materializes HLO-temp copies of each (the
            # round-4 720p post-mortem shows a 119 MB copy of
            # video_ref alone) — on a 16 GB chip those copies are the
            # difference between the fused program fitting and not
            # donate only the self-owned weight trees (0, 1): donating the
            # caller-supplied data args (latents/condition/ref/mask) would
            # delete the caller's buffers whenever XLA picks a non-default
            # layout, breaking repeat-clip serving that reuses them
            compiled, run_args = compile_auto_layouts(
                runner, run_args, auto_argnums=(0, 1, 2, 3, 7, 8),
                donate_argnums=(0, 1))
            self.dit_params = run_args[0]   # now in preferred layout
            self.vae_params = run_args[1]
            self.__dict__.pop("_vae_jit_fns", None)  # old buffers donated
            return compiled(*run_args)
        return runner(*run_args)

    def run_fused_chunked(self, guidance, num_inference_steps, flow_shift,
                          do_cfg, guided_on, gscale, exec_chunk, latents,
                          condition, prompt_embeds, ne_arg, image_embeds,
                          ref_arg, mask_arg, key, on_chunk=None,
                          donate_data: bool = False,
                          fuse_cost: float = 0.5):
        """Chunked-execution fused serving: the SAME scan body as the
        one-program fused runner, dispatched in cost-weighted <=exec_chunk-
        plain-step executions so no single device execution exceeds the
        runtime watchdog (~65-75 s here; docs/COMPONENTS.md deviation 9).
        The UniPC m0/m1 multistep history rides the carry across chunks.
        Persistent (across-chunk) args get compiler-chosen layouts relaid
        once; the flowing carry (lat/m0/m1) keeps default layouts so the
        chunk programs compose. on_chunk(i, n_steps, seg_fuse, seg_irr,
        lat) is called after each chunk is dispatched with the chunk's
        output latents (the e2e script syncs + times each execution
        through it).

        donate_data=True additionally deletes the PRE-relayout originals
        of the per-clip data args (condition/ref/mask) once their relaid
        copies land — the caller hands over ownership. On 16 GB this
        frees ~150-300 MB during compile (the int6-chunked capacity
        lever, VERDICT r4 item 2); leave False for repeat-clip serving
        that reuses the caller's buffers. fuse_cost: fuse/plain step-cost
        ratio for the chunk plan (auto_exec_chunk estimates it per
        config; 0.5 = the measured 480p ratio)."""
        from worldforge_tpu.sampling.engine import wan_scan_chunks
        from worldforge_tpu.runtime.layouts import (
            auto_layouts_supported, compile_auto_layouts,
            jit_matching_layouts, relayout_arg)

        sched_c = make_flow_unipc_schedule(num_inference_steps, flow_shift)
        plan = wan_scan_chunks(sched_c, guidance, guided_on, exec_chunk,
                               fuse_cost=fuse_cost)
        lat = latents
        m0 = jnp.zeros_like(latents)
        m1 = jnp.zeros_like(latents)
        k_run = key
        use_layouts = self.auto_layout and auto_layouts_supported()
        # weights (0, 1) are relaid ONCE per process (originals donated);
        # per-clip data args (7, 11, 12 = condition/ref/mask) are relaid
        # per call to the same chosen formats, originals kept alive —
        # callers reuse them across clips
        LAYOUT_ARGS = (0, 1, 7, 11, 12)
        DATA_ARGS = (7, 11, 12)
        # instance-level program cache: repeat clips (steady-state serving)
        # reuse the layout-compiled executables — they are shape-
        # specialized, so the key includes the data shapes
        cache_key = (guidance, do_cfg, guided_on, gscale, exec_chunk,
                     latents.shape, condition.shape, prompt_embeds.shape,
                     ne_arg.shape, image_embeds.shape, ref_arg.shape,
                     mask_arg.shape)
        if not hasattr(self, "_chunk_progs_cache"):
            self._chunk_progs_cache = {}
        entry = self._chunk_progs_cache.setdefault(
            cache_key, {"progs": {}, "data_fmts": None})
        progs = entry["progs"]
        relaid = bool(progs)  # weights already relaid on a previous clip
        if relaid and use_layouts and entry["data_fmts"] is not None:
            condition = relayout_arg(condition, entry["data_fmts"][0],
                                     donate_old=False)
            ref_arg = relayout_arg(ref_arg, entry["data_fmts"][1],
                                   donate_old=False)
            mask_arg = relayout_arg(mask_arg, entry["data_fmts"][2],
                                    donate_old=False)
        for i, (seg_fuse, seg_irr, xs) in enumerate(plan):
            sig = (seg_fuse, seg_irr, len(xs[0]))
            xs_dev = tuple(jnp.asarray(t) for t in xs)
            args = (self.dit_params, self.vae_params, lat, m0, m1,
                    k_run, xs_dev, condition, prompt_embeds,
                    ne_arg, image_embeds, ref_arg, mask_arg)
            if sig not in progs:
                if not use_layouts:
                    progs[sig] = self._chunk_prog(
                        guidance, do_cfg, guided_on, gscale,
                        seg_fuse, seg_irr)
                else:
                    raw = self._chunk_fn_raw(
                        guidance, do_cfg, guided_on, gscale,
                        seg_fuse, seg_irr)
                    if not relaid:
                        try:
                            compiled, args = compile_auto_layouts(
                                raw, args, auto_argnums=LAYOUT_ARGS,
                                donate_argnums=(LAYOUT_ARGS if donate_data
                                                else (0, 1)))
                        except Exception as e:  # noqa: BLE001
                            if ("Ran out of memory" in str(e)
                                    or "RESOURCE_EXHAUSTED" in str(e)):
                                # capacity fail-fast (VERDICT r4 item 2):
                                # the AOT compiler budgets args+temps
                                # regardless of live chip state, so no
                                # runtime cleanup can rescue this combo
                                raise RuntimeError(
                                    "chunked-fused guided program exceeds "
                                    "this chip's HBM at compile (known: "
                                    "int6-FFN + chunked-fused needs "
                                    "~16.4 GiB vs 15.75 on a v5e — "
                                    "measured r4/r5). Serve this quant "
                                    "recipe with the per-phase dispatch "
                                    "loop (mode='loop'), or use all-int4 "
                                    "for chunked-fused; see docs/"
                                    "SERVING.md '16 GB recipe matrix'."
                                ) from e
                            raise
                        self.dit_params = args[0]
                        self.vae_params = args[1]
                        # the old VAE buffers were donated away — the
                        # cached decode/encode closures hold them
                        self.__dict__.pop("_vae_jit_fns", None)
                        condition, ref_arg, mask_arg = (
                            args[7], args[11], args[12])
                        fmts = compiled.input_formats[0]
                        entry["data_fmts"] = tuple(fmts[j]
                                                   for j in DATA_ARGS)
                        relaid = True
                        progs[sig] = compiled
                    else:
                        progs[sig] = jit_matching_layouts(
                            raw, args, argnums=LAYOUT_ARGS)
            lat, m0, m1, k_run = progs[sig](*args)
            if on_chunk is not None:
                on_chunk(i, len(xs[0]), seg_fuse, seg_irr, lat)
        return lat

    def generate(
        self,
        key,
        image: jnp.ndarray,                    # [B,3,H,W] in [-1,1]
        prompt_embeds: jnp.ndarray,            # [B, text_len, text_dim]
        negative_prompt_embeds: Optional[jnp.ndarray],
        image_embeds: jnp.ndarray,             # [B, 257, 1280]
        *,
        height: int = 480,
        width: int = 832,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        flow_shift: float = 5.0,
        video_ref: Optional[jnp.ndarray] = None,   # [B,3,T,H,W] in [0,1]
        mask: Optional[jnp.ndarray] = None,        # [B,1,T,H,W]
        guidance: GuidanceConfig = GuidanceConfig(),
        output_type: str = "np",
        callback: Optional[Callable[[int, jnp.ndarray], None]] = None,
        noise_fn: Optional[Callable] = None,
        fused: bool = False,
        exec_chunk: int = 0,
    ):
        """noise_fn(shape) -> array overrides the JAX RNG for initial
        latents and IRR re-noise — used by the drift harness to inject
        torch.Generator-compatible noise (utils/torch_rng.py).

        fused=True compiles the ENTIRE denoise loop (IRR + VAE fusion +
        device-side FLF + DSG) into one lax.scan program — no host round
        trips per step (SURVEY §7: the single biggest TPU win). Incompatible
        with noise_fn/callback."""
        if num_frames % self.vae_scale_t != 1:
            num_frames = num_frames // self.vae_scale_t * self.vae_scale_t + 1
        batch = image.shape[0]
        do_cfg = guidance_scale > 1 and negative_prompt_embeds is not None

        sched = make_flow_unipc_schedule(num_inference_steps, flow_shift)
        key, k_lat = jax.random.split(key)
        latents, condition = self.prepare_latents(
            k_lat, image, batch, height, width, num_frames)
        if noise_fn is not None:
            latents = jnp.asarray(noise_fn(latents.shape), jnp.float32)

        dec = self._vae_decode_fn()
        enc = self._vae_encode_fn()
        run_cfg, run_nocfg = self._dit_step

        guided_on = guidance.guided and video_ref is not None and mask is not None

        def model_fn(lat, t_model, i, r):
            t = jnp.float32(t_model)
            if do_cfg:
                return run_cfg(self.dit_params, lat, condition, t,
                               prompt_embeds, negative_prompt_embeds,
                               image_embeds, guidance_scale)
            return run_nocfg(self.dit_params, lat, condition, t,
                             prompt_embeds, image_embeds)

        fuse_fn = None
        if guided_on:
            def fuse_fn(x0, i, r):
                pre = x0  # unfused pred_x0 (FLF compares against this and
                # hands selected channels back, :1393-1412)
                x0 = fuse_latents(x0, video_ref, mask, dec, enc)
                if guidance.use_flf and r == 0:  # not while resampling
                    sel = flf_select(pre, x0, i, guidance)
                    if sel:
                        x0 = apply_channel_replacement(x0, pre, sel)
                return x0

        if fused:
            assert noise_fn is None and callback is None
            ref_arg = video_ref if guided_on else jnp.zeros(
                (batch, 3, num_frames, height, width), jnp.float32)
            mask_arg = mask if guided_on else jnp.zeros(
                (batch, 1, num_frames, height, width), jnp.float32)
            ne_arg = negative_prompt_embeds if do_cfg else prompt_embeds
            if exec_chunk:
                latents = self.run_fused_chunked(
                    guidance, num_inference_steps, flow_shift, do_cfg,
                    guided_on, float(guidance_scale), exec_chunk, latents,
                    condition, prompt_embeds, ne_arg, image_embeds,
                    ref_arg, mask_arg, key)
            else:
                latents = self._run_fused_one_program(
                    guidance, num_inference_steps, flow_shift, do_cfg,
                    guided_on, float(guidance_scale), latents, condition,
                    prompt_embeds, ne_arg, image_embeds, ref_arg, mask_arg,
                    key)
        else:
            from worldforge_tpu.sampling.engine import wan_denoise_loop
            latents = wan_denoise_loop(
                model_fn, latents, sched, guidance, key=key,
                noise_fn=noise_fn, fuse_fn=fuse_fn, callback=callback,
                record_r0=do_cfg)

        if output_type == "latent":
            return latents
        video = dec(latents)
        out = (np.asarray(video, np.float32) + 1.0) / 2.0
        return np.clip(out, 0.0, 1.0)
