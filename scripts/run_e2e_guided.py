"""End-to-end PRODUCTION-SCALE **GUIDED** clip on one v5e — the flagship
BASELINE.json config 4: Wan2.1-I2V-14B, 480p x 49 frames, 50-step x 2-CFG
flow-UniPC with the FULL WorldForge state machine (IRR resample_steps=2,
FLF device Farneback channel selection, DSG, pixel-space VAE fuse every
guided step), reference cost structure at pipeline_wan_i2v_clean.py:562-728.

The capacity recipe that makes DiT+VAE coexist in 16 GB (they must — the
scheduler calls the VAE inside the denoise loop):
  * ALL-int4 W4A8 DiT (~8.2 GB blocks, quality-gated at 5% guided drift in
    tests/test_int4_quality.py + production-shape drift in
    scripts/measure_int4_drift_prod.py);
  * compiler-chosen entry layouts for the weights (runtime/layouts.py —
    without them XLA materializes ~5 GB of u8 layout copies);
  * streaming VAE encode/decode (single-pass 480p decode cannot compile on
    16 GB even alone);
  * bf16 VAE params AND compute (the VAE entry casts activations to the
    param dtype): the fp32 VAE peaks too high next to the resident DiT —
    the reference runs its VAE fp32 (infer_worldforge.py:179-197), so this
    is a DOCUMENTED 16 GB-capacity deviation gated at 3.5% fuse drift in
    tests/test_guided_drift.py::test_bf16_vae_fuse_drift (--fp32-vae
    restores reference dtype on bigger-HBM chips).

Two execution modes:
  --mode loop (default): the reference-mirroring python loop — DiT step /
    VAE decode / VAE encode / FLF each its own jit program. Every program
    fits 16 GB individually; host dispatch (~25 ms/call) is noise against
    10 s DiT steps. Gives the per-phase breakdown for free.
  --mode fused: the ONE-PROGRAM lax.scan engine (wan_denoise_scan).
    Round 4: with data-arg auto layouts it now COMPILES on this 16 GB
    chip (args 9.85 / temps 6.30 GiB — round 3 missed by ~36 MB), but a
    ~900 s single execution trips the ~65-75 s runtime watchdog
    (COMPONENTS.md deviation 9). Add --exec-chunk 4 for CHUNKED-EXECUTION
    fused serving — the same scan body in cost-weighted sub-watchdog
    executions; measured steady-state denoise 807 s vs 887 s loop mode
    (docs/PERF.md round-4). Unchunked fused is the mode on watchdog-free
    runtimes.

Random-init weights (none exist in this env) and random prompt/CLIP
embeddings — the measurement is wall-clock sec/clip for the whole guided
serving path, not sample quality (quality is gated separately against the
reference oracle in tests/test_guided_drift.py).

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/run_e2e_guided.py [--steps 50] [--no-repeat] [--fp32-vae]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--mode", choices=("loop", "fused"), default="loop")
    ap.add_argument("--no-repeat", action="store_true",
                    help="skip the second (steady-state) clip run")
    ap.add_argument("--fp32-vae", action="store_true",
                    help="reference-dtype fp32 VAE (needs >16 GB HBM next "
                         "to the resident DiT; default is bf16 — see module "
                         "docstring)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--unguided", action="store_true",
                    help="plain 50-step CFG denoise, no IRR/FLF/fuse — the "
                         "720p measurement config (VERDICT r3 item 1b): the "
                         "fuse path at 720p needs the VAE at 90x160 latents "
                         "in-loop")
    ap.add_argument("--split-cfg", action="store_true",
                    help="run cond and uncond as two dispatches instead of "
                         "one fused CFG program (halves program temps — the "
                         "720p capacity fallback; ~25 ms extra dispatch)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-config CPU smoke of the script logic "
                         "(tiny DiT, narrow VAE, forces the cpu backend)")
    ap.add_argument("--token-chunk", type=int, default=1,
                    help="exact-math FFN token chunking (capacity lever "
                         "for the fused one-program mode: the round-3 "
                         "fused guided program missed 16 GB by ~36 MB; "
                         "chunking the 1.12 GB fp32 FFN gates frees far "
                         "more than that)")
    ap.add_argument("--decode-only", action="store_true",
                    help="measure ONLY the streaming VAE decode at the "
                         "target resolution (VAE alone on the chip) — "
                         "recovers the decode phase when the full run's "
                         "post-denoise co-resident decode OOMs")
    ap.add_argument("--decode-from", default=None,
                    help="decode latents from a .npy file with only the "
                         "VAE resident, then exit — the fresh-process "
                         "fallback the main run spawns when even the "
                         "post-cleanup in-process decode OOMs (a failed "
                         "720p execution can leave the allocator "
                         "unrecoverable in-process)")
    ap.add_argument("--exec-chunk", default="0",
                    help="fused mode: dispatch the SAME scan body in "
                         "cost-weighted <=k-plain-step executions so no "
                         "single device execution exceeds the ~65-75 s "
                         "watchdog (probe_long_execution.py). 'auto' "
                         "derives k + the fuse-cost ratio from the "
                         "measured cost tables "
                         "(sampling/engine.py::auto_exec_chunk — 4 at "
                         "480p, matching the round-4 tuning). 0 = one "
                         "program")
    ap.add_argument("--donate-data", action="store_true",
                    help="chunked fused: hand ownership of the per-clip "
                         "data args to the pipeline so the pre-relayout "
                         "originals are freed during compile (~150-300 MB "
                         "— the int6-chunked capacity lever; incompatible "
                         "with reusing the arrays for a repeat clip, so "
                         "the steady-state rep re-uploads them)")
    ap.add_argument("--spatial-chunks", type=int, default=1,
                    help="H-strip tiling of the streaming VAE decoder's "
                         "spatial convs (exact math, vae_stream.py): "
                         "shrinks the per-chunk decode transients ~n-fold "
                         "— the 720p-decode-next-to-DiT capacity knob "
                         "(12.65 GiB of temps untiled). Use a divisor of "
                         "the latent height (6 at 480p h=60; 6/9/10 at "
                         "720p h=90)")
    ap.add_argument("--quant", choices=("int4", "int6-ffn"), default="int4",
                    help="DiT capacity recipe: 'int4' = all-int4 W4A8 "
                         "(~8.1 GB, guided drift ~2%%); 'int6-ffn' = int6 "
                         "FFN + int4 attention W6A8/W4A8 (~9.5 GB, the "
                         "<=1e-2 drift-bar recipe — "
                         "scripts/measure_int4_drift_prod.py)")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    # resolve --exec-chunk (possibly 'auto') to (k, fuse_cost ratio)
    args.fuse_cost = 0.5
    if args.exec_chunk == "auto":
        from worldforge_tpu.sampling.engine import auto_exec_chunk
        from worldforge_tpu.sampling.guidance import GuidanceConfig as _GC
        t_lat = (args.frames - 1) // 4 + 1
        tokens = t_lat * (args.height // 16) * (args.width // 16)
        plan = auto_exec_chunk(
            "wan", tokens,
            fuse_pixels=0 if args.unguided else args.height * args.width,
            guidance=_GC())
        args.exec_chunk = plan.exec_chunk
        args.fuse_cost = plan.fuse_cost
        print(f"[auto-chunk] tokens {tokens}: exec_chunk "
              f"{plan.exec_chunk}, est plain {plan.plain_step_s:.1f} s / "
              f"fuse {plan.fuse_s:.1f} s, worst chunk "
              f"{plan.max_chunk_s:.0f} s, fits_watchdog "
              f"{plan.fits_watchdog}", flush=True)
        if not plan.fits_watchdog:
            print("[auto-chunk] WARNING: even single-step guided chunks "
                  "exceed the watchdog at this config — use --mode loop",
                  flush=True)
    else:
        args.exec_chunk = int(args.exec_chunk)

    from worldforge_tpu.core.dtypes import DEFAULT_POLICY
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit_w4,
                                               wan_dit_forward)
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline
    from worldforge_tpu.runtime.layouts import compile_auto_layouts
    from worldforge_tpu.sampling.guidance import GuidanceConfig

    t_all = time.perf_counter()
    dit_cfg = (WanDiTConfig.tiny("i2v") if args.smoke
               else WanDiTConfig.wan_14b_i2v())
    key = jax.random.key(0)

    # VAE first, DiT later (round 4): the one-shot conditioning encode in
    # prepare_latents runs with full HBM headroom — at 720p x 49f it OOMs
    # next to an already-resident 14B DiT (measured RESOURCE_EXHAUSTED),
    # and nothing in the unguided path needs the DiT before step 1
    vae_cfg = (WanVAEConfig(dim=8, num_res_blocks=1) if args.smoke
               else WanVAEConfig.wan_2_1())
    t0 = time.perf_counter()
    vae_dtype = jnp.float32 if args.fp32_vae else jnp.bfloat16
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg, dtype=vae_dtype)
    _sync(vae_params)
    print(f"[1] {'fp32' if args.fp32_vae else 'bf16'} VAE resident: "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    pipe = WanI2VPipeline(None, dit_cfg, vae_params, vae_cfg,
                          streaming_vae=True, auto_layout=True,
                          token_chunk=args.token_chunk,
                          streaming_vae_spatial=args.spatial_chunks)

    h, w, nf = args.height, args.width, args.frames

    if args.decode_only:
        lat = jax.random.normal(jax.random.key(5),
                                (1, 16, -(-nf // 4), h // 8, w // 8),
                                jnp.float32)
        _sync(lat)
        dec = pipe._vae_decode_fn()
        for rep in range(2):
            t0 = time.perf_counter()
            video = dec(lat)
            out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
            print(f"[decode-only] {h}x{w} streaming decode {out.shape} "
                  f"rep {rep + 1}: {time.perf_counter() - t0:.1f} s"
                  + (" (incl. compile)" if rep == 0 else " (steady-state)"),
                  flush=True)
        return

    if args.decode_from:
        lat = jnp.asarray(np.load(args.decode_from))
        _sync(lat)
        t0 = time.perf_counter()
        video = pipe._vae_decode_fn()(lat)
        out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
        print(f"[decode-from] {h}x{w} streaming decode {out.shape}: "
              f"{time.perf_counter() - t0:.1f} s (incl. compile)",
              flush=True)
        return
    image = jax.random.uniform(jax.random.key(2), (1, 3, h, w),
                               jnp.float32) * 2.0 - 1.0
    pe = jax.random.normal(jax.random.key(3),
                           (1, dit_cfg.text_len, dit_cfg.text_dim),
                           jnp.bfloat16)
    ne = jax.random.normal(jax.random.key(4), pe.shape, jnp.bfloat16)
    ie = jax.random.normal(jax.random.key(5), (1, 257, dit_cfg.clip_dim),
                           jnp.bfloat16)
    # ref/mask in the VAE compute dtype (fuse casts them there anyway;
    # keeping fp32 originals resident costs ~350 MB of args+copies)
    ref_dt = jnp.float32 if args.fp32_vae else jnp.bfloat16
    video_ref = jax.random.uniform(jax.random.key(6), (1, 3, nf, h, w),
                                   jnp.float32).astype(ref_dt)
    # WorldForge-like validity mask: ~70% reference-valid
    mask = (jax.random.uniform(jax.random.key(7), (1, 1, nf, h, w),
                               jnp.float32) > 0.3).astype(ref_dt)

    g = GuidanceConfig()  # reference production defaults: guided,
    # guide_steps=15, resample_steps=2, resample_round=20, omega=4, FLF on
    if args.unguided:
        # plain CFG denoise: one model call per step, no IRR/DSG/fuse
        g = GuidanceConfig(guided=False, resample_steps=1, omega=0.0,
                           use_flf=False)
    n_guided = 0 if args.unguided else min(g.guide_steps, args.steps)

    t0 = time.perf_counter()
    latents, condition = pipe.prepare_latents(jax.random.key(8), image, 1,
                                              h, w, nf)
    _sync(latents)
    print(f"[2] prepare_latents (streaming VAE encode compile + run): "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    t0 = time.perf_counter()
    int6_keys = ("fc1", "fc2") if args.quant == "int6-ffn" else ()
    dit_params = init_wan_dit_w4(key, dit_cfg, dtype=jnp.bfloat16,
                                 int4_keys=("*",), int6_keys=int6_keys)
    ffn_key = "w6" if int6_keys else "w4"
    _sync(dit_params["blocks"]["ffn"]["fc1"][ffn_key])
    pipe.dit_params = dit_params
    print(f"[3] {args.quant} 14B i2v resident alongside: "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    def report_memory(compiled):
        try:
            ma = compiled.memory_analysis()
            print(f"    memory analysis: args "
                  f"{ma.argument_size_in_bytes/2**30:.2f} GiB, temps "
                  f"{ma.temp_size_in_bytes/2**30:.2f} GiB", flush=True)
        except Exception:
            pass

    if args.mode == "fused":
        run_fused(args, pipe, g, n_guided, dit_params, vae_params, latents,
                  condition, pe, ne, ie, video_ref, mask, t_all,
                  report_memory)
        return

    # ---------------- loop mode: reference-mirroring python loop ---------
    from worldforge_tpu.sampling.channel_select import (
        apply_channel_replacement, select_channels_wan,
        _flow_similarity_scores)
    from worldforge_tpu.ops.flow import video_channel_flows_pair
    from worldforge_tpu.sampling.engine import wan_denoise_loop
    from worldforge_tpu.sampling.guidance import fuse_latents
    from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule

    one_c = combine = None  # populated by the split-CFG branch only
    if args.split_cfg:
        # 720p capacity fallback: one forward per program, CFG combine as
        # a third tiny dispatch — program temps ~halve vs the fused step
        def dit_one(params, lat, cond, t, ctx, ie):
            x = lat.astype(jnp.float32)
            y = cond.astype(jnp.float32)
            tb = jnp.broadcast_to(t, (lat.shape[0],))
            return wan_dit_forward(params, dit_cfg, x, tb, ctx, clip_fea=ie,
                                   y=y, policy=DEFAULT_POLICY)

        t0 = time.perf_counter()
        one_args = (dit_params, latents, condition, jnp.float32(1000.0),
                    pe, ie)
        one_c, one_args = compile_auto_layouts(dit_one, one_args,
                                               auto_argnums=(0,))
        dit_params = one_args[0]
        pipe.dit_params = dit_params
        combine = jax.jit(lambda p, u: p + 4.0 * (p - u))

        def step_c(params, lat, cond, t, pe_, ne_, ie_):
            pred = one_c(params, lat, cond, t, pe_, ie_)
            unc = one_c(params, lat, cond, t, ne_, ie_)
            return combine(pred, unc)

        print(f"[4] DiT split-CFG forward compiled (+weights relaid): "
              f"{time.perf_counter()-t0:.0f} s", flush=True)
        report_memory(one_c)
    else:
        def dit_cfg_step(params, lat, cond, t, pe, ne, ie):
            x = lat.astype(jnp.float32)
            y = cond.astype(jnp.float32)
            tb = jnp.broadcast_to(t, (lat.shape[0],))
            pred = wan_dit_forward(params, dit_cfg, x, tb, pe, clip_fea=ie,
                                   y=y, policy=DEFAULT_POLICY)
            unc = wan_dit_forward(params, dit_cfg, x, tb, ne, clip_fea=ie,
                                  y=y, policy=DEFAULT_POLICY)
            return pred + 4.0 * (pred - unc)

        t0 = time.perf_counter()
        step_args = (dit_params, latents, condition, jnp.float32(1000.0),
                     pe, ne, ie)
        step_c, step_args = compile_auto_layouts(dit_cfg_step, step_args,
                                                 auto_argnums=(0,))
        dit_params = step_args[0]
        pipe.dit_params = dit_params
        print(f"[4] DiT CFG step compiled (+weights relaid): "
              f"{time.perf_counter()-t0:.0f} s", flush=True)
        report_memory(step_c)

    dec, enc = pipe._vae_decode_fn(), pipe._vae_encode_fn()

    @jax.jit
    def flf_scores(a, b):
        return _flow_similarity_scores(*video_channel_flows_pair(a, b))

    phase = {"dit": [], "dec+enc": [], "flf": []}
    selections = []

    def model_fn(lat, t_model, i, r):
        t1 = time.perf_counter()
        out = step_c(dit_params, lat, condition, jnp.float32(t_model),
                     pe, ne, ie)
        _sync(out)
        phase["dit"].append(time.perf_counter() - t1)
        return out

    def fuse_fn(x0, i, r):
        pre = x0
        t1 = time.perf_counter()
        x0 = fuse_latents(x0, video_ref, mask, dec, enc)
        _sync(x0)
        phase["dec+enc"].append(time.perf_counter() - t1)
        if g.use_flf and r == 0:
            t1 = time.perf_counter()
            scores = np.asarray(flf_scores(pre, x0))
            sel = select_channels_wan(scores, i)
            phase["flf"].append(time.perf_counter() - t1)
            if sel:
                selections.append((i, tuple(sel)))
                x0 = apply_channel_replacement(x0, pre, sel)
        return x0

    sched = make_flow_unipc_schedule(args.steps, 5.0)

    def one_clip(tag):
        t0 = time.perf_counter()
        cb = (lambda i, lat: print(
            f"    step {i+1}/{args.steps} @ {time.perf_counter()-t0:.0f} s",
            flush=True) if (i + 1) % 10 == 0 else None)
        out = wan_denoise_loop(model_fn, latents, sched, g,
                               key=jax.random.key(10),
                               fuse_fn=None if args.unguided else fuse_fn,
                               callback=cb, record_r0=True)
        _sync(out)
        dt = time.perf_counter() - t0
        print(f"[{tag}] guided denoise loop, {args.steps} steps "
              f"({n_guided} guided): {dt:.0f} s", flush=True)
        return out, dt

    out_lat, t_first = one_clip("5")
    lat_host = np.asarray(out_lat, np.float32)
    t_run = t_first
    if not args.no_repeat:
        for k in phase:
            phase[k].clear()
        out_lat, t_run = one_clip("5b steady-state")  # programs all warm

    t0 = time.perf_counter()
    try:
        video = dec(jnp.asarray(lat_host))
        out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
        t_decode = time.perf_counter() - t0
        del video
        print(f"[6] final streaming decode: {t_decode:.1f} s "
              f"(clip {out.shape})", flush=True)
    except Exception as e:  # noqa: BLE001 — capacity fallback
        print(f"[6] decode WITH DiT resident failed "
              f"({type(e).__name__}: {str(e)[:200]}); dropping DiT + "
              f"compiled programs and retrying", flush=True)
        # A params-only free is NOT enough (measured on the LongCat refine
        # path): the compiled executables' HBM constants and allocator
        # fragmentation survive it. Drop everything DiT-shaped — including
        # the compile_auto_layouts arg tuples (one_args/step_args), which
        # hold the RELAID params: nulling `dit_params` alone leaks the
        # whole ~8 GB DiT (measured round 4: the post-cleanup retry still
        # RESOURCE_EXHAUSTED on a 12 MB device_put at 720p).
        pipe.dit_params = None
        dit_params = step_c = one_c = combine = None  # noqa: F841
        one_args = step_args = video = image = None  # noqa: F841
        out_lat = latents = condition = video_ref = mask = None  # noqa: F841
        import gc
        gc.collect()
        jax.clear_caches()
        t0 = time.perf_counter()
        try:
            video = dec(jnp.asarray(lat_host))
            out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
            t_decode = time.perf_counter() - t0
            del video
            print(f"[6] final streaming decode (DiT dropped, incl. "
                  f"recompile): {t_decode:.1f} s (clip {out.shape})",
                  flush=True)
        except Exception as e2:  # noqa: BLE001 — allocator unrecoverable
            # Last resort: a failed 720p execution can leave the in-process
            # allocator unrecoverable even after every reference is gone.
            # Decode in a FRESH process (VAE alone on the chip — the
            # decode-only probe measures 23.9 s steady-state at 720p).
            print(f"[6] in-process decode retry also failed "
                  f"({type(e2).__name__}); decoding in a fresh process "
                  f"(runtime/subproc.py)", flush=True)
            from worldforge_tpu.runtime.subproc import decode_in_subprocess
            video = dec = enc = None  # free before the child starts
            gc.collect()
            _, times = decode_in_subprocess(
                lat_host, pipe.vae_cfg, params_seed=1,
                dtype="float32" if args.fp32_vae else "bfloat16", reps=2)
            t_decode = times[-1]  # steady-state rep

    for k, v in phase.items():
        if v:
            print(f"    phase {k}: n={len(v)}, median "
                  f"{np.median(v):.2f} s, total {np.sum(v):.0f} s",
                  flush=True)
    print(f"    FLF selections: {selections}", flush=True)
    t_clip = t_run + t_decode
    print(f"GUIDED clip: denoise+decode {t_clip:.0f} s = "
          f"{nf / t_clip:.4f} fps "
          f"({'steady-state' if not args.no_repeat else 'incl. compiles'}); "
          f"wall from empty chip {time.perf_counter()-t_all:.0f} s",
          flush=True)


def run_fused(args, pipe, g, n_guided, dit_params, vae_params, latents,
              condition, pe, ne, ie, video_ref, mask, t_all, report_memory):
    from worldforge_tpu.runtime.layouts import compile_auto_layouts

    nf = args.frames
    guided_on = not args.unguided

    if args.exec_chunk:
        # chunked-execution fused serving (the 16 GB + watchdog mode):
        # same scan body, sub-watchdog executions, UniPC history in the
        # carry — run_fused_chunked handles layouts + program cache
        chunk_times = []

        def on_chunk(i, n_steps, seg_fuse, seg_irr, lat):
            _sync(lat)
            now = time.perf_counter()
            dt = now - on_chunk.t0
            on_chunk.t0 = now
            chunk_times.append((n_steps, seg_fuse, dt))
            tag = "guided" if seg_fuse else ("irr" if seg_irr else "plain")
            print(f"    chunk {i}: {n_steps} {tag} step(s) in {dt:.1f} s",
                  flush=True)

        donate = getattr(args, "donate_data", False)
        if donate and not args.no_repeat:
            # donated originals are deleted during clip 1's compile; keep
            # host copies to re-upload for the steady-state rep
            host_cond = np.asarray(condition)
            host_ref = np.asarray(video_ref)
            host_mask = np.asarray(mask)
        for rep in range(1 if args.no_repeat else 2):
            if rep > 0 and donate:
                condition = jnp.asarray(host_cond)
                video_ref = jnp.asarray(host_ref)
                mask = jnp.asarray(host_mask)
            chunk_times.clear()
            t0 = time.perf_counter()
            on_chunk.t0 = t0
            out_lat = pipe.run_fused_chunked(
                g, args.steps, 5.0, True, guided_on, 4.0, args.exec_chunk,
                latents, condition, pe, ne, ie, video_ref, mask,
                jax.random.key(10), on_chunk=on_chunk,
                donate_data=donate and rep == 0,
                fuse_cost=getattr(args, "fuse_cost", 0.5))
            _sync(out_lat)
            t_run = time.perf_counter() - t0
            tag = "incl. compiles" if rep == 0 else "steady-state"
            longest = max(dt for _, _, dt in chunk_times)
            print(f"[5] chunked fused guided denoise, {args.steps} steps "
                  f"({n_guided} guided, {len(chunk_times)} executions, "
                  f"longest {longest:.1f} s): {t_run:.0f} s ({tag})",
                  flush=True)
        lat_host = np.asarray(out_lat, np.float32)
        del out_lat
        finish_decode(args, pipe, lat_host, t_run, t_all)
        return

    runner = pipe._fused_runner(g, args.steps, 5.0, True, True, 4.0)
    run_args = (dit_params, vae_params, latents, condition, pe, ne, ie,
                video_ref, mask, jax.random.key(10))
    t0 = time.perf_counter()
    # auto-layout the data args too (latents/condition/ref/mask): default
    # entry layouts cost HLO-temp copies (119 MB for video_ref alone in
    # the round-4 720p post-mortem) — see pipelines/wan_i2v.py fused path
    compiled, run_args = compile_auto_layouts(runner, run_args,
                                              auto_argnums=(0, 1, 2, 3,
                                                            7, 8))
    pipe.dit_params = run_args[0]          # preferred-layout weights
    pipe.vae_params = run_args[1]
    print(f"[4] fused guided program compiled (+weights relaid): "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    report_memory(compiled)

    t0 = time.perf_counter()
    out_lat = compiled(*run_args)
    _sync(out_lat)
    t_run = time.perf_counter() - t0
    print(f"[5] fused guided denoise, {args.steps} steps ({n_guided} "
          f"guided): {t_run:.0f} s", flush=True)
    lat_host = np.asarray(out_lat, np.float32)
    del out_lat

    if not args.no_repeat:
        t0 = time.perf_counter()
        out_lat = compiled(*run_args)
        _sync(out_lat)
        t_run = time.perf_counter() - t0   # steady state (cache warm)
        print(f"[5b] steady-state repeat: {t_run:.0f} s", flush=True)
        del out_lat

    finish_decode(args, pipe, lat_host, t_run, t_all)


def finish_decode(args, pipe, lat_host, t_run, t_all):
    nf = args.frames
    dec = pipe._vae_decode_fn()
    t0 = time.perf_counter()
    video = dec(jnp.asarray(lat_host))
    out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
    t_decode = time.perf_counter() - t0
    del video
    print(f"[6] final streaming decode (incl. compile): {t_decode:.1f} s "
          f"(clip {out.shape})", flush=True)

    t_clip = t_run + t_decode
    print(f"GUIDED clip (fused): denoise+decode {t_clip:.0f} s = "
          f"{nf / t_clip:.4f} fps; wall from empty chip "
          f"{time.perf_counter()-t_all:.0f} s", flush=True)


if __name__ == "__main__":
    main()
