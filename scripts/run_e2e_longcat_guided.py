"""End-to-end PRODUCTION-SCALE **GUIDED LongCat** clip on one v5e — the
fast WorldForge mode: LongCat-Video 13.6B, 480p x 49 frames, 16-step
DISTILLED (cfg_step_lora semantics: CFG-free) flow-match schedule with the
full guided state machine (IRR + FLF longcat schedule + DSG + VAE fuse).
Reference: run_longcat_worldforge_single.py:211-214 (distill mode),
pipeline_longcat_video.py:827-994 (guided i2v loop).

Capacity: ALL-int4 W4A8 LongCat blocks (~6.8 GB, init_longcat_dit_w4) +
bf16 VAE (same documented 16 GB deviation as the Wan guided recipe —
fuse-drift gated in tests/test_guided_drift.py::test_bf16_vae_fuse_drift;
the fp32-VAE fused program misses 16 GB by 49 MB, measured: the top HLO
temps are 630 MB fp32 VAE decode activations) + streaming VAE
encode/decode + AUTO weight layouts (runtime/layouts.py).

Random-init weights / random text embeds — measures wall-clock sec/clip
for the guided serving path (quality is gated separately:
tests/test_longcat_guided_drift.py, tests/test_int4_quality.py).

Fused-mode note (ROOT-CAUSED round 4): this runtime kills any single
device execution over ~65-75 s (probe_long_execution.py), so the
one-program 16-step fused scan (~150 s/execution) faults regardless of
content. Serving modes that work here: `--no-fused` (per-step dispatch,
the round-3 measured mode) and `--exec-chunk k` (the SAME fused scan
body dispatched in <=k-step executions; bit-identical to fused —
tests/test_longcat_fused.py::test_chunked_execution_matches_fused).

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/run_e2e_longcat_guided.py --no-fused [--steps 16 --clips 2]
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
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--fp32-vae", action="store_true",
                    help="reference-exact fp32 VAE (needs >16 GB fused)")
    ap.add_argument("--no-fused", action="store_true",
                    help="per-step dispatch instead of the fused scan")
    ap.add_argument("--unguided", action="store_true",
                    help="bisect aid: plain distilled loop, no IRR/FLF/fuse")
    ap.add_argument("--no-flf", action="store_true",
                    help="bisect aid: guided (IRR + fuse + DSG) but no "
                         "Farneback channel selection inside the program")
    ap.add_argument("--no-irr", action="store_true",
                    help="bisect aid: guided fuse + DSG off, resample_steps=1")
    ap.add_argument("--clips", type=int, default=1,
                    help="repeat the denoise; clip 2+ is steady-state "
                         "(compiles cached, weights resident)")
    ap.add_argument("--quant", choices=("int4", "int6-ffn"), default="int4",
                    help="'int6-ffn' = int6 SwiGLU (w1/w2/w3) + int4 "
                         "attention — the <=1e-2 drift-bar recipe")
    ap.add_argument("--token-chunk", type=int, default=1,
                    help="exact-math FFN/qkv token chunking (fused-fault "
                         "bisect lever: shrinks per-step transients and "
                         "scoped-memory pressure)")
    ap.add_argument("--exec-chunk", type=int, default=0,
                    help="chunked-execution fused serving: the same scan "
                         "body dispatched in <=k-step device executions — "
                         "the serving mode for the ~65-72 s single-"
                         "execution watchdog this environment enforces "
                         "(probe_long_execution.py). 0 = one-program scan")
    ap.add_argument("--no-auto-layout", action="store_true",
                    help="bisect aid: skip compile_auto_layouts on the "
                         "fused program — the relayout runs ONLY on the "
                         "fused path (the per-step mode that works never "
                         "relayouts), so it is in the works-vs-faults "
                         "delta alongside the step scan itself")
    ap.add_argument("--no-vae", action="store_true",
                    help="bisect aid: do not build the VAE at all "
                         "(unguided only; skips the final decode) — "
                         "isolates DiT+VAE co-residency from the fused "
                         "program itself")
    args = ap.parse_args()
    if args.no_vae and not args.unguided:
        ap.error("--no-vae requires --unguided (guided fuses via the VAE)")

    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit_w4)
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.longcat import LongCatPipeline
    from worldforge_tpu.sampling.guidance import GuidanceConfig

    t_all = time.perf_counter()
    cfg = LongCatDiTConfig.longcat_13b()
    key = jax.random.key(0)

    t0 = time.perf_counter()
    int6_keys = ("w1", "w2", "w3") if args.quant == "int6-ffn" else ()
    dit_params = init_longcat_dit_w4(key, cfg, dtype=jnp.bfloat16,
                                     int6_keys=int6_keys)
    _sync(jax.tree_util.tree_leaves(dit_params["blocks"])[0])
    print(f"[1] {args.quant} 13.6B LongCat resident: "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    vae_cfg = WanVAEConfig.wan_2_1()
    vae_dtype = jnp.float32 if args.fp32_vae else jnp.bfloat16
    if args.no_vae:
        # tiny stand-in params: the unguided fused program never executes
        # VAE ops, but the runner signature still takes vae_params
        vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
        vae_params = init_wan_vae(jax.random.key(1), vae_cfg,
                                  dtype=vae_dtype)
        _sync(vae_params)
        print("[2] NO full VAE resident (bisect --no-vae; tiny stand-in)",
              flush=True)
    else:
        t0 = time.perf_counter()
        vae_params = init_wan_vae(jax.random.key(1), vae_cfg,
                                  dtype=vae_dtype)
        _sync(vae_params)
        print(f"[2] {jnp.dtype(vae_dtype).name} VAE resident alongside: "
              f"{time.perf_counter()-t0:.0f} s", flush=True)

    pipe = LongCatPipeline(dit_params, cfg, vae_params, vae_cfg,
                           streaming_vae=True,
                           auto_layout=not args.no_auto_layout,
                           token_chunk=args.token_chunk)

    h, w, nf = 480, 832, 49
    image = jax.random.uniform(jax.random.key(2), (1, 3, h, w),
                               jnp.float32) * 2.0 - 1.0
    pe = jax.random.normal(jax.random.key(3), (1, 96, cfg.caption_channels),
                           jnp.bfloat16)
    pmask = jnp.ones((1, 96), jnp.float32)
    video_ref = jax.random.uniform(jax.random.key(6), (1, 3, nf, h, w),
                                   jnp.float32)
    mask = (jax.random.uniform(jax.random.key(7), (1, 1, nf, h, w),
                               jnp.float32) > 0.3).astype(jnp.float32)

    g = GuidanceConfig(flf_backend="longcat")  # guided, guide_steps=15,
    # resample_steps=2, omega=4, FLF on — the reference WF defaults
    if args.no_flf:
        g = GuidanceConfig(flf_backend="longcat", use_flf=False)
    if args.no_irr:
        g = GuidanceConfig(flf_backend="longcat", use_flf=not args.no_flf,
                           resample_steps=1)
    if args.unguided:
        g = GuidanceConfig(guided=False, flf_backend="longcat")
        video_ref = mask = None
    mode = ("loop" if args.no_fused else
            (f"chunked{args.exec_chunk}" if args.exec_chunk
             else "fused")) + \
           ("-unguided" if args.unguided else "-guided") + \
           ("-noflf" if args.no_flf else "") + \
           ("-noirr" if args.no_irr else "")
    for clip in range(args.clips):
        t0 = time.perf_counter()
        out_lat = pipe.generate_i2v(
            jax.random.key(10 + clip), image, pe, pmask, None, None,
            height=h, width=w, num_frames=nf,
            num_inference_steps=args.steps, guidance_scale=1.0,
            use_distill=True, video_ref=video_ref, mask=mask, guidance=g,
            output_type="latent", fused=not args.no_fused,
            exec_chunk=args.exec_chunk)
        _sync(out_lat)
        t_denoise = time.perf_counter() - t0
        tag = "incl. compile" if clip == 0 else "steady-state"
        print(f"[3] {mode} DISTILLED denoise clip {clip + 1}, "
              f"{args.steps} steps ({tag}): {t_denoise:.0f} s", flush=True)

    if args.no_vae:
        _ = np.asarray(out_lat, np.float32)
        print(f"{mode} denoise-only (bisect --no-vae): {t_denoise:.0f} s, "
              f"total wall {time.perf_counter()-t_all:.0f} s")
        return

    lat_host = np.asarray(out_lat, np.float32)
    dec = pipe._vae_decode_fn()
    try:
        t0 = time.perf_counter()
        video = dec(jnp.asarray(lat_host))
        out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
        t_decode = time.perf_counter() - t0
        print(f"[4] final streaming decode: {t_decode:.1f} s", flush=True)
    except Exception as e:
        print(f"[4] decode next to weights failed ({type(e).__name__}) — "
              f"sequencing", flush=True)
        import gc
        pipe.dit_params = None
        del dit_params
        gc.collect()
        t0 = time.perf_counter()
        video = dec(jnp.asarray(lat_host))
        out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
        t_decode = time.perf_counter() - t0
        print(f"[4b] sequenced decode: {t_decode:.1f} s", flush=True)

    total = time.perf_counter() - t_all
    t_clip = t_denoise + t_decode
    tag = "steady-state" if args.clips > 1 else "incl. compile"
    print(f"{mode} LongCat distilled clip {out.shape}: denoise+decode "
          f"{t_clip:.0f} s ({nf / t_clip:.4f} fps {tag}), total "
          f"wall from empty chip {total:.0f} s")


if __name__ == "__main__":
    main()
