"""End-to-end PRODUCTION-SCALE 480p->720p LongCat SDEdit refine on one v5e
— the upscale path, the last BASELINE.json config with no measured number
(round-3 VERDICT item 1a). Reference: run_upscale.py:54-161
(spatial_refine_only=True, t_thresh=0.5, 50-step truncated schedule, BSA
enabled, refinement LoRA), pipeline_longcat_video.py:1271-1511.

Shape (reference-exact): stage-1 480x832 x 49f -> 720p bucket 704x1280
(get_condition_shape with scale_factor_spatial 8*2*4=64), latents
16ch x 88 x 160, noise latents padded 13 -> 16 (BSA granularity 4),
tokens 16 x (44x80) = 56,320 — factors into (4,4,8) BSA chunks at the
reference's 0.875 sparsity.

Capacity recipe (round 4): PHASE ORDERING — the 704x1280 streaming VAE
encode's full-res conv transients OOM next to the resident int4 DiT
(measured RESOURCE_EXHAUSTED, 2/2), so clip 1 encodes BEFORE the DiT is
built (pipe.prepare_refine_latents with dit_params=None), then the
ALL-int4 W4A8 LongCat blocks (~6.8 GB, init_longcat_dit_w4) load
alongside the bf16 streaming VAE + AUTO weight layouts. Clip 2 attempts
the full encode->denoise->decode with everything co-resident (true
steady-state); if it OOMs, that is the measured capacity edge and the
recipe is the phase-ordered one. Random-init weights / random text embeds
— measures wall-clock sec/clip for the refine serving path (BSA numerics
gated in tests/test_bsa.py, refine semantics in tests/test_refine.py).

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/run_e2e_refine_720p.py [--clips 2]
"""

import argparse
import os
import statistics
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


def _hbm(tag):
    ms = jax.local_devices()[0].memory_stats()
    if ms:
        print(f"    [hbm after {tag}] in_use "
              f"{ms.get('bytes_in_use', 0)/2**30:.2f} GiB, peak "
              f"{ms.get('peak_bytes_in_use', 0)/2**30:.2f} / "
              f"{ms.get('bytes_limit', 0)/2**30:.2f} GiB", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50,
                    help="base schedule steps; t_thresh truncates to ~half")
    ap.add_argument("--t-thresh", type=float, default=0.5)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--no-bsa", action="store_true",
                    help="dense-attention A/B (the reference always runs "
                         "BSA for refine)")
    ap.add_argument("--clips", type=int, default=1,
                    help="clip 1 = phase-ordered (encode before DiT); "
                         "clip 2+ = fully co-resident steady-state attempt")
    ap.add_argument("--decode-only", action="store_true",
                    help="measure ONLY the 720p streaming VAE decode "
                         "(VAE alone on the chip) — the phase the full run "
                         "cannot reach when post-denoise HBM fragmentation "
                         "blocks the co-resident decode")
    ap.add_argument("--decode-from", default=None,
                    help="decode latents from a .npy file with only the "
                         "VAE resident, then exit (fresh-process fallback "
                         "for the unrecoverable post-OOM allocator)")
    args = ap.parse_args()

    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit_w4)
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.longcat import LongCatPipeline
    from worldforge_tpu.utils.buckets import closest_bucket

    t_all = time.perf_counter()
    cfg = LongCatDiTConfig.longcat_13b()

    # VAE first, DiT later: the one-shot 720p encode needs the HBM headroom
    vae_cfg = WanVAEConfig.wan_2_1()
    t0 = time.perf_counter()
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg, dtype=jnp.bfloat16)
    _sync(vae_params)
    print(f"[1] bf16 VAE resident: {time.perf_counter()-t0:.0f} s",
          flush=True)
    _hbm("vae")

    pipe = LongCatPipeline(None, cfg, vae_params, vae_cfg,
                           streaming_vae=True, auto_layout=True)

    h_lo, w_lo, nf = 480, 832, args.frames
    h, w = closest_bucket(h_lo, w_lo, "720p", 64)  # 704 x 1280

    if args.decode_only:
        n_lat = -(-(-(-nf // 4)) // 4) * 4
        lat = jax.random.normal(jax.random.key(5),
                                (1, 16, n_lat, h // 8, w // 8), jnp.float32)
        _sync(lat)
        for rep in range(2):
            t0 = time.perf_counter()
            video = pipe._vae_decode_fn()(lat)
            out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
            print(f"[decode-only] 720p streaming decode {out.shape} "
                  f"rep {rep + 1}: {time.perf_counter() - t0:.1f} s"
                  + (" (incl. compile)" if rep == 0 else " (steady-state)"),
                  flush=True)
        _hbm("decode-only")
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
    n_lat = -(-nf // 4)
    t_lat_pad = -(-n_lat // 4) * 4  # noise latents padded to BSA granularity
    tokens = t_lat_pad * (h // 16) * (w // 16)
    print(f"[2] refine target {h}x{w}, latents {t_lat_pad}x{h//8}x{w//8}, "
          f"tokens {tokens} "
          f"({'dense' if args.no_bsa else 'BSA 0.875'})", flush=True)

    stage1 = np.random.default_rng(2).uniform(
        0, 1, (nf, h_lo, w_lo, 3)).astype(np.float32)

    t0 = time.perf_counter()
    lat_up = pipe.prepare_refine_latents(stage1, height=h, width=w,
                                         spatial_refine_only=True)
    _sync(lat_up)
    print(f"[3] 720p upscale + streaming VAE encode (no DiT resident): "
          f"{time.perf_counter()-t0:.0f} s, latents {lat_up.shape}",
          flush=True)
    _hbm("encode")

    t0 = time.perf_counter()
    dit_params = init_longcat_dit_w4(jax.random.key(0), cfg,
                                     dtype=jnp.bfloat16)
    _sync(jax.tree_util.tree_leaves(dit_params["blocks"])[0])
    pipe.dit_params = dit_params
    print(f"[4] all-int4 13.6B LongCat resident alongside: "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    _hbm("dit")

    pe = jax.random.normal(jax.random.key(3), (1, 96, cfg.caption_channels),
                           jnp.bfloat16)
    pmask = jnp.ones((1, 96), jnp.float32)

    # wrap the jitted DiT step for per-step medians (sync per call costs
    # ~25 ms through the tunnel — noise at the ~20 s/step scale here)
    step_times = []
    orig_bsa = pipe._dit_fn_bsa
    orig_dense = pipe._dit_fn

    def timed(fn):
        def run(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            _sync(out)
            step_times.append(time.perf_counter() - t0)
            return out
        return run

    pipe.__dict__["_dit_fn_bsa"] = timed(orig_bsa)
    pipe.__dict__["_dit_fn"] = timed(orig_dense)

    lat = None
    t_denoise = float("nan")
    for clip in range(args.clips):
        step_times.clear()
        t0 = time.perf_counter()
        try:
            lat = pipe.generate_refine(
                jax.random.key(10 + clip), stage1, pe, pmask,
                height=h, width=w, num_inference_steps=args.steps,
                t_thresh=args.t_thresh, spatial_refine_only=True,
                use_bsa=not args.no_bsa, output_type="latent",
                stage1_latents=lat_up if clip == 0 else None)
            _sync(lat)
        except Exception as e:  # noqa: BLE001 — capacity post-mortem
            print(f"[5] clip {clip+1} "
                  f"({'phase-ordered' if clip == 0 else 'co-resident'}) "
                  f"FAILED after {time.perf_counter()-t0:.0f} s, "
                  f"{len(step_times)} DiT steps done: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            _hbm("failure")
            break
        t_denoise = time.perf_counter() - t0
        tag = ("phase-ordered encode, incl. compile" if clip == 0
               else "co-resident steady-state")
        med = statistics.median(step_times) if step_times else float("nan")
        print(f"[5] refine denoise clip {clip+1} ({tag}): {t_denoise:.0f} s "
              f"over {len(step_times)} DiT steps, median step {med:.2f} s",
              flush=True)
        _hbm(f"clip{clip+1}")

    if lat is None:
        sys.exit(1)

    # Pull the latents to host BEFORE any decode attempt: after a failed
    # 720p decode the allocator is wedged enough that even a 14 MB D2H
    # fetch RESOURCE_EXHAUSTs (measured round 4) — the recovery paths must
    # work off a host copy that already exists.
    lat_host = np.asarray(lat, np.float32)

    t0 = time.perf_counter()
    try:
        # two reps: rep 1 incl. compile, rep 2 steady-state (VERDICT r4
        # item 4 — the refine clip's fps must come from a steady decode)
        for rep in range(2):
            t0 = time.perf_counter()
            video = pipe._vae_decode_fn()(lat)
            out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
            t_decode = time.perf_counter() - t0
            print(f"[6] final streaming decode {out.shape} rep {rep + 1}: "
                  f"{t_decode:.1f} s "
                  + ("(incl. compile)" if rep == 0 else "(steady-state)"),
                  flush=True)
            del video
    except Exception as e:  # noqa: BLE001
        print(f"[6] decode WITH DiT resident failed "
              f"({type(e).__name__}: {str(e)[:200]}); dropping DiT refs "
              f"and retrying", flush=True)
        _hbm("decode-failure")
        # Drop every DiT reference AND the compiled step executables (their
        # HBM constants — RoPE tables, BSA index prologues — and allocator
        # fragmentation both survive a params-only free: measured round 4,
        # the params-only retry still RESOURCE_EXHAUSTED at 704x1280).
        pipe.dit_params = None
        del dit_params
        del lat, lat_up
        for k_cached in ("_dit_fn", "_dit_fn_bsa", "_dit_fn_vc"):
            pipe.__dict__.pop(k_cached, None)
        orig_bsa = orig_dense = None  # noqa: F841 — pin the jitted steps
        import gc
        gc.collect()
        jax.clear_caches()
        try:
            lat = jnp.asarray(lat_host)
            t0 = time.perf_counter()
            video = pipe._vae_decode_fn()(lat)
            out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
            t_decode = time.perf_counter() - t0
            print(f"[6] final streaming decode (DiT dropped) {out.shape}: "
                  f"{t_decode:.1f} s", flush=True)
        except Exception as e2:  # noqa: BLE001 — allocator unrecoverable
            print(f"[6] in-process decode retry also failed "
                  f"({type(e2).__name__}); decoding in a fresh process "
                  f"(runtime/subproc.py, 2 reps for the steady-state "
                  f"split)", flush=True)
            from worldforge_tpu.runtime.subproc import decode_in_subprocess
            lat = video = None
            gc.collect()
            _, times = decode_in_subprocess(lat_host, pipe.vae_cfg,
                                            params_seed=1, dtype="bfloat16",
                                            reps=2)
            print(f"[6] subprocess decode: {times[0]:.1f} s incl. compile "
                  f"/ {times[-1]:.1f} s steady-state", flush=True)
            t_decode = times[-1]
    _hbm("decode")

    total = time.perf_counter() - t_all
    t_clip = t_denoise + t_decode
    tag = "steady-state" if args.clips > 1 else "incl. compile"
    print(f"720p refine clip: denoise+decode {t_clip:.0f} s "
          f"({nf/t_clip:.4f} fps {tag}), total wall from empty chip "
          f"{total:.0f} s")


if __name__ == "__main__":
    main()
