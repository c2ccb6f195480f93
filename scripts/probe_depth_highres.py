"""Real-TPU probe: DepthCrafter SVD UNet at the reference's HIGH-RES
published config — 1024x576, 110-frame window (README.md:180-184: ~2.1 fps
at ~26 GB VRAM on A100). Round-1 recorded "needs >16 GB" structurally;
this probe actually tries it with bf16 params + activations (weights
~3 GB; the 26 GB A100 figure includes fp16 autocast buffers and diffusers
overhead that do not apply here).

Comparable to the round-1 low-res row (512x256: 1.29 s/fwd -> 17.1 fps
over the 5-step UNet denoise loop, 2.0x the published 8.6 fps).

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/probe_depth_highres.py
"""

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
    from worldforge_tpu.models.depthcrafter.unet import (
        SVDUNetConfig, init_svd_unet, svd_unet_forward)

    cfg = SVDUNetConfig.svd()
    hl, wl = 576 // 8, 1024 // 8             # latent 72 x 128
    key = jax.random.key(0)
    params = init_svd_unet(key, cfg, dtype=jnp.bfloat16)
    _sync(params["conv_in"]["w"])
    print("SVD UNet bf16 resident (~3 GB)", flush=True)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=0,
                    help="attn_chunks ladder start: 0 = try (1, 8, 16) per "
                         "window; N = only N (exact-math lax.map chunking "
                         "of the transformer blocks, round-4 capacity fix)")
    args = ap.parse_args()

    # Window-size ladder: 110 is the reference's long-video window; if the
    # full window does not compile on 16 GB, find the capacity edge (the
    # pipeline's sliding windows make any of these a valid serving config).
    for f in (110, 72, 48, 24):
        sample = jax.random.normal(key, (1, f, cfg.in_channels, hl, wl),
                                   jnp.bfloat16)
        ctx = jax.random.normal(jax.random.key(1),
                                (1, f, 1, cfg.cross_attention_dim),
                                jnp.bfloat16)
        ids = jnp.asarray([[6.0, 127.0, 0.02]], jnp.float32)

        chunk_ladder = (args.chunks,) if args.chunks else (1, 8, 16)
        step = None
        for nc in chunk_ladder:
            cand = jax.jit(lambda p, x, t, c, _nc=nc: svd_unet_forward(
                p, cfg, x, t, c, ids, attn_chunks=_nc))
            try:
                out = cand(params, sample, jnp.float32(500.0), ctx)
                _sync(out)
                step = cand
                print(f"  {f}f compiles at attn_chunks={nc}", flush=True)
                break
            except Exception as e:
                print(f"  {f}f attn_chunks={nc} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        if step is None:
            print(f"FAILED at (1,{f},{cfg.in_channels},{hl},{wl}) for all "
                  f"chunk settings", flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = step(params, sample, jnp.float32(500.0), ctx)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / 2)
        steps = 5
        fps = f / (steps * best)
        line = (f"1024x576 x {f}f UNet fwd: {best:.2f} s -> {steps}-step "
                f"depth {fps:.2f} fps/chip")
        if f == 110:
            # only the 110-frame window is directly comparable to the
            # published A100 number — smaller windows pay proportionally
            # less attention cost (round-2 advisor finding)
            line += f" (published A100 @110f: 2.1 fps -> {fps/2.1:.2f}x)"
        else:
            line += (" (NOT comparable to the published 110-frame A100 "
                     "2.1 fps: smaller window = less attention cost)")
        print(line)
        break


if __name__ == "__main__":
    main()
