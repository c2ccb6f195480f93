"""Real-TPU probe: full 48-layer LongCat-13.6B measured on chip in W8A8
int8 (blocks ~13.6 GB, built layer-by-layer by init_longcat_dit_int8 —
bf16 stacked blocks at 27 GB cannot be materialized on 16 GB).

Two numbers:
  --phase distill  480p x 49f (13x30x52 tokens) full forward -> the
                   16-step CFG-free distilled WorldForge clip rate
                   (run_longcat_worldforge_single.py:211-214, the fast
                   serving mode; round-1 layer-extrapolated 0.474 fps
                   in bf16).
  --phase refine   720p refine shape with BSA enabled (42240 tokens,
                   sparsity 0.875) -> measured BSA full-model step.

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/probe_full_model_longcat_int8.py --phase distill
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


def _time(fn, *args, n_iter=2, rounds=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["distill", "refine"],
                    default="distill")
    ap.add_argument("--token-chunk", type=int, default=1,
                    help="token-chunk the FFN (exact math) to shrink the "
                         "[N, ffn_hidden] gate transients; needed to fit "
                         "48 int8 layers + activations in 16 GB HBM")
    args = ap.parse_args()

    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit_int8,
                                                   longcat_dit_forward)

    cfg = LongCatDiTConfig.longcat_13b()
    key = jax.random.key(0)
    t0 = time.perf_counter()
    params = init_longcat_dit_int8(key, cfg, dtype=jnp.bfloat16)
    _sync(params["blocks"]["w1"]["w8"])
    print(f"int8 LongCat-13.6B resident ({time.perf_counter()-t0:.0f} s "
          f"build)", flush=True)

    if args.phase == "distill":
        f, hh, ww = 13, 60, 104      # 480p x 49f latents
        bsa = None
    else:
        # 720p refine latents padded to BSA granularity: grid (16,48,80)
        # divisible by the (4,4,8) chunk -> 61440 tokens
        f, hh, ww = 16, 96, 160
        bsa = {"sparsity": 0.875}

    x = jax.random.normal(key, (1, cfg.in_channels, f, hh, ww), jnp.bfloat16)
    t = jnp.full((1, f), 500.0, jnp.float32)
    ctx = jax.random.normal(key, (1, 160, cfg.caption_channels), jnp.bfloat16)

    step = jax.jit(lambda p, x, t, c: longcat_dit_forward(
        p, cfg, x, t, c, bsa_params=bsa, token_chunk=args.token_chunk))
    dt = _time(step, params, x, t, ctx)
    print(f"{args.phase}: full 48-layer fwd {dt*1e3:.0f} ms", flush=True)
    if args.phase == "distill":
        # 16-step CFG-free distilled clip (49 frames)
        clip = 16 * dt
        print(f"16-step distilled clip: {clip:.1f} s -> "
              f"{49/clip:.3f} fps/chip (round-1 bf16 layer-extrapolated: "
              f"0.474)")
    else:
        print(f"refine step rate: {1/dt:.3f} steps/s at 61440 tokens")


if __name__ == "__main__":
    main()
