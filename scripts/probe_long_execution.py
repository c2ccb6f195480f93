"""Pin the single-execution duration limit of the device path.

Round-4 bisect of the LongCat fused-program fault (docs/COMPONENTS.md
deviation 9) found: full / unguided / no-FLF / token-chunked all fault
(UNAVAILABLE "TPU device error") at 16 scan steps (~150 s of device time
in ONE program execution), while the SAME body at 2 steps (~18 s) runs
clean, and every per-step-dispatch mode (longest single execution
measured: 37.3 s, the 720p fused-CFG DiT step) has always run clean.
Hypothesis: the fault is an infrastructure single-execution time limit,
not a kernel or memory bug.

This probe runs a pure-matmul scan (no model code, ~1 s compile)
calibrated to increasing durations and reports pass/fault per duration —
a minimal repro that separates "the fused program is broken" from "the
environment kills long executions".

Run: python scripts/probe_long_execution.py [--durations 30 60 90 150 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--durations", type=float, nargs="+",
                    default=[30, 60, 90, 150, 240])
    ap.add_argument("--dim", type=int, default=4096)
    args = ap.parse_args()

    x = jax.random.normal(jax.random.key(0), (args.dim, args.dim),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (args.dim, args.dim),
                          jnp.bfloat16)

    def chain(x, w, iters):
        def body(c, _):
            # dependent chain so nothing can be elided or overlapped away
            c = jnp.tanh(c @ w)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    # calibrate: time a 50-iter execution
    f50 = jax.jit(lambda x, w: chain(x, w, 50))
    out = f50(x, w)
    np.asarray(out[0, 0])  # sync (block_until_ready lies via the tunnel)
    t0 = time.perf_counter()
    out = f50(x, w)
    np.asarray(out[0, 0])
    per_iter = (time.perf_counter() - t0) / 50.0
    print(f"[calibrate] {per_iter*1e3:.2f} ms/iter at dim {args.dim}",
          flush=True)

    for dur in args.durations:
        iters = max(1, int(dur / per_iter))
        f = jax.jit(lambda x, w, n=iters: chain(x, w, n))
        t0 = time.perf_counter()
        try:
            out = f(x, w)
            np.asarray(out[0, 0])
            dt = time.perf_counter() - t0
            print(f"[{dur:.0f}s target] {iters} iters: OK in {dt:.1f} s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — the probe's whole point
            dt = time.perf_counter() - t0
            print(f"[{dur:.0f}s target] {iters} iters: FAULT after "
                  f"{dt:.1f} s — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            # device state after a fault is part of the finding: try a
            # trivial op
            try:
                np.asarray(jnp.ones(()) + 1.0)
                print("    device still responsive after fault", flush=True)
            except Exception as e2:  # noqa: BLE001
                print(f"    device DEAD after fault: {type(e2).__name__}",
                      flush=True)
                break


if __name__ == "__main__":
    main()
