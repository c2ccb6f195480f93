"""Induced-OOM bench validation (VERDICT r4 item 1's third chip state).

BENCH_r04.json was a RESOURCE_EXHAUSTED traceback with rc=1 and no JSON:
the driver ran bench.py on a chip another process had just exhausted, the
full-model rung OOM'd, and the layer fallback's own OOM escaped. bench.py
is now a catch-everything degradation ladder; this probe validates the
exact failure scenario ON the chip:

  1. deliberately exhaust HBM (growing allocations until
     RESOURCE_EXHAUSTED) in THIS process,
  2. optionally keep a resident hog so the full-model rung cannot fit,
  3. run bench.main() in the same process tree,
  4. assert exactly one parsable JSON line came out.

Run from /root/repo on the TPU:
    python scripts/probe_bench_after_oom.py [--keep-hog-gb 10]
"""

import argparse
import contextlib
import importlib.util
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def induce_oom():
    """Allocate until the backend throws RESOURCE_EXHAUSTED, then drop the
    failed allocations (the r4 wedge: allocator state + caches survive)."""
    hogs = []
    try:
        for i in range(64):
            # 2 GiB fp32 chunks; materialize via a computation so the
            # buffer really lands on device. Sync with a scalar HOST READ,
            # not block_until_ready — through the axon tunnel the latter
            # returns early and the RESOURCE_EXHAUSTED never surfaces
            # (measured: 64 x 2 GiB "allocated" without error)
            hogs.append(jnp.ones((512, 1024, 1024), jnp.float32) * float(i))
            np.asarray(hogs[-1][0, 0, 0])
    except Exception as e:  # noqa: BLE001
        print(f"[probe] OOM induced after {len(hogs)} x 2 GiB: "
              f"{type(e).__name__}: {str(e)[:150]}", flush=True)
        return hogs
    raise SystemExit("[probe] FAILED to induce OOM — 128 GiB allocated?!")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep-hog-gb", type=float, default=0.0,
                    help="keep this much HBM hogged while bench runs "
                         "(forces the full-model rung to OOM so the "
                         "fallback ladder is exercised)")
    args = ap.parse_args()

    hogs = induce_oom()
    keep = int(args.keep_hog_gb // 2)
    del hogs[keep:]
    print(f"[probe] keeping {2 * len(hogs)} GiB hogged; running "
          f"bench.main() in-process", flush=True)

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    out = buf.getvalue()
    sys.stdout.write(out)
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected 1 JSON line, got: {out!r}"
    rec = json.loads(lines[0])
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in rec, rec
    print(f"[probe] OK — bench emitted a valid JSON line after induced "
          f"OOM (value={rec['value']}, "
          f"error={'yes' if 'error' in rec else 'no'})", flush=True)
    # hogs stay referenced until here
    _ = len(hogs)


if __name__ == "__main__":
    main()
