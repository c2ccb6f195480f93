"""On-chip probe: the int8 W8A8 UMT5-xxl serving build (init_umt5_int8).

Measures what docs/SERVING.md row 4 claims: the quantized text encoder
fits a 16 GB v5e with room to spare, so prompt encoding no longer needs
a second chip / offline precompute next to an all-int4 DiT.

Measured on the real v5e (2026-08-19):
  init 25.9 s (layerwise build), params 6.27 GiB resident
  encode(1x512) steady-state 0.077 s, output finite

Reference cost anchor: the vendored encoder the Wan pipelines call
(`wan/modules/t5.py` umt5-xxl, bf16 ~11.4 GB) — capacity restructuring
only; numerics gated in tests/test_umt5_int8.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from worldforge_tpu.models.encoders.umt5 import (UMT5Config, init_umt5_int8,
                                                 umt5_encode)


def main():
    print("device:", jax.devices()[0])
    cfg = UMT5Config.xxl()
    t0 = time.time()
    params = init_umt5_int8(jax.random.key(0), cfg)
    jax.block_until_ready(params["embed"])
    t1 = time.time()
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    print(f"init {t1 - t0:.1f}s, params {nbytes / 2**30:.2f} GiB")

    ids = jnp.zeros((1, 512), jnp.int32).at[0, :20].set(
        jnp.arange(20, dtype=jnp.int32) + 5)
    mask = jnp.zeros((1, 512), jnp.int32).at[0, :20].set(1)
    enc = jax.jit(lambda p, i, m: umt5_encode(p, cfg, i, m))

    t2 = time.time()
    out = enc(params, ids, mask)
    # axon tunnel: sync with a scalar host read, not block_until_ready
    v = float(np.asarray(out[0, 0, 0]))
    t3 = time.time()
    out = enc(params, ids, mask)
    v = float(np.asarray(out[0, 0, 0]))
    t4 = time.time()
    print(f"encode compile+run {t3 - t2:.1f}s, steady {t4 - t3:.3f}s, "
          f"out[0,0,0]={v:.4f}")
    ms = jax.local_devices()[0].memory_stats()
    if ms:
        print(f"HBM in use: {ms.get('bytes_in_use', 0) / 2**30:.2f} GiB / "
              f"{ms.get('bytes_limit', 0) / 2**30:.2f} GiB")
    print("finite:",
          bool(np.isfinite(np.asarray(out[:, :20]).astype(np.float32)).all()))


if __name__ == "__main__":
    main()
