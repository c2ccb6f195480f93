"""Real-TPU A/B: fused Pallas modulated-LayerNorm vs XLA chain, on one
Wan-14B layer at the 480p bench shape (bench.py::bench_wan_dit_480p).

Interleaved rounds in one process (memory: absolute ms drifts +-25%
day-to-day; only interleaved deltas are trustworthy).

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/probe_fused_norm_ab.py
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
    import worldforge_tpu.models.wan.dit as dit_mod
    from worldforge_tpu.models.wan.dit import (
        WanDiTConfig, init_wan_dit_layer, wan_dit_layer_forward)
    from worldforge_tpu.ops.rope import rope_cos_sin

    cfg = WanDiTConfig.wan_14b_i2v()
    f, h, w = 13, 30, 52
    seq = f * h * w
    key = jax.random.key(0)
    layer = init_wan_dit_layer(key, cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (1, seq, cfg.dim), jnp.bfloat16)
    e = jax.random.normal(key, (1, 6, cfg.dim), jnp.float32)
    ctx = jax.random.normal(key, (1, cfg.text_len + 257, cfg.dim),
                            jnp.bfloat16)
    cos, sin = rope_cos_sin(f, h, w, cfg.dim // cfg.num_heads)

    def make_step(mode):
        dit_mod._FUSED_NORM_MODE = mode
        fn = jax.jit(lambda l, x, e, c: wan_dit_layer_forward(
            l, cfg, x, e, c, cos, sin, img_ctx_len=257))
        out = fn(layer, x, e, ctx)          # trace+compile under `mode`
        _sync(out)
        return fn, out

    step_off, out_off = make_step("off")
    step_on, out_on = make_step("auto")
    diff = np.max(np.abs(np.asarray(out_on, np.float32)
                         - np.asarray(out_off, np.float32)))
    print(f"max |fused - xla| on layer output: {diff:.3e}")

    n_iter, rounds = 8, 5
    best = {"off": float("inf"), "on": float("inf")}
    for r in range(rounds):
        for name, fn in (("off", step_off), ("on", step_on)):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = fn(layer, x, e, ctx)
            _sync(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / n_iter)
    ms_off, ms_on = best["off"] * 1e3, best["on"] * 1e3
    print(f"xla chain : {ms_off:.2f} ms/layer")
    print(f"fused norm: {ms_on:.2f} ms/layer")
    print(f"delta: {ms_off - ms_on:+.2f} ms ({(ms_off/ms_on - 1)*100:+.1f}%)")
    fps = 49 / (50 * 2 * best["on"] * 40)
    print(f"-> layer-extrapolated bf16 north star: {fps:.4f} fps "
          f"({fps/0.089:.3f}x A100 est)")


if __name__ == "__main__":
    main()
