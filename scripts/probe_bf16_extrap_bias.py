"""Real-TPU probe: bound the layer-extrapolation bias AT THE 14B LAYER SIZE.

Round-1's bf16 north star (0.0797 fps = 0.895x) is a single-layer time
x 40. Phase A of probe_full_model_int8.py measured that extrapolation
over-states the full-model time by 18% on Wan-1.4B (scan-over-layers
amortizes dispatch + weight residency a standalone jitted layer pays).
This probe repeats the comparison at the REAL 14B layer width: a 20-layer
truncation of Wan-14B t2v in bf16 is ~14 GB and fits the 16 GB v5e.

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/probe_bf16_extrap_bias.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F, HH, WW = 13, 60, 104


def _sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def _time(fn, *args, n_iter=3, rounds=3):
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
    import dataclasses

    from worldforge_tpu.models.wan.dit import (
        WanDiTConfig, init_wan_dit, init_wan_dit_layer,
        wan_dit_layer_forward, wan_dit_forward)
    from worldforge_tpu.ops.rope import rope_cos_sin

    n_layers = 18  # 20 layers (14.1 GB) OOMed with activations on 16 GB
    cfg = dataclasses.replace(WanDiTConfig(model_type="t2v", in_dim=16),
                              num_layers=n_layers)
    key = jax.random.key(0)
    # layerwise builder: init_wan_dit materializes layers + stacked copy
    # simultaneously (2x peak) and OOMs for near-HBM-sized bf16 models
    from worldforge_tpu.models.wan.dit import init_wan_dit_layerwise
    params = init_wan_dit_layerwise(key, cfg, dtype=jnp.bfloat16)
    _sync(params["blocks"]["ffn"]["fc1"]["w"])
    print(f"{n_layers}-layer 14B-width bf16 model resident")

    x = jax.random.normal(key, (1, 16, F, HH, WW), jnp.bfloat16)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    full = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c))
    t_full = _time(full, params, x, t, ctx, n_iter=2)
    print(f"full {n_layers}-layer fwd: {t_full*1e3:.1f} ms")

    del params  # free the 12.7 GB model before the standalone-layer phase
    import gc
    gc.collect()

    layer = init_wan_dit_layer(jax.random.key(1), cfg, dtype=jnp.bfloat16)
    seq = F * (HH // 2) * (WW // 2)
    xs = jax.random.normal(key, (1, seq, cfg.dim), jnp.bfloat16)
    e = jax.random.normal(key, (1, 6, cfg.dim), jnp.float32)
    cs = jax.random.normal(key, (1, cfg.text_len, cfg.dim), jnp.bfloat16)
    cos, sin = rope_cos_sin(F, HH // 2, WW // 2, cfg.head_dim)
    lf = jax.jit(lambda l, x, e, c: wan_dit_layer_forward(
        l, cfg, x, e, c, cos, sin, img_ctx_len=0))
    t_layer = _time(lf, layer, xs, e, cs, n_iter=8)
    extrap = t_layer * n_layers
    bias = extrap / t_full
    print(f"layer: {t_layer*1e3:.2f} ms x {n_layers} = {extrap*1e3:.1f} ms"
          f" | measured {t_full*1e3:.1f} ms | extrap/measured = {bias:.4f}")

    # what the bias implies for the 40-layer bf16 north star
    per_layer_in_scan = t_full / n_layers
    step40 = per_layer_in_scan * 40
    fps = 49 / (50 * 2 * step40)
    print(f"scan-amortized layer: {per_layer_in_scan*1e3:.2f} ms -> "
          f"40-layer step {step40*1e3:.0f} ms -> {fps:.4f} fps/chip "
          f"(vs A100 est 0.089: {fps/0.089:.3f}x)")


if __name__ == "__main__":
    main()
