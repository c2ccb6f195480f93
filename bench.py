"""Driver benchmark: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

North-star metric (BASELINE.json): frames/sec/chip for Wan2.1-14B 480p,
50-step denoise. Default mode measures the FULL 40-layer 14B **i2v** model
(the WorldForge flagship, wan_i2v_14B.py:27-36 — carries the k_img/v_img
CLIP branch, ~16.4B params) on chip in the mixed serving configuration
that fits 16 GB: FFN weights int4 (W4A8 — requantized to int8 on the fly
and run on the 2x-rate int8 MXU path), W8A8 everywhere else, built layer-
by-layer on device by init_wan_dit_w4 (bf16 stacked weights at ~33 GB can
never be materialized on a v5e to quantize from). Quality-gated end-to-end
in tests/test_int4_quality.py (measured guided drift 1.9%, gated 4%).
BENCH_MODE=int8_full measures the t2v variant in all-int8 W8A8 (the round-2
default; t2v fits int8, i2v does not). BENCH_MODE=bf16_layer gives the
round-1 bf16 layer-extrapolated metric (full bf16 does not fit HBM;
extrapolation measured conservative — probe_full_model_int8.py --phase a).

vs_baseline: the A100 reference has no published WorldForge throughput
(SURVEY.md §6); we report vs an estimated A100 structural baseline of
50 steps x 2 CFG x ~5.5 s/fwd (14B, 20k tokens) ≈ 0.089 frames/sec.
Provenance (BASELINE.md "A100 baseline provenance"): the MFU assumption is
anchored to the one published Wan2.1 throughput datum — T2V-1.3B ≈ 4 min
for a 5 s 480p clip on an RTX 4090 (Wan2.1 README / arXiv:2503.20314) —
whose implied MFU band puts the A100 14B forward at 0.065-0.084 fps;
0.089 sits above the band, i.e. generous to the A100.
"""

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


A100_BASELINE_FPS = 0.089  # anchored estimate: BASELINE.md "provenance"


def _free_memory():
    """Best-effort device/host cleanup between bench attempts.

    After an OOM (RESOURCE_EXHAUSTED) the failed attempt's params/activations
    are only freed once Python drops the references and XLA's caches are
    cleared; without this, every later rung of the degradation ladder
    inherits the exhausted chip and fails too (the BENCH_r04 failure mode)."""
    gc.collect()
    try:
        jax.clear_caches()
    except Exception:
        pass
    gc.collect()


def _attempt(fn, label, retries=1):
    """Run ``fn()``; on ANY failure free memory and retry up to ``retries``
    times (transient remote-compile 500s and post-OOM chip state both
    deserve one retry — CLAUDE.md). Returns (value, None) or (None, err)."""
    last = None
    for i in range(retries + 1):
        try:
            return fn(), None
        except BaseException as e:  # noqa: BLE001 — bench must never crash
            if isinstance(e, KeyboardInterrupt):
                raise
            last = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"bench: {label} attempt {i + 1}/{retries + 1} failed "
                  f"({type(e).__name__})", file=sys.stderr)
        # freed OUTSIDE the except block: while the exception is live its
        # __traceback__ pins the failed attempt's frames (params and all),
        # so gc inside the handler cannot release the OOM'd buffers
        _free_memory()
    return None, last


def _sync(x):
    jax.block_until_ready(x)
    # axon tunnel: block_until_ready may return early; force a host read of a
    # single element (device-side index, then scalar transfer).
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench_wan_14b_full(mode: str = "i2v_w4"):
    """Measured full-model step, 40 layers, 480p x 49f on chip.

    mode "i2v_w4": the i2v flagship, FFN int4 (W4A8) + W8A8 elsewhere
    (~13.6 GB — the only way i2v fits a 16 GB v5e).
    mode "int8_full": the t2v variant, all-W8A8 (14.05 GB)."""
    from worldforge_tpu.models.wan.dit import (WanDiTConfig,
                                               init_wan_dit_int8,
                                               init_wan_dit_w4,
                                               wan_dit_forward)

    f, hh, ww = 13, 60, 104      # 480p x 49 frames latents
    key = jax.random.key(0)
    if mode == "i2v_w4":
        cfg = WanDiTConfig.wan_14b_i2v()
        params = init_wan_dit_w4(key, cfg, dtype=jnp.bfloat16)
        _sync(params["blocks"]["ffn"]["fc1"]["w4"])
    else:
        cfg = WanDiTConfig(model_type="t2v", in_dim=16)  # 14B, no img branch
        params = init_wan_dit_int8(key, cfg, dtype=jnp.bfloat16)
        _sync(params["blocks"]["ffn"]["fc1"]["w8"])

    x = jax.random.normal(key, (1, 16, f, hh, ww), jnp.bfloat16)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    extra = {}
    if cfg.model_type == "i2v":
        extra["clip_fea"] = jax.random.normal(key, (1, 257, cfg.clip_dim),
                                              jnp.bfloat16)
        extra["y"] = jax.random.normal(key, (1, 20, f, hh, ww), jnp.bfloat16)
    step = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c,
                                                      **extra))
    out = step(params, x, t, ctx)
    _sync(out)
    best = float("inf")          # best of 3 rounds (tunnel timing jitter ~5%)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            out = step(params, x, t, ctx)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / 2)

    num_steps, cfg_mult, frames = 50, 2, 49
    return frames / (num_steps * cfg_mult * best)


def bench_wan_dit_480p():
    from worldforge_tpu.models.wan.dit import (
        WanDiTConfig, init_wan_dit_layer, wan_dit_layer_forward)

    cfg = WanDiTConfig.wan_14b_i2v()
    f, h, w = 13, 30, 52          # 480p x 49 frames -> 20280 tokens
    seq = f * h * w
    key = jax.random.key(0)
    layer = init_wan_dit_layer(key, cfg, dtype=jnp.bfloat16)
    if os.environ.get("BENCH_MODE") == "int8":
        # W8A8 serving mode at layer scale (ops/quant.py)
        from worldforge_tpu.ops.quant import quantize_tree
        layer = quantize_tree(layer)

    x = jax.random.normal(key, (1, seq, cfg.dim), jnp.bfloat16)
    e = jax.random.normal(key, (1, 6, cfg.dim), jnp.float32)
    ctx = jax.random.normal(key, (1, cfg.text_len + 257, cfg.dim), jnp.bfloat16)

    from worldforge_tpu.ops.rope import rope_cos_sin
    cos, sin = rope_cos_sin(f, h, w, cfg.dim // cfg.num_heads)

    def step(layer, x, e, ctx):
        return wan_dit_layer_forward(layer, cfg, x, e, ctx, cos, sin,
                                     img_ctx_len=257)

    step = jax.jit(step)
    out = step(layer, x, e, ctx)
    _sync(out)
    n_iter = 8
    per_layer = float("inf")  # best of 3 rounds (tunnel timing jitter ~5%)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = step(layer, x, e, ctx)
        _sync(out)
        per_layer = min(per_layer, (time.perf_counter() - t0) / n_iter)

    num_steps, cfg_mult, frames = 50, 2, 49
    step_time = per_layer * cfg.num_layers
    total = num_steps * cfg_mult * step_time
    return frames / total


def bench_attention_only():
    from worldforge_tpu.ops.flash_attention import flash_attention
    key = jax.random.key(0)
    q = jax.random.normal(key, (1, 20480, 40, 128), jnp.bfloat16)
    o = flash_attention(q, q, q)
    _sync(o)
    t0 = time.perf_counter()
    for _ in range(3):
        o = flash_attention(q, q, q)
    _sync(o)
    dt = (time.perf_counter() - t0) / 3
    # express as frames/sec assuming attention is ~40% of a layer -> rough
    return None, dt


def main():
    """Degradation ladder — every rung catches everything, frees device
    memory, and retries once; the script ALWAYS prints exactly one JSON
    line and exits 0 (BENCH_r04 was an escaped RESOURCE_EXHAUSTED with no
    JSON — the official round artifact must exist even on a wedged chip)."""
    mode = os.environ.get("BENCH_MODE", "i2v_w4")
    errors = []

    if mode in ("i2v_w4", "int8_full"):
        labels = {
            "i2v_w4": "i2v (flagship), int4-FFN W4A8 serving",
            "int8_full": "t2v, int8 W8A8 serving",
        }
        fps, err = _attempt(lambda: bench_wan_14b_full(mode), "full-model")
        if fps is not None:
            print(json.dumps({
                "metric": f"frames/sec/chip (Wan2.1-14B {labels[mode]}, "
                          "480p, 50 steps, measured full model)",
                "value": round(fps, 4),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
            }))
            return
        errors.append(f"full-model: {err}")
        print("bench: falling back to layer extrapolation", file=sys.stderr)

    fps, err = _attempt(bench_wan_dit_480p, "layer-extrapolated")
    if fps is not None:
        tag = ("int8" if os.environ.get("BENCH_MODE") == "int8" else "bf16")
        print(json.dumps({
            "metric": f"frames/sec/chip (Wan2.1-14B 480p, 50 steps, {tag}, "
                      "layer-extrapolated)",
            "value": round(fps, 4),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        }))
        return
    errors.append(f"layer: {err}")
    print("bench: falling back to attention-only metric", file=sys.stderr)

    res, err = _attempt(bench_attention_only, "attention-only")
    if res is not None:
        _, dt = res
        print(json.dumps({
            "metric": "flash-attention ms (Wan 480p self-attn shape)",
            "value": round(dt * 1e3, 2),
            "unit": "ms",
            "vs_baseline": 0.0,
        }))
        return
    errors.append(f"attention: {err}")

    # nothing ran — still emit one honest JSON line and exit 0
    print(json.dumps({
        "metric": "frames/sec/chip (Wan2.1-14B 480p, 50 steps)",
        "value": 0.0,
        "unit": "frames/sec/chip",
        "vs_baseline": 0.0,
        "error": "; ".join(errors)[:800],
    }))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — last-resort: emit JSON anyway
        print(json.dumps({
            "metric": "frames/sec/chip (Wan2.1-14B 480p, 50 steps)",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0.0,
            "error": f"unhandled {type(e).__name__}: {str(e)[:300]}",
        }))
    sys.exit(0)
