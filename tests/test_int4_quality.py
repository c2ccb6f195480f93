"""int4 weight-only capacity-mode QUALITY gates (round-2 VERDICT weak #1).

The int4-FFN mode is the ONLY configuration in which the Wan-14B i2v
flagship fits a 16 GB v5e (docs/SERVING.md), so its quality bound is a
serving claim, not a capacity footnote. These gates run the full guided
state machine (UniPC + IRR re-noise + pixel fuse + FLF + DSG — the
pipelines/wan_i2v.py wiring, reference
wan_for_worldforge/utils/pipeline_wan_i2v_clean.py:562-712) with the same
tiny DiT in fp32 vs int4 and assert FLF channel-set stability plus a
final-latent drift bound set at the MEASURED drift + ~2x margin (measured
on this harness: FFN-int4 0.0192, all-int4 0.0228 under the round-3 W4A8
execution path; 0.0180/0.0230 under round-2 weight-only dequant — the
former 0.10/0.15 bounds were ~6x looser than reality).

Production-shape evidence: scripts/measure_int4_drift_prod.py runs the
same machinery at the production latent shape (1,16,13,60,104) with real
Farneback FLF statistics on the TPU; the measured number is recorded in
docs/PERF.md and the script gates itself at the bound below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_guided_drift import _StubVAE
from tests.test_int8_quality import (N_STEPS, SHAPE, _randomize_head,
                                     _run_guided)
from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from worldforge_tpu.ops.quant import quantize_tree


@pytest.mark.parametrize("int4_keys,bound", [
    (("fc1", "fc2"), 0.04),   # the i2v capacity config (FFN int4); meas 0.019
    (("*",), 0.05),           # all-int4 (~8 GB) coarsest build; meas 0.023
])
def test_w4_guided_pipeline_quality(int4_keys, bound):
    cfg = WanDiTConfig.tiny("t2v")
    key = jax.random.key(11)
    params = _randomize_head(init_wan_dit(key, cfg, dtype=jnp.float32), key)
    params_q = quantize_tree(params, int4_keys=int4_keys, int4_group=32)
    assert "w4" in params_q["blocks"]["ffn"]["fc1"]

    rng = np.random.default_rng(3)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    noise_seq = [rng.standard_normal(SHAPE).astype(np.float32)
                 for _ in range(N_STEPS * 2)]
    vae = _StubVAE(SHAPE[1], seed=99)
    tgt = (SHAPE[0], 3) + SHAPE[2:]
    video_pix = rng.uniform(0, 1, tgt).astype(np.float32)
    mask_pix = (rng.uniform(0, 1, (SHAPE[0], 1) + SHAPE[2:]) > 0.5
                ).astype(np.float32)

    sel_fp, sel_q = [], []
    out_fp = _run_guided(params, cfg, x0, list(noise_seq), vae, video_pix,
                         mask_pix, sel_fp)
    out_q = _run_guided(params_q, cfg, x0, list(noise_seq), vae, video_pix,
                        mask_pix, sel_q)
    assert sel_fp == sel_q, f"FLF selection flipped: {sel_fp} vs {sel_q}"
    assert any(s for _, s in sel_fp), sel_fp
    drift = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-8)
    assert 0.0 < drift < bound, f"w4({int4_keys}) guided drift {drift:.3f}"


@pytest.mark.parametrize("use_distill,bound", [
    (True, 0.11),    # the distilled fast mode the all-int4 build targets;
    #                  measured drift 0.087 (round 3) -> gate meas + margin
    (False, 0.10),   # measured 0.076
])
def test_longcat_w4_guided_quality(use_distill, bound):
    """LongCat all-int4 (W4A8) guided gate — the capacity build behind
    scripts/run_e2e_longcat_guided.py (init_longcat_dit_w4, ~6.8 GB blocks
    coexisting with the VAE). Mirrors test_longcat_int8_quality with the
    int4 quantizer; gate set at measured drift + margin (record the
    measured value in the assert message history when tightening)."""
    from tests.test_longcat_int8_quality import SHAPE as LSHAPE
    from tests.test_longcat_int8_quality import _run_guided as _run_lc
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit)

    n_steps = 8
    cfg = LongCatDiTConfig.tiny()
    params = init_longcat_dit(jax.random.key(11), cfg, dtype=jnp.float32)
    params_q = quantize_tree(params, int4_keys=("*",), int4_group=32)
    assert "w4" in params_q["blocks"]["qkv"]

    rng = np.random.default_rng(3)
    x0 = rng.standard_normal(LSHAPE).astype(np.float32)
    nshape = (LSHAPE[0], LSHAPE[1], LSHAPE[2] - 1) + LSHAPE[3:]
    noise_seq = [rng.standard_normal(nshape).astype(np.float32)
                 for _ in range(n_steps * 2)]
    vae = _StubVAE(LSHAPE[1], seed=99)
    tgt = (LSHAPE[0], 3) + LSHAPE[2:]
    video_pix = rng.uniform(0, 1, tgt).astype(np.float32)
    mask_pix = (rng.uniform(0, 1, (LSHAPE[0], 1) + LSHAPE[2:]) > 0.5
                ).astype(np.float32)

    sel_fp, sel_q = [], []
    out_fp = _run_lc(params, cfg, x0, list(noise_seq), vae, video_pix,
                     mask_pix, sel_fp, use_distill, n_steps)
    out_q = _run_lc(params_q, cfg, x0, list(noise_seq), vae, video_pix,
                    mask_pix, sel_q, use_distill, n_steps)
    assert sel_fp == sel_q, f"FLF selection flipped: {sel_fp} vs {sel_q}"
    assert any(s for _, s in sel_fp), sel_fp
    drift = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-8)
    assert 0.0 < drift < bound, f"longcat w4 guided drift {drift:.3f}"


@pytest.mark.parametrize("int6_keys,int4_keys,bound", [
    (("fc1", "fc2"), ("*",), 0.025),  # int6 FFN + int4 attn; measured 0.0113
    (("*",), (), 0.02),               # all-int6; measured 0.008
])
def test_w6_guided_pipeline_quality(int6_keys, int4_keys, bound):
    """int6 (W6A8) quality gates — the round-4 recipe that HALVES guided
    drift vs int4 and keeps the FLF channel sets stable (no boundary
    flips), while still fitting a 16 GB v5e next to the VAE (~9.5 GB
    blocks; ops/quant.py int6 section). Gates = measured + ~2x margin at
    this CI shape; production-shape evidence:
    scripts/measure_int4_drift_prod.py int6 rows (docs/PERF.md — int6-ffn
    0.0216 / all-int6 0.0167 max-abs at (1,16,13,60,104), vs int4's
    0.0481/0.0518 same day). The int6 run must also beat the int4 run on
    the same seeds — the entire point of the 6-bit rung."""
    cfg = WanDiTConfig.tiny("t2v")
    key = jax.random.key(11)
    params = _randomize_head(init_wan_dit(key, cfg, dtype=jnp.float32), key)
    params_q = quantize_tree(params, int4_keys=int4_keys, int4_group=32,
                             int6_keys=int6_keys, int6_group=32)
    assert "w6" in params_q["blocks"]["ffn"]["fc1"]
    params_4 = quantize_tree(params, int4_keys=("*",), int4_group=32)

    rng = np.random.default_rng(3)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    noise_seq = [rng.standard_normal(SHAPE).astype(np.float32)
                 for _ in range(N_STEPS * 2)]
    vae = _StubVAE(SHAPE[1], seed=99)
    tgt = (SHAPE[0], 3) + SHAPE[2:]
    video_pix = rng.uniform(0, 1, tgt).astype(np.float32)
    mask_pix = (rng.uniform(0, 1, (SHAPE[0], 1) + SHAPE[2:]) > 0.5
                ).astype(np.float32)

    sel_fp, sel_q, sel_4 = [], [], []
    out_fp = _run_guided(params, cfg, x0, list(noise_seq), vae, video_pix,
                         mask_pix, sel_fp)
    out_q = _run_guided(params_q, cfg, x0, list(noise_seq), vae, video_pix,
                        mask_pix, sel_q)
    out_4 = _run_guided(params_4, cfg, x0, list(noise_seq), vae, video_pix,
                        mask_pix, sel_4)
    assert sel_fp == sel_q, f"FLF selection flipped: {sel_fp} vs {sel_q}"
    drift = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-8)
    drift4 = np.abs(out_fp - out_4).max() / (np.abs(out_fp).max() + 1e-8)
    assert 0.0 < drift < bound, \
        f"w6({int6_keys}) guided drift {drift:.4f} (int4 same seeds {drift4:.4f})"
    assert drift < drift4, (drift, drift4)
