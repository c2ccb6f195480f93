"""int8 W8A8 serving-mode quality gate for the LONGCAT guided pipeline
(the LongCat analog of tests/test_int8_quality.py).

Runs the full guided flow-match state machine (IRR at the same timestep +
pixel fuse with zeroed frame-0 velocity + FLF channel replacement + DSG,
the generate_i2v wiring of pipelines/longcat.py) with the SAME tiny
LongCat DiT in fp32 vs quantize_tree-int8 and asserts the FLF
selected-channel sets are identical and the final-latent drift is bounded.
Covers both the standard and the 16-step distilled schedule (the fast
serving mode the int8 build targets)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_guided_drift import _StubVAE
from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                               init_longcat_dit,
                                               longcat_dit_forward)
from worldforge_tpu.ops.quant import quantize_tree
from worldforge_tpu.sampling.channel_select import apply_channel_replacement
from worldforge_tpu.sampling.engine import longcat_denoise_loop
from worldforge_tpu.sampling.flow_match import make_flow_match_schedule
from worldforge_tpu.sampling.guidance import (GuidanceConfig, flf_select,
                                              fuse_latents)

SHAPE = (1, 16, 4, 8, 8)   # 16 latent channels (FLF schedule expects z=16)


def _run_guided(params, cfg, x0, noise_seq, vae, video_pix, mask_pix,
                selections, use_distill, n_steps):
    sched = make_flow_match_schedule(n_steps, shift=1.0,
                                     use_distill=use_distill)
    noise_iter = iter(noise_seq)
    dec, enc = vae.jax_fns()
    video_ref = jnp.asarray(video_pix)
    mask = jnp.asarray(mask_pix)
    g = GuidanceConfig(guided=True, resample_steps=2, guide_steps=n_steps,
                       resample_round=n_steps - 1, omega=4.0,
                       omega_resample=1.0, use_flf=True,
                       flf_backend="longcat", distill=use_distill,
                       max_replace=2, use_optical_flow=False)
    key = jax.random.key(0)
    ctx = jax.random.normal(key, (1, 12, cfg.caption_channels), jnp.float32)

    fwd = jax.jit(lambda p, x, t: longcat_dit_forward(p, cfg, x, t, ctx))

    def model_fn(lat, t_model, i, r):
        # per-frame timestep with frame 0 pinned to 0 (the i2v cond frame,
        # pipeline_longcat_video.py:864-865)
        tvec = jnp.full((1, lat.shape[2]), jnp.float32(t_model))
        tvec = tvec.at[:, 0].set(0.0)
        return fwd(params, lat.astype(jnp.float32), tvec)

    def fuse_fn(x0_full, i, r):
        pre = x0_full
        x0f = fuse_latents(x0_full, video_ref, mask, dec, enc)
        sel = flf_select(pre, x0f, i, g)
        if r == 0:
            selections.append((i, tuple(sel)))
        if sel:
            x0f = apply_channel_replacement(x0f, pre, sel)
        return x0f

    out = longcat_denoise_loop(model_fn, jnp.asarray(x0), sched, g,
                               noise_fn=lambda shape: next(noise_iter),
                               fuse_fn=fuse_fn)
    return np.asarray(out)


@pytest.mark.parametrize("use_distill,n_steps,int4,bound", [
    (False, 8, False, 0.08),
    (True, 8, False, 0.08),
    # all-int4 W4A8 (init_longcat_dit_w4 semantics, int4_keys=("*",)) — the
    # 16 GB guided-serving build measured at 263 s/clip (docs/PERF.md);
    # distilled is the schedule that build ships. Measured tiny-shape drift
    # 0.087 (tiny shapes overstate quantization noise vs the production-
    # shape 2.1% measured for Wan all-int4 in measure_int4_drift_prod.py);
    # gate at ~1.7x measured, same as Wan's tiny all-int4 gate.
    (True, 8, True, 0.15),
])
def test_longcat_int8_guided_quality(use_distill, n_steps, int4, bound):
    cfg = LongCatDiTConfig.tiny()
    params = init_longcat_dit(jax.random.key(11), cfg, dtype=jnp.float32)
    if int4:
        params_q = quantize_tree(params, int4_keys=("*",), int4_group=32)
        assert params_q["blocks"]["qkv"].keys() >= {"w4", "scale8"}
    else:
        params_q = quantize_tree(params)
        assert params_q["blocks"]["qkv"].keys() >= {"w8", "scale"}

    rng = np.random.default_rng(3)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    nshape = (SHAPE[0], SHAPE[1], SHAPE[2] - 1) + SHAPE[3:]
    noise_seq = [rng.standard_normal(nshape).astype(np.float32)
                 for _ in range(n_steps * 2)]
    vae = _StubVAE(SHAPE[1], seed=99)
    tgt = (SHAPE[0], 3) + SHAPE[2:]
    video_pix = rng.uniform(0, 1, tgt).astype(np.float32)
    mask_pix = (rng.uniform(0, 1, (SHAPE[0], 1) + SHAPE[2:]) > 0.5
                ).astype(np.float32)

    sel_fp, sel_q = [], []
    out_fp = _run_guided(params, cfg, x0, list(noise_seq), vae, video_pix,
                         mask_pix, sel_fp, use_distill, n_steps)
    out_q = _run_guided(params_q, cfg, x0, list(noise_seq), vae, video_pix,
                        mask_pix, sel_q, use_distill, n_steps)

    assert sel_fp == sel_q, f"FLF selection flipped: {sel_fp} vs {sel_q}"
    assert any(s for _, s in sel_fp), sel_fp

    drift = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-8)
    mode = "int4" if int4 else "int8"
    assert 0.0 < drift < bound, f"longcat {mode} guided drift {drift:.3f}"
