"""int8 W8A8 serving-mode QUALITY gate (round-1 VERDICT weak #1).

The serving-mode bench number (bench.py int8_full, 1.07x baseline) is only
meaningful if the guided pipeline SURVIVES int8 noise: the FLF selection
thresholds (scheduling_unipc_multistep_clean.py:412-434) are statistics
over exactly the latents quantization perturbs. This gate runs the full
guided denoise state machine (UniPC + IRR re-noise + pixel fuse + FLF +
DSG, the wan_i2v fuse wiring) with the SAME tiny Wan DiT in fp32 vs
quantize_tree-int8 and asserts:

  (a) the FLF selected-channel SET is identical at every step, and
  (b) the final latents stay within a small relative drift.

Smoke scale: 2-layer tiny DiT, 16 latent channels (the z-dim the Wan FLF
schedule expects), stub VAE (tests/test_guided_drift.py), deterministic
shared noise.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_guided_drift import _StubVAE
from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                           wan_dit_forward)
from worldforge_tpu.ops.quant import quantize_tree
from worldforge_tpu.sampling.channel_select import apply_channel_replacement
from worldforge_tpu.sampling.engine import wan_denoise_loop
from worldforge_tpu.sampling.guidance import (GuidanceConfig, flf_select,
                                              fuse_latents)
from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule

SHAPE = (1, 16, 5, 8, 8)
# the Wan FLF schedule selects nothing before step 6 (max_replace=0 for
# steps <=5, reference :412-434); 14 steps exercises the 1-channel regime
# (6..10) and the threshold regime (>10)
N_STEPS = 14


def _run_guided(params, cfg, x0, noise_seq, vae, video_pix, mask_pix,
                selections):
    """The product guided loop (pipelines/wan_i2v.py wiring) with a
    selection recorder; returns final latents."""
    sched = make_flow_unipc_schedule(N_STEPS, shift=5.0)
    noise_iter = iter(noise_seq)
    dec, enc = vae.jax_fns()
    video_ref = jnp.asarray(video_pix)
    mask = jnp.asarray(mask_pix)
    g = GuidanceConfig(guided=True, resample_steps=2, guide_steps=N_STEPS,
                       resample_round=4, omega=4.0, omega_resample=1.0,
                       use_flf=True, flf_backend="wan",
                       use_optical_flow=False)
    key = jax.random.key(0)
    ctx = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim),
                            jnp.float32)

    fwd = jax.jit(lambda p, x, t: wan_dit_forward(
        p, cfg, x, jnp.broadcast_to(t, (x.shape[0],)), ctx))

    def model_fn(lat, t_model, i, r):
        return fwd(params, lat.astype(jnp.float32), jnp.float32(t_model))

    def fuse_fn(x0_, i, r):
        pre = x0_
        x0_ = fuse_latents(x0_, video_ref, mask, dec, enc)
        if r == 0:
            sel = flf_select(pre, x0_, i, g)
            selections.append((i, tuple(sel)))
            if sel:
                x0_ = apply_channel_replacement(x0_, pre, sel)
        return x0_

    out = wan_denoise_loop(model_fn, jnp.asarray(x0), sched, g,
                           noise_fn=lambda shape: next(noise_iter),
                           fuse_fn=fuse_fn, record_r0=True)
    return np.asarray(out)


def _randomize_head(params, key):
    """The Wan head projection is ZERO-initialized (reference DiT
    convention) — a random-init model outputs exactly 0, which would make
    this gate vacuous. Give the head real weights."""
    h = params["head"]["head"]
    params["head"]["head"] = dict(
        h, w=0.2 * jax.random.normal(key, h["w"].shape, h["w"].dtype))
    return params


def test_int8_guided_pipeline_quality():
    cfg = WanDiTConfig.tiny("t2v")
    key = jax.random.key(11)
    params = _randomize_head(init_wan_dit(key, cfg, dtype=jnp.float32), key)
    params_q = quantize_tree(params)
    # the quantizer must actually have quantized the big matmuls
    assert params_q["blocks"]["self_attn"]["q"].keys() >= {"w8", "scale"}

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

    # (a) FLF channel sets must be bitwise stable under quantization
    assert sel_fp == sel_q, f"FLF selection flipped: {sel_fp} vs {sel_q}"
    # the schedule must actually have selected channels (not vacuous)
    assert any(s for _, s in sel_fp), sel_fp

    # (b) final-latent drift bound — nonzero (the comparison is live) but
    # bounded (quantization noise does not blow up through the 14-step
    # IRR/fuse/DSG state machine)
    drift = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-8)
    assert 0.0 < drift < 0.08, f"int8 guided drift {drift:.3f}"


def test_int8_unguided_drift_bound():
    """Plain (unguided) denoise trajectory: int8 vs fp32 final latents at
    the same smoke scale — isolates solver accumulation from the fuse
    clamp."""
    cfg = WanDiTConfig.tiny("t2v")
    key = jax.random.key(12)
    params = _randomize_head(init_wan_dit(key, cfg, dtype=jnp.float32), key)
    params_q = quantize_tree(params)

    rng = np.random.default_rng(4)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    sched = make_flow_unipc_schedule(N_STEPS, shift=5.0)
    ctx = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim),
                            jnp.float32)
    fwd = jax.jit(lambda p, x, t: wan_dit_forward(
        p, cfg, x, jnp.broadcast_to(t, (x.shape[0],)), ctx))
    g = GuidanceConfig(guided=False, resample_steps=1, guide_steps=0,
                       resample_round=0, use_flf=False)

    outs = []
    for p in (params, params_q):
        out = wan_denoise_loop(
            lambda lat, t, i, r: fwd(p, lat.astype(jnp.float32),
                                     jnp.float32(t)),
            jnp.asarray(x0), sched, g, noise_fn=None,
            key=jax.random.key(5), record_r0=True)
        outs.append(np.asarray(out))
    drift = np.abs(outs[0] - outs[1]).max() / (np.abs(outs[0]).max() + 1e-8)
    assert 0.0 < drift < 0.08, f"int8 unguided drift {drift:.3f}"


# The int4 capacity-mode gates live in tests/test_int4_quality.py (they
# share this module's _run_guided/_randomize_head harness).
