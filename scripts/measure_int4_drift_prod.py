"""PRODUCTION-latent-shape int4 guided-drift measurement (round-2 VERDICT
next-round item 3): fp32 vs int4 W4A8 through the full guided state machine
(flow-UniPC + IRR re-noise + pixel fuse + FLF + DSG — the pipelines/wan_i2v.py
wiring, reference wan_for_worldforge/utils/pipeline_wan_i2v_clean.py:562-712)
at the production latent shape (1,16,13,60,104) with REAL device-Farneback
FLF statistics (use_optical_flow=True; the tiny CI gate in
tests/test_int4_quality.py uses the temporal-difference fallback at 8x8).

What this proves that the tiny gate cannot: the FLF selection thresholds are
statistics of Farneback flows over the real 60x104 latent maps
(scheduling_unipc_multistep_clean.py:412-434) — int4 noise must not flip the
selected-channel sets at the scale those statistics actually operate on, and
the final-latent drift must stay inside the serving gate (0.04 FFN-int4 /
0.05 all-int4, set at measured-tiny-drift + ~2x margin).

The DiT is the tiny 2-layer config (an fp32 14B model cannot exist on any
chip — 56 GB — so fp32-vs-int4 at full width is unmeasurable anywhere; the
quantization noise per matmul is width-independent per-channel rounding, and
the guided machinery, FLF statistics, and latent shapes here are ALL
production-exact). Results are recorded in docs/PERF.md.

Run on the real chip (or CPU, slower):
    python scripts/measure_int4_drift_prod.py [--steps 14]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def run_guided(params, cfg, x0, noise_seq, vae, video_pix, mask_pix,
               selections, n_steps):
    """tests/test_int8_quality.py::_run_guided with the Farneback FLF
    backend enabled (use_optical_flow=True)."""
    from worldforge_tpu.models.wan.dit import wan_dit_forward
    from worldforge_tpu.sampling.channel_select import apply_channel_replacement
    from worldforge_tpu.sampling.engine import wan_denoise_loop
    from worldforge_tpu.sampling.guidance import (GuidanceConfig, flf_select,
                                                  fuse_latents)
    from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule

    sched = make_flow_unipc_schedule(n_steps, shift=5.0)
    noise_iter = iter(noise_seq)
    dec, enc = vae.jax_fns()
    video_ref = jnp.asarray(video_pix)
    mask = jnp.asarray(mask_pix)
    g = GuidanceConfig(guided=True, resample_steps=2, guide_steps=n_steps,
                       resample_round=4, omega=4.0, omega_resample=1.0,
                       use_flf=True, flf_backend="wan",
                       use_optical_flow=True)
    ctx = jax.random.normal(jax.random.key(0),
                            (1, cfg.text_len, cfg.text_dim), jnp.float32)

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=14,
                    help="14 covers both FLF regimes: 1-channel (6..10) "
                         "and threshold (>10)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin otherwise "
                         "grabs the TPU; use this to run alongside a chip job)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tests.test_guided_drift import _StubVAE
    from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from worldforge_tpu.ops.quant import quantize_tree

    SHAPE = (1, 16, 13, 60, 104)  # Wan-14B 480p x 49f production latents
    cfg = WanDiTConfig.tiny("t2v")
    key = jax.random.key(11)
    params = init_wan_dit(key, cfg, dtype=jnp.float32)
    # the Wan head is zero-init (reference convention) -> randomize so the
    # comparison is not vacuous (tests/test_int8_quality.py::_randomize_head)
    h = params["head"]["head"]
    params["head"]["head"] = dict(
        h, w=0.2 * jax.random.normal(key, h["w"].shape, h["w"].dtype))

    rng = np.random.default_rng(3)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    noise_seq = [rng.standard_normal(SHAPE).astype(np.float32)
                 for _ in range(args.steps * 2)]
    vae = _StubVAE(SHAPE[1], seed=99)
    video_pix = rng.uniform(0, 1, (SHAPE[0], 3) + SHAPE[2:]).astype(
        np.float32)
    mask_pix = (rng.uniform(0, 1, (SHAPE[0], 1) + SHAPE[2:]) > 0.5
                ).astype(np.float32)

    t0 = time.perf_counter()
    sel_fp = []
    out_fp = run_guided(params, cfg, x0, list(noise_seq), vae, video_pix,
                        mask_pix, sel_fp, args.steps)
    print(f"fp32 guided run: {time.perf_counter()-t0:.0f} s, "
          f"FLF selections {sel_fp}", flush=True)

    for int4_keys, bound in ((("fc1", "fc2"), 0.04), (("*",), 0.05)):
        params_q = quantize_tree(params, int4_keys=int4_keys, int4_group=32)
        assert "w4" in params_q["blocks"]["ffn"]["fc1"]
        t0 = time.perf_counter()
        sel_q = []
        out_q = run_guided(params_q, cfg, x0, list(noise_seq), vae,
                           video_pix, mask_pix, sel_q, args.steps)
        drift = np.abs(out_fp - out_q).max() / (np.abs(out_fp).max() + 1e-8)
        stable = sel_fp == sel_q
        print(f"int4({','.join(int4_keys)}): guided drift {drift:.4f} "
              f"(gate {bound}), FLF sets {'IDENTICAL' if stable else 'FLIPPED'}"
              f" [{time.perf_counter()-t0:.0f} s]", flush=True)
        if not stable:
            print(f"  fp32: {sel_fp}\n  int4: {sel_q}", flush=True)
        assert stable, "FLF channel set flipped under int4 at production shape"
        assert 0.0 < drift < bound, f"drift {drift:.4f} outside gate {bound}"
    print("PASS: production-shape int4 guided drift inside the serving gates")


if __name__ == "__main__":
    main()
