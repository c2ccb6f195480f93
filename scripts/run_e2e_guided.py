"""End-to-end PRODUCTION-SCALE **GUIDED** clip on one v5e — the flagship
BASELINE.json config 4: Wan2.1-I2V-14B, 480p x 49 frames, 50-step x 2-CFG
flow-UniPC with the FULL WorldForge state machine (IRR resample_steps=2,
FLF device Farneback channel selection, DSG, pixel-space VAE fuse every
guided step), reference cost structure at pipeline_wan_i2v_clean.py:562-728.

The capacity trick that makes DiT+VAE coexist in 16 GB (they must — the
scheduler calls the VAE inside the denoise loop): the ALL-int4 W4A8 DiT
(~8.2 GB blocks, quality-gated at 5% guided drift in
tests/test_int4_quality.py) + the fp32 VAE (~0.5 GB) + streaming VAE
encode/decode (single-pass 480p decode cannot compile on 16 GB).

Random-init weights (none exist in this env) and random prompt/CLIP
embeddings — the measurement is wall-clock sec/clip for the whole guided
serving path, not sample quality (quality is gated separately against the
reference oracle in tests/test_guided_drift.py).

Two measurements, same process:
  1. per-phase costs at production shape (DiT CFG step, VAE decode+encode
     fuse round-trip, FLF Farneback batch) — the breakdown;
  2. the ONE-PROGRAM fused guided clip (pipelines/wan_i2v.py fused=True):
     total measured sec/clip.

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/run_e2e_guided.py [--steps 50] [--phase-only]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--phase-only", action="store_true",
                    help="measure the per-phase costs, skip the full clip")
    args = ap.parse_args()

    from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit_w4
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.wan_i2v import WanI2VPipeline
    from worldforge_tpu.sampling.guidance import GuidanceConfig

    t_all = time.perf_counter()
    dit_cfg = WanDiTConfig.wan_14b_i2v()
    key = jax.random.key(0)

    t0 = time.perf_counter()
    dit_params = init_wan_dit_w4(key, dit_cfg, dtype=jnp.bfloat16,
                                 int4_keys=("*",))
    _sync(dit_params["blocks"]["ffn"]["fc1"]["w4"])
    print(f"[1] all-int4 14B i2v resident: {time.perf_counter()-t0:.0f} s",
          flush=True)

    vae_cfg = WanVAEConfig.wan_2_1()
    t0 = time.perf_counter()
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg, dtype=jnp.float32)
    _sync(vae_params)
    print(f"[2] fp32 VAE resident alongside: {time.perf_counter()-t0:.0f} s",
          flush=True)

    pipe = WanI2VPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                          streaming_vae=True)

    h, w, nf = 480, 832, 49
    f_lat, h_lat, w_lat = 13, 60, 104
    image = jax.random.uniform(jax.random.key(2), (1, 3, h, w),
                               jnp.float32) * 2.0 - 1.0
    pe = jax.random.normal(jax.random.key(3),
                           (1, dit_cfg.text_len, dit_cfg.text_dim),
                           jnp.bfloat16)
    ne = jax.random.normal(jax.random.key(4), pe.shape, jnp.bfloat16)
    ie = jax.random.normal(jax.random.key(5), (1, 257, dit_cfg.clip_dim),
                           jnp.bfloat16)
    video_ref = jax.random.uniform(jax.random.key(6), (1, 3, nf, h, w),
                                   jnp.float32)
    # WorldForge-like validity mask: ~70% reference-valid, soft-ish edges
    mask = (jax.random.uniform(jax.random.key(7), (1, 1, nf, h, w),
                               jnp.float32) > 0.3).astype(jnp.float32)

    # ---------------- phase costs at production shape (steady-state) ----
    lat = jax.random.normal(jax.random.key(8),
                            (1, 16, f_lat, h_lat, w_lat), jnp.float32)
    cond = jax.random.normal(jax.random.key(9),
                             (1, 20, f_lat, h_lat, w_lat), jnp.float32)

    def timed(fn, *a, n=2):
        out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        _sync(out)
        return (time.perf_counter() - t0) / n

    run_cfg, _ = pipe._dit_step
    t_dit = timed(lambda: run_cfg(dit_params, lat, cond, jnp.float32(500.0),
                                  pe, ne, ie, 4.0))
    print(f"[3] DiT CFG step (2x 14B i2v all-int4 fwd): {t_dit:.2f} s",
          flush=True)

    dec, enc = pipe._vae_decode_fn(), pipe._vae_encode_fn()
    t_dec = timed(lambda: dec(lat))
    video_px = dec(lat)
    t_enc = timed(lambda: enc(video_px))
    print(f"[4] VAE fuse round-trip: decode {t_dec:.2f} s + "
          f"encode {t_enc:.2f} s", flush=True)

    from worldforge_tpu.ops.flow import video_channel_flows_pair
    from worldforge_tpu.sampling.channel_select import _flow_similarity_scores

    @jax.jit
    def flf_batch(a, b):
        return _flow_similarity_scores(*video_channel_flows_pair(a, b))

    lat2 = lat + 0.1
    t_flf = timed(lambda: flf_batch(lat, lat2))
    print(f"[5] FLF device Farneback batch (16ch x 2 x 12 pairs): "
          f"{t_flf:.2f} s", flush=True)

    g = GuidanceConfig()  # reference production defaults: guided,
    # guide_steps=15, resample_steps=2, resample_round=20, omega=4, FLF on
    n_guided = min(g.guide_steps, args.steps)
    est = (args.steps * t_dit                      # every step, 1 CFG call
           + n_guided * (g.resample_steps - 1) * t_dit   # IRR extra calls
           + n_guided * g.resample_steps * (t_dec + t_enc)  # fuse round-trips
           + n_guided * t_flf                      # FLF once per step (r=0)
           + t_dec)                                # final decode
    print(f"    structural estimate ({args.steps} steps, {n_guided} guided): "
          f"{est:.0f} s/clip", flush=True)

    if args.phase_only:
        return

    # ---------------- the fused guided clip (one jit program) -----------
    t0 = time.perf_counter()
    out_lat = pipe.generate(
        jax.random.key(10), image, pe, ne, ie, height=h, width=w,
        num_frames=nf, num_inference_steps=args.steps, guidance_scale=4.0,
        video_ref=video_ref, mask=mask, guidance=g, output_type="latent",
        fused=True)
    _sync(out_lat)
    t_denoise = time.perf_counter() - t0
    print(f"[6] fused guided denoise, {args.steps} steps "
          f"(incl. compile): {t_denoise:.0f} s", flush=True)

    t0 = time.perf_counter()
    video = dec(out_lat)
    out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
    t_decode = time.perf_counter() - t0
    print(f"[7] final streaming decode: {t_decode:.1f} s", flush=True)

    total = time.perf_counter() - t_all
    t_clip = t_denoise + t_decode
    print(f"GUIDED clip {out.shape}: denoise+decode {t_clip:.0f} s "
          f"({nf / t_clip:.4f} fps incl. compile; structural steady-state "
          f"{est:.0f} s), total wall from empty chip {total:.0f} s")


if __name__ == "__main__":
    main()
