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
import gc
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
    ap.add_argument("--bf16-vae", action="store_true",
                    help="bf16 VAE params (halves VAE activation temps; "
                         "fallback if the fp32 fuse OOMs next to the DiT — "
                         "the reference runs the VAE fp32, so this is a "
                         "documented deviation when used)")
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
    vae_dtype = jnp.bfloat16 if args.bf16_vae else jnp.float32
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg, dtype=vae_dtype)
    _sync(vae_params)
    print(f"[2] {'bf16' if args.bf16_vae else 'fp32'} VAE resident "
          f"alongside: {time.perf_counter()-t0:.0f} s", flush=True)

    pipe = WanI2VPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                          streaming_vae=True, auto_layout=True)

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

    # AUTO entry layouts for the weights: without this XLA inserts ~5 GB of
    # u8 layout copies for the int4 attention stacks and the program does
    # not fit 16 GB next to the VAE (runtime/layouts.py; measured OOM
    # post-mortem in the round-3 history of this file)
    from worldforge_tpu.core.dtypes import DEFAULT_POLICY
    from worldforge_tpu.models.wan.dit import wan_dit_forward
    from worldforge_tpu.runtime.layouts import compile_auto_layouts

    def dit_cfg_step(params, lat, cond, t, pe, ne, ie):
        x = lat.astype(jnp.float32)
        y = cond.astype(jnp.float32)
        tb = jnp.broadcast_to(t, (lat.shape[0],))
        pred = wan_dit_forward(params, dit_cfg, x, tb, pe, clip_fea=ie, y=y,
                               policy=DEFAULT_POLICY)
        unc = wan_dit_forward(params, dit_cfg, x, tb, ne, clip_fea=ie, y=y,
                              policy=DEFAULT_POLICY)
        return pred + 4.0 * (pred - unc)

    step_args = (dit_params, lat, cond, jnp.float32(500.0), pe, ne, ie)
    step_compiled, step_args = compile_auto_layouts(dit_cfg_step, step_args,
                                                    auto_argnums=(0,))
    dit_params = step_args[0]
    pipe.dit_params = dit_params
    t_dit = timed(lambda: step_compiled(*step_args))
    print(f"[3] DiT CFG step (2x 14B i2v all-int4 fwd): {t_dit:.2f} s",
          flush=True)
    del step_compiled, step_args   # drop the step program before the VAE
    gc.collect()

    # each remaining phase is fault-tolerant: the fused clip below is the
    # headline measurement and must run even if a standalone phase OOMs
    # next to the resident weights (round-3 attempt 3 history: standalone
    # streaming decode hit RESOURCE_EXHAUSTED with the DiT resident)
    dec, enc = pipe._vae_decode_fn(), pipe._vae_encode_fn()
    t_dec = t_enc = float("nan")
    try:
        t_dec = timed(lambda: dec(lat))
        video_px = dec(lat)
        t_enc = timed(lambda: enc(video_px))
        del video_px
        print(f"[4] VAE fuse round-trip: decode {t_dec:.2f} s + "
              f"encode {t_enc:.2f} s", flush=True)
    except Exception as e:
        print(f"[4] standalone VAE phase failed next to resident weights: "
              f"{type(e).__name__} {str(e)[:200]}", flush=True)

    from worldforge_tpu.ops.flow import video_channel_flows_pair
    from worldforge_tpu.sampling.channel_select import _flow_similarity_scores

    @jax.jit
    def flf_batch(a, b):
        return _flow_similarity_scores(*video_channel_flows_pair(a, b))

    t_flf = float("nan")
    try:
        lat2 = lat + 0.1
        t_flf = timed(lambda: flf_batch(lat, lat2))
        del lat2
        print(f"[5] FLF device Farneback batch (16ch x 2 x 12 pairs): "
              f"{t_flf:.2f} s", flush=True)
    except Exception as e:
        print(f"[5] FLF phase failed: {type(e).__name__} {str(e)[:200]}",
              flush=True)
    gc.collect()

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
    lat_host = np.asarray(out_lat, np.float32)  # the result is safe now

    t_decode = float("nan")
    try:
        t0 = time.perf_counter()
        video = dec(jnp.asarray(lat_host))
        out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
        t_decode = time.perf_counter() - t0
        print(f"[7] final streaming decode: {t_decode:.1f} s "
              f"(clip {out.shape})", flush=True)
    except Exception as e:
        print(f"[7] final decode failed next to resident weights "
              f"({type(e).__name__}) — drop the DiT and decode "
              f"sequenced, as run_e2e_14b_int8.py does", flush=True)
        pipe.dit_params = None
        del dit_params
        gc.collect()
        t0 = time.perf_counter()
        video = dec(jnp.asarray(lat_host))
        out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
        t_decode = time.perf_counter() - t0
        print(f"[7b] sequenced decode: {t_decode:.1f} s (clip {out.shape})",
              flush=True)

    total = time.perf_counter() - t_all
    t_clip = t_denoise + t_decode
    print(f"GUIDED clip: denoise+decode {t_clip:.0f} s "
          f"({nf / t_clip:.4f} fps incl. compile; structural steady-state "
          f"{est:.0f} s), total wall from empty chip {total:.0f} s")


if __name__ == "__main__":
    main()
