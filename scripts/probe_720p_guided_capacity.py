"""Guided-720p capacity probe — the north-star config's missing piece
(VERDICT r4 item 2/3): can the per-step VAE fuse (streaming decode +
encode at 90x160 latents / 720x1280 px) coexist with the resident int4
Wan-14B i2v DiT on a 16 GB v5e?

Round 4 measured the 720p DENOISE (1865 s unguided, loop mode fits:
split one-forward program args 9.47 / temps 5.46 GiB) and the 720p
DECODE alone (23.9 s steady), but never the two CO-RESIDENT — and the
guided loop needs them co-resident, because the scheduler calls the VAE
inside the denoise loop (scheduling_unipc_multistep_clean.py:1248-1421).
The known bad sign: the POST-denoise co-resident decode at 720p
RESOURCE_EXHAUSTED 3/3 in round 4.

Protocol (each its own measured step, failure isolated per phase):
  1. bf16 VAE resident; AOT-compile streaming decode+encode at 720p,
     print memory analysis (VAE alone).
  2. all-int4 DiT resident alongside (compile its CFG step first — its
     relaid weights are the serving layout); re-AOT the fuse programs
     next to it; print memory analysis + HBM stats.
  3. Execute ONE fuse round trip (decode + blend + encode) with the DiT
     resident — the actual guided-step memory pattern.
  4. Execute ONE DiT CFG step after the fuse (allocator interleaving both
     directions).
Any phase that RESOURCE_EXHAUSTs prints the failure and the HBM stats —
that IS the capacity proof the verdict asks for.

Run from /root/repo on the TPU:
    python scripts/probe_720p_guided_capacity.py [--height 720 --width 1280]
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


def _hbm(tag):
    ms = jax.local_devices()[0].memory_stats()
    if ms:
        print(f"    [hbm after {tag}] in_use "
              f"{ms.get('bytes_in_use', 0)/2**30:.2f} GiB, peak "
              f"{ms.get('peak_bytes_in_use', 0)/2**30:.2f} / "
              f"{ms.get('bytes_limit', 0)/2**30:.2f} GiB", flush=True)


def _report(tag, compiled):
    try:
        ma = compiled.memory_analysis()
        print(f"    [{tag}] memory analysis: args "
              f"{ma.argument_size_in_bytes/2**30:.2f} GiB, temps "
              f"{ma.temp_size_in_bytes/2**30:.2f} GiB, output "
              f"{ma.output_size_in_bytes/2**30:.2f} GiB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"    [{tag}] memory analysis unavailable: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--skip-dit", action="store_true",
                    help="phase 1 only (VAE-alone baseline)")
    ap.add_argument("--spatial-chunks", type=int, default=1,
                    help="H-strip tiling of the decoder's spatial convs "
                         "(vae_stream.py, exact): the round-5 lever for "
                         "fitting the fuse next to the DiT — untiled "
                         "decode temps measured 12.65 GiB at 720p")
    args = ap.parse_args()

    from worldforge_tpu.core.dtypes import DEFAULT_POLICY
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit_w4,
                                               wan_dit_forward)
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.pipelines.vae_dispatch import jit_vae_fns
    from worldforge_tpu.runtime.layouts import compile_auto_layouts

    h, w, nf = args.height, args.width, args.frames
    t_lat, h_lat, w_lat = (nf - 1) // 4 + 1, h // 8, w // 8
    print(f"[probe] {h}x{w}x{nf}f: latents (1,16,{t_lat},{h_lat},{w_lat}), "
          f"tokens {t_lat * (h_lat // 2) * (w_lat // 2)}", flush=True)

    # ---- phase 1: VAE alone, AOT fuse programs
    vae_cfg = WanVAEConfig.wan_2_1()
    t0 = time.perf_counter()
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg, dtype=jnp.bfloat16)
    _sync(vae_params)
    print(f"[1] bf16 VAE resident: {time.perf_counter()-t0:.0f} s",
          flush=True)

    from worldforge_tpu.pipelines.vae_dispatch import vae_fn_pair
    dec_raw, enc_raw = vae_fn_pair(streaming=True, chunk=1,
                                   spatial_chunks=args.spatial_chunks)
    lat_shape = (1, 16, t_lat, h_lat, w_lat)
    pix_shape = (1, 3, nf, h, w)
    lat_spec = jax.ShapeDtypeStruct(lat_shape, jnp.float32)
    pix_spec = jax.ShapeDtypeStruct(pix_shape, jnp.bfloat16)

    t0 = time.perf_counter()
    dec_c = (jax.jit(lambda p, z: dec_raw(p, vae_cfg, z))
             .lower(vae_params, lat_spec).compile())
    _report("decode 720p (VAE alone)", dec_c)
    enc_c = (jax.jit(lambda p, v: enc_raw(p, vae_cfg, v.astype(jnp.float32)))
             .lower(vae_params, pix_spec).compile())
    _report("encode 720p (VAE alone)", enc_c)
    print(f"[2] fuse programs AOT-compiled (VAE alone): "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    _hbm("vae-alone compiles")
    if args.skip_dit:
        return

    # ---- phase 2: int4 DiT resident alongside + its CFG step program
    dit_cfg = WanDiTConfig.wan_14b_i2v()
    t0 = time.perf_counter()
    dit_params = init_wan_dit_w4(jax.random.key(0), dit_cfg,
                                 dtype=jnp.bfloat16, int4_keys=("*",))
    _sync(dit_params["blocks"]["ffn"]["fc1"]["w4"])
    print(f"[3] all-int4 14B i2v resident alongside: "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    _hbm("dit resident")

    lat = jax.random.normal(jax.random.key(5), lat_shape, jnp.float32)
    cond = jax.random.normal(jax.random.key(6), (1, 20, t_lat, h_lat, w_lat),
                             jnp.float32)
    pe = jax.random.normal(jax.random.key(7),
                           (1, dit_cfg.text_len, dit_cfg.text_dim),
                           jnp.bfloat16)
    ie = jax.random.normal(jax.random.key(8), (1, 257, dit_cfg.clip_dim),
                           jnp.bfloat16)

    def dit_one(params, lat, cond, t, ctx, ie):
        x = lat.astype(jnp.float32)
        y = cond.astype(jnp.float32)
        tb = jnp.broadcast_to(t, (lat.shape[0],))
        return wan_dit_forward(params, dit_cfg, x, tb, ctx, clip_fea=ie,
                               y=y, policy=DEFAULT_POLICY)

    t0 = time.perf_counter()
    one_args = (dit_params, lat, cond, jnp.float32(1000.0), pe, ie)
    one_c, one_args = compile_auto_layouts(dit_one, one_args,
                                           auto_argnums=(0,))
    dit_params = one_args[0]
    print(f"[4] DiT split-CFG forward compiled (+weights relaid): "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    _report("dit one-forward 720p", one_c)
    _hbm("dit compiled")

    # ---- phase 3: fuse programs AOT next to the resident DiT
    t0 = time.perf_counter()
    try:
        dec_c2 = (jax.jit(lambda p, z: dec_raw(p, vae_cfg, z))
                  .lower(vae_params, lat_spec).compile())
        _report("decode 720p (DiT resident)", dec_c2)
        enc_c2 = (jax.jit(lambda p, v: enc_raw(p, vae_cfg,
                                               v.astype(jnp.float32)))
                  .lower(vae_params, pix_spec).compile())
        _report("encode 720p (DiT resident)", enc_c2)
        print(f"[5] fuse programs compiled next to DiT: "
              f"{time.perf_counter()-t0:.0f} s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[5] fuse COMPILE next to DiT FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        _hbm("fuse-compile failure")
        raise SystemExit(2)
    _hbm("fuse compiled")

    # ---- phase 4: execute one fuse round trip with the DiT resident
    ref = (jax.random.uniform(jax.random.key(9), pix_shape, jnp.float32)
           .astype(jnp.bfloat16))
    mask = (jax.random.uniform(jax.random.key(10), (1, 1, nf, h, w),
                               jnp.float32) > 0.3).astype(jnp.bfloat16)
    blend = jax.jit(lambda v, r, m: (v.astype(jnp.bfloat16) * (1 - m)
                                     + r * m))
    try:
        t0 = time.perf_counter()
        video = dec_c2(vae_params, lat)
        fused = blend(video, ref, mask)
        lat2 = enc_c2(vae_params, fused)
        _sync(lat2)
        print(f"[6] ONE fuse round trip with DiT resident: "
              f"{time.perf_counter()-t0:.1f} s — FITS", flush=True)
        del video, fused
    except Exception as e:  # noqa: BLE001
        print(f"[6] fuse EXECUTION with DiT resident FAILED: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        _hbm("fuse-exec failure")
        raise SystemExit(3)
    _hbm("fuse executed")

    # ---- phase 5: DiT step after the fuse (allocator interleave)
    try:
        t0 = time.perf_counter()
        out = one_c(*one_args[:1], lat2, *one_args[2:])
        _sync(out)
        print(f"[7] DiT forward after fuse: {time.perf_counter()-t0:.1f} s "
              f"— GUIDED 720p STEP PATTERN FITS 16 GB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[7] DiT forward after fuse FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        _hbm("dit-after-fuse failure")
        raise SystemExit(4)
    _hbm("full interleave")
    print("[probe] VERDICT: guided 720p loop-mode serving fits — run "
          "run_e2e_guided.py --height 720 --width 1280 --mode loop "
          "--split-cfg for the full clip", flush=True)


if __name__ == "__main__":
    main()
