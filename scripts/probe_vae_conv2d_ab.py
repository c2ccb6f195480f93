"""Real-TPU A/B: native Conv3D vs temporally-decomposed Conv2D lowering for
the VAE's 3x3x3 convs (vae._CONV3D_MODE), on the production 480p x 49f
streaming decode + encode (the fuse_latents round-trip, ~5.4 s/guided step
in round 1 at 58-96 TF/s conv rates — the one measured component >30% off
the matmul roofline).

Interleaved rounds in one process. Equivalence is CI-pinned in
tests/test_vae_conv2d.py; this only times.

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/probe_vae_conv2d_ab.py
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
    import worldforge_tpu.models.wan.vae as vae_mod
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.models.wan.vae_stream import (vae_decode_streaming,
                                                      vae_encode_streaming)

    cfg = WanVAEConfig.wan_2_1()
    params = init_wan_vae(jax.random.key(0), cfg, dtype=jnp.float32)
    _sync(params)
    z = jax.random.normal(jax.random.key(1), (1, 16, 13, 60, 104),
                          jnp.float32)
    video = jax.random.normal(jax.random.key(2), (1, 3, 49, 480, 832),
                              jnp.float32)

    fns = {}
    for mode in ("3d", "2d", "pallas"):
        vae_mod._CONV3D_MODE = mode
        # params must be a jit ARGUMENT: closing over them embeds ~0.5 GB of
        # fp32 constants in the remote-compile payload (HTTP 413 on the
        # tunnel).
        dec_base = jax.jit(lambda pp, zz, _m=mode: vae_decode_streaming(
            pp, cfg, zz))
        enc_base = jax.jit(lambda pp, vv, _m=mode: vae_encode_streaming(
            pp, cfg, vv))
        dec = lambda zz, _f=dec_base: _f(params, zz)
        enc = lambda vv, _f=enc_base: _f(params, vv)
        try:
            out = dec(z)
            _sync(out)
            oz = enc(video)
            _sync(oz)
        except Exception as e:
            # measured round 4: "pallas" fails Mosaic compile at the
            # production decode shape (W=106 slice vs the (8,128) tile)
            print(f"{mode}: FAILS TO COMPILE at production shape "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:120]})",
                  flush=True)
            continue
        fns[mode] = (dec, enc)
        print(f"{mode}: compiled + warm", flush=True)

    best = {("dec", m): float("inf") for m in fns}
    best.update({("enc", m): float("inf") for m in fns})
    for r in range(3):
        for m, (dec, enc) in fns.items():
            t0 = time.perf_counter()
            out = dec(z)
            _sync(out)
            best[("dec", m)] = min(best[("dec", m)],
                                   time.perf_counter() - t0)
            t0 = time.perf_counter()
            oz = enc(video)
            _sync(oz)
            best[("enc", m)] = min(best[("enc", m)],
                                   time.perf_counter() - t0)
    for phase in ("dec", "enc"):
        row = " | ".join(f"{m} {best[(phase, m)]:.2f} s" for m in fns)
        a = best[(phase, "3d")]
        alts = [m for m in fns if m != "3d"]
        if alts:
            bestm = min(alts, key=lambda m: best[(phase, m)])
            row += (f"  (best alt {bestm}: "
                    f"{(a / best[(phase, bestm)] - 1) * 100:+.1f}% vs 3d)")
        print(f"{phase}: {row}")


if __name__ == "__main__":
    main()
