"""Multi-chip dry run: jit the FULL guided denoise step over a real
(dp, fsdp, sp) mesh on tiny shapes — validates shardings, collectives, and
the Ulysses path without N physical chips (driver runs this on N virtual CPU
devices)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def _pick_mesh_dims(n: int):
    """Factor n into (dp, fsdp, sp) with sp getting the largest power of 2
    up to 4, then fsdp, then dp."""
    sp = 1
    for c in (4, 2):
        if n % c == 0:
            sp = c
            break
    rem = n // sp
    fsdp = 2 if rem % 2 == 0 else 1
    dp = rem // fsdp
    return dp, fsdp, sp


def run_dryrun(n_devices: int) -> None:
    from worldforge_tpu.core.mesh import make_mesh
    from worldforge_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                               wan_dit_forward)
    from worldforge_tpu.models.wan.vae import (WanVAEConfig, init_wan_vae,
                                               vae_decode, vae_encode)
    from worldforge_tpu.parallel.sharding import shard_params_fsdp
    from worldforge_tpu.sampling.unipc import (flow_pred_x0,
                                               make_flow_unipc_schedule,
                                               unip_update)

    dp, fsdp, sp = _pick_mesh_dims(n_devices)
    mesh = make_mesh(dp=dp, fsdp=fsdp, sp=sp)
    print(f"dryrun mesh: dp={dp} fsdp={fsdp} sp={sp}")

    vae_cfg = WanVAEConfig.tiny()  # z=4
    # heads divisible by sp; token count divisible by sp
    cfg = WanDiTConfig(model_type="i2v", in_dim=4 + 4 + vae_cfg.z_dim,
                       out_dim=vae_cfg.z_dim, dim=64, ffn_dim=128,
                       num_heads=4, num_layers=2, text_len=16, text_dim=32,
                       freq_dim=16)
    params = init_wan_dit(jax.random.key(0), cfg)
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)

    params = shard_params_fsdp(params, mesh)
    vae_params = shard_params_fsdp(vae_params, mesh)

    b = dp  # one sample per dp shard
    f, hh, ww = 3, 8, 8  # latent grid; tokens = 3*4*4 = 48, div by sp<=4
    x = jax.device_put(
        jax.random.normal(jax.random.key(2),
                          (b, vae_cfg.z_dim, f, hh, ww), jnp.float32),
        NamedSharding(mesh, P("dp")))
    cond = jax.device_put(
        jax.random.normal(jax.random.key(3), (b, 8, f, hh, ww), jnp.float32),
        NamedSharding(mesh, P("dp")))
    ctx = jax.device_put(
        jax.random.normal(jax.random.key(4), (b, cfg.text_len, cfg.text_dim),
                          jnp.float32), NamedSharding(mesh, P("dp")))
    clip_fea = jax.device_put(
        jax.random.normal(jax.random.key(5), (b, 257, 1280), jnp.float32),
        NamedSharding(mesh, P("dp")))
    ref = jax.device_put(
        jax.random.uniform(jax.random.key(6),
                           (b, 3, 1 + 4 * (f - 1), hh * 8, ww * 8)),
        NamedSharding(mesh, P("dp")))
    mask = jnp.ones((b, 1, 1 + 4 * (f - 1), hh * 8, ww * 8), jnp.float32)

    sched = make_flow_unipc_schedule(4)
    gscale = 4.0

    def guided_step(params, vae_params, x, cond, ctx, clip_fea, ref, mask):
        t = jnp.full((b,), float(sched.timesteps[0]), jnp.float32)
        v_c = wan_dit_forward(params, cfg, x, t, ctx, clip_fea=clip_fea,
                              y=cond, mesh=mesh)
        v_u = wan_dit_forward(params, cfg, x, t, ctx * 0.9,
                              clip_fea=clip_fea, y=cond, mesh=mesh)
        v = v_c + gscale * (v_c - v_u)                      # WF CFG form
        x0 = flow_pred_x0(sched, 0, v, x)
        dec = vae_decode(vae_params, vae_cfg, x0)           # fuse round-trip
        fused = ref * mask + (dec * 0.5 + 0.5) * (1 - mask)
        x0f = vae_encode(vae_params, vae_cfg, fused * 2.0 - 1.0)
        return unip_update(sched, 0, 1, x, x0f)

    with mesh:
        step = jax.jit(guided_step)
        out = step(params, vae_params, x, cond, ctx, clip_fea, ref, mask)
        out.block_until_ready()
    arr = np.asarray(out)
    assert np.isfinite(arr).all(), "dryrun produced non-finite values"

    _dryrun_longcat_bsa(mesh, dp, sp)
    print(f"dryrun_multichip({n_devices}): ok, out {arr.shape}, "
          f"mesh=({dp},{fsdp},{sp})")


def _dryrun_longcat_bsa(mesh, dp: int, sp: int) -> None:
    """Phase 2: the LongCat distilled guided step sharded over the same
    mesh — per-frame timesteps (frame 0 = cond), CFG-zero optimized scale
    (pipeline_longcat_video.py:374-383), block-sparse attention through the
    ring-CP path when sp>1, flow-match Euler update + IRR re-noise."""
    from worldforge_tpu.models.longcat.dit import (LongCatDiTConfig,
                                                   init_longcat_dit,
                                                   longcat_dit_forward)
    from worldforge_tpu.parallel.sharding import shard_params_fsdp

    cfg = LongCatDiTConfig.tiny()
    params = shard_params_fsdp(
        init_longcat_dit(jax.random.key(7), cfg), mesh)
    b = dp
    # latent grid (16, 4, 8) = 512 tokens = 4 chunks of (4,4,8): divisible
    # by every sp the mesh factoring produces (<= 4)
    f, hh, ww = 16, 8, 16
    x = jax.device_put(
        jax.random.normal(jax.random.key(8),
                          (b, cfg.in_channels, f, hh, ww), jnp.float32),
        NamedSharding(mesh, P("dp")))
    ctx = jax.device_put(
        jax.random.normal(jax.random.key(9), (b, 6, cfg.caption_channels),
                          jnp.float32), NamedSharding(mesh, P("dp")))
    sigma, sigma_next = 0.9, 0.7

    def distilled_step(params, x, ctx, key):
        # refine-style: uniform t, no cond latents — BSA is only ever used
        # on chunk-padded cond-free sequences in the reference
        # (generate_refine, pipeline_longcat_video.py:1411-1428)
        t = jnp.full((b, f), 700.0, jnp.float32)
        v_c = longcat_dit_forward(params, cfg, x, t, ctx, mesh=mesh,
                                  bsa_params={"sparsity": 0.5})
        v_u = longcat_dit_forward(params, cfg, x, t, ctx * 0.9, mesh=mesh,
                                  bsa_params={"sparsity": 0.5})
        # CFG-zero optimized scale st* = <v_c, v_u> / ||v_u||^2
        st = (jnp.sum(v_c * v_u) /
              jnp.maximum(jnp.sum(v_u * v_u), 1e-8))
        v = v_u * st + 4.0 * (v_c - v_u * st)
        xn = x + (sigma_next - sigma) * v          # Euler flow step
        x0 = xn - sigma_next * v
        noise = jax.random.normal(key, x.shape)    # IRR re-noise
        return (1.0 - sigma_next) * x0 + sigma_next * noise

    with mesh:
        out = jax.jit(distilled_step)(params, x, ctx, jax.random.key(10))
        out.block_until_ready()
    arr = np.asarray(out)
    assert np.isfinite(arr).all(), "longcat dryrun produced non-finite"
    print(f"  longcat+bsa phase: ok, out {arr.shape}")
