"""End-to-end PRODUCTION-SCALE clip on one v5e: Wan2.1-14B t2v, W8A8 int8,
480p x 49 frames, the reference's full 50-step x 2-CFG flow-UniPC schedule
(text2video.py:29-271 semantics via pipelines/wan_t2v.py), real-size VAE
streaming decode. Random-init weights (none exist in this env) — the point
is a MEASURED wall-clock sec/clip for the whole serving path, not sample
quality.

Memory: int8 DiT blocks (14.05 GB) + fp32 VAE (~0.5 GB) + DiT forward
activations do NOT coexist on 16 GB (measured: RESOURCE_EXHAUSTED on the
first CFG step with the VAE resident; the DiT-only forward fits). So the
run is SEQUENCED — denoise, drop the DiT, then build the VAE and decode —
mirroring the reference's model offload (image2video.py:223-238). On a
v5p (95 GB) both stay resident.

Run from /root/repo with no JAX_PLATFORMS overrides:
    python scripts/run_e2e_14b_int8.py
"""

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
    from worldforge_tpu.models.wan.dit import WanDiTConfig, init_wan_dit_int8
    from worldforge_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from worldforge_tpu.models.wan.vae_stream import vae_decode_streaming
    from worldforge_tpu.pipelines.wan_t2v import WanT2VPipeline

    t_all = time.perf_counter()
    dit_cfg = WanDiTConfig(model_type="t2v", in_dim=16)
    key = jax.random.key(0)

    t0 = time.perf_counter()
    dit_params = init_wan_dit_int8(key, dit_cfg, dtype=jnp.bfloat16)
    _sync(dit_params["blocks"]["ffn"]["fc1"]["w8"])
    print(f"[1] int8 14B resident: {time.perf_counter()-t0:.0f} s",
          flush=True)

    vae_cfg = WanVAEConfig.wan_2_1()
    # VAE params built lazily AFTER the DiT is dropped (see module docstring)
    pipe = WanT2VPipeline(dit_params, dit_cfg, vae_params=None,
                          vae_cfg=vae_cfg)
    ctx = jax.random.normal(jax.random.key(2),
                            (1, dit_cfg.text_len, dit_cfg.text_dim),
                            jnp.bfloat16)
    ctx_neg = jax.random.normal(jax.random.key(3), ctx.shape, jnp.bfloat16)

    t0 = time.perf_counter()
    lat = pipe.generate(jax.random.key(4), ctx, ctx_neg,
                        height=480, width=832, num_frames=49,
                        num_inference_steps=50, guidance_scale=5.0,
                        output_type="latent")
    _sync(lat)
    t_denoise = time.perf_counter() - t0
    print(f"[2] 50-step x 2-CFG denoise (incl. compile): {t_denoise:.0f} s",
          flush=True)

    lat_host = np.asarray(lat, np.float32)   # keep latents across the swap
    pipe.dit_params = None
    del dit_params, lat
    gc.collect()

    t0 = time.perf_counter()
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg, dtype=jnp.float32)
    _sync(vae_params)
    video = vae_decode_streaming(vae_params, vae_cfg, jnp.asarray(lat_host))
    out = np.clip((np.asarray(video, np.float32) + 1.0) / 2.0, 0, 1)
    t_decode = time.perf_counter() - t0
    print(f"[3] VAE build + streaming decode (incl. compile): "
          f"{t_decode:.0f} s", flush=True)

    total = time.perf_counter() - t_all
    t_clip = t_denoise + t_decode
    print(f"clip {out.shape}: denoise+decode {t_clip:.0f} s "
          f"({49/t_clip:.4f} fps), total wall incl. weight build "
          f"{total:.0f} s")


if __name__ == "__main__":
    main()
