"""WorldForge guidance engine pieces: pixel-space latent fusion (IRR/FLF).

fuse_latents behavioral reference:
/root/reference/wan_for_worldforge/utils/scheduling_unipc_multistep_clean.py
:1248-1421 (Wan) and longcat scheduler :1072-1233 (LongCat, strict-shape
variant). The reference does decode -> masked pixel blend -> re-encode with
the VAE every guided step; here the whole round trip is jit-compiled and
stays on device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from worldforge_tpu.sampling.channel_select import (
    apply_channel_replacement, channel_similarities, select_channels_wan,
    select_channels_longcat)


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Reference flag surface (pipeline_wan_i2v_clean.py:388-424 and
    run_longcat_worldforge_single.py CLI)."""
    guided: bool = True
    guide_steps: int = 15
    resample_steps: int = 2       # IRR inner iterations
    resample_round: int = 20      # steps after which IRR stops
    omega: float = 4.0            # DSG strength while i < guide_steps
    omega_resample: float = 1.0   # DSG strength after guide_steps
    use_flf: bool = True          # flow-guided channel selection
    flf_backend: str = "wan"      # 'wan' | 'longcat' selection schedule
    distill: bool = False         # LongCat distilled schedule
    max_replace: Optional[int] = None
    use_optical_flow: bool = True  # False -> temporal-difference fallback


def resize_video_like(x: jnp.ndarray, target_shape, method: str):
    """Resize [B, C, T, H, W] to target (B,C,T,H,W) shape (fuse_latents'
    interpolation alignment, reference :1300-1371)."""
    if tuple(x.shape) == tuple(target_shape):
        return x
    if x.shape[0] != target_shape[0]:
        x = jnp.broadcast_to(x, (target_shape[0],) + x.shape[1:])
    return jax.image.resize(x, tuple(target_shape),
                            method=method)


def fuse_latents(pred_x0: jnp.ndarray,
                 video_ref: jnp.ndarray,
                 mask: jnp.ndarray,
                 vae_decode: Callable[[jnp.ndarray], jnp.ndarray],
                 vae_encode: Callable[[jnp.ndarray], jnp.ndarray],
                 *,
                 flf_channels: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """decode(pred_x0) -> ref*m + gen*(1-m) -> encode (reference :1248-1421).

    pred_x0: [B, z, T', H', W'] normalized latents.
    video_ref: [B, 3, T, H, W] reference pixels in [0, 1] (scaled to [-1,1]
    inside, reference :1374-1376). mask: [B, 1, T, H, W], 1 = use reference.
    vae_decode/vae_encode close over VAE params and handle the per-channel
    latent normalization.
    flf_channels: channel indices whose fused latents are replaced by the
    generated pred_x0 (computed by the caller via channel_select).
    """
    decoded = vae_decode(pred_x0)  # [B, 3, T, H, W] in [-1, 1]
    tgt = decoded.shape
    ref = resize_video_like(video_ref.astype(decoded.dtype), tgt, "linear")
    m = resize_video_like(mask.astype(decoded.dtype),
                          (tgt[0], 1, tgt[2], tgt[3], tgt[4]), "nearest")
    ref = 2.0 * ref - 1.0
    fused = ref * m + decoded * (1.0 - m)
    # no fp32 force-cast: the encode fn owns its compute dtype (a bf16 VAE
    # must see bf16 input or every conv promotes to fp32 — the 16 GB guided
    # program's margin lives on this, scripts/run_e2e_guided.py)
    encoded = vae_encode(fused)
    if flf_channels:
        encoded = apply_channel_replacement(encoded, pred_x0, flf_channels)
    return encoded.astype(pred_x0.dtype)


def flf_select(pred_x0: jnp.ndarray, encoded_ref: jnp.ndarray,
               current_step: int, cfg: GuidanceConfig) -> List[int]:
    """Pick the low-correlation channels per the backend schedule."""
    if not cfg.use_flf:
        return []
    if current_step < 2:
        # both schedules return [] before step 2 (scheduling_unipc:412-418;
        # longcat scheduler :326-332) — skip the full per-channel flow
        # computation they would discard
        return []
    scores = channel_similarities(pred_x0, encoded_ref,
                                  use_optical_flow=cfg.use_optical_flow,
                                  variant=cfg.flf_backend)
    if cfg.flf_backend == "wan":
        return select_channels_wan(scores, current_step)
    return select_channels_longcat(scores, current_step, cfg.distill,
                                   cfg.max_replace)
