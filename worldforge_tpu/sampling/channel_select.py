"""FLF (Flow-guided Latent Fusion) channel selection.

Behavioral reference: VideoMotionPCASelector
(/root/reference/wan_for_worldforge/utils/scheduling_unipc_multistep_clean.py
:30-607) and the LongCat variant VideoMotionChannelSelector
(longcat_video/modules/scheduling_flow_match_euler_discrete.py:35-381).

Per latent channel, motion (optical flow over frame pairs) is extracted for
both the generated pred_x0 and the encoded reference; a similarity score
combines M-EPE / Fl-all / M-AE:

  similarity = 1 - (0.45*clip(EPE/10) + 0.45*clip(Fl/0.5) + 0.1*clip(AE/30))
  (reference :580-603)

and a step-dependent schedule picks the LOW-correlation channels — those are
the ones handed back to the *generated* latents (fuse_latents :1410-1412):

  Wan schedule (:412-434): step<2 -> none; <=5 -> none; <=10 -> worst 1;
  else threshold mean - 0.625*std, min 2 / max 6.
  LongCat schedule (:332-377): distill: <=3 worst-1 else max_replace(def 3);
  standard: <=5 worst-1 else max_replace (def 1).

TPU-first: flows for all channels batch through one jitted pyramidal-LK call
(ops/flow.py); scores come back as one [C] vector; the (data-dependent,
small) selection logic runs on host — it is O(16) scalars per guided step.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from worldforge_tpu.ops.flow import video_channel_flows


from functools import partial


@partial(jax.jit, static_argnames=("variant",))
def _flow_similarity_scores(pred_flows: jnp.ndarray,
                            ref_flows: jnp.ndarray,
                            variant: str = "wan") -> jnp.ndarray:
    """similarity [C] from per-channel flows [B, C, T-1, 2, H, W].

    The two backends ship DIFFERENT metrics:
    - 'wan' (scheduling_unipc_multistep_clean.py:540-607): outlier mask is
      an AND of the thresholds, weights 0.45*EPE + 0.45*Fl + 0.1*AE.
    - 'longcat' (scheduling_flow_match_euler_discrete.py:172-242): outlier
      mask is an OR, weights 0.4*EPE + 0.4*Fl + 0.2*AE.
    """
    diff = pred_flows - ref_flows
    epe = jnp.sqrt(jnp.sum(diff ** 2, axis=3) + 1e-8)  # [B,C,T-1,H,W]

    dot = jnp.sum(ref_flows * pred_flows, axis=3)
    nr = jnp.sqrt(jnp.sum(ref_flows ** 2, axis=3) + 1e-8)
    nc = jnp.sqrt(jnp.sum(pred_flows ** 2, axis=3) + 1e-8)
    cos = jnp.clip(dot / (nr * nc + 1e-8), -1.0, 1.0)
    ae = jnp.arccos(cos) * (180.0 / jnp.pi)

    if variant == "wan":
        outlier = ((epe > 3.0) & (epe > nr * 0.05)).astype(jnp.float32)
        w_epe, w_fl, w_ae = 0.45, 0.45, 0.1
    else:
        outlier = ((epe > 3.0) | (epe > nr * 0.05)).astype(jnp.float32)
        w_epe, w_fl, w_ae = 0.4, 0.4, 0.2

    axes = (0, 2, 3, 4)
    m_epe = jnp.mean(epe, axis=axes)
    m_ae = jnp.mean(ae, axis=axes)
    fl_all = jnp.mean(outlier, axis=axes)

    err = (w_epe * jnp.clip(m_epe / 10.0, 0.0, 1.0)
           + w_fl * jnp.clip(fl_all / 0.5, 0.0, 1.0)
           + w_ae * jnp.clip(m_ae / 30.0, 0.0, 1.0))
    return jnp.clip(1.0 - err, 0.0, 1.0)


def _temporal_diff_motion(video: jnp.ndarray) -> jnp.ndarray:
    """Fallback motion features: per-channel frame differences repeated to
    the 2-channel flow layout (reference fallback path, scheduling_unipc
    :168-171 diff + _compute_flow_metrics' repeat-to-2ch :566-571)."""
    d = (video[:, :, 1:] - video[:, :, :-1]).astype(jnp.float32)
    return jnp.stack([d, d], axis=3)  # [B, C, T-1, 2, H, W]


def channel_similarities(pred_x0: jnp.ndarray,
                         ref_latents: jnp.ndarray,
                         use_optical_flow: bool = True,
                         variant: str = "wan") -> np.ndarray:
    """Per-channel flow-similarity scores [C] (host numpy)."""
    if use_optical_flow:
        from worldforge_tpu.ops.flow import video_channel_flows_pair
        pf, rf = video_channel_flows_pair(pred_x0, ref_latents)
    else:
        pf = _temporal_diff_motion(pred_x0)
        rf = _temporal_diff_motion(ref_latents)
    return np.asarray(_flow_similarity_scores(pf, rf, variant=variant))


def select_channels_wan(scores: np.ndarray, current_step: int) -> List[int]:
    """Wan schedule (reference :412-434). Returns sorted channel indices to
    hand back to the generated latents."""
    if current_step < 2:
        return []
    order = np.argsort(scores)
    if current_step <= 10:
        max_replace = 0 if current_step <= 5 else 1
        sel = order[:max_replace].tolist()
    else:
        threshold = scores.mean() - 0.625 * scores.std()
        below = [i for i, s in enumerate(scores) if s < threshold]
        if len(below) < 2:
            sel = order[:2].tolist()
        elif len(below) > 6:
            below.sort(key=lambda i: scores[i])
            sel = below[:6]
        else:
            sel = below
    return sorted(int(i) for i in sel)


def select_channels_longcat(scores: np.ndarray, current_step: int,
                            distill: bool, max_replace: Optional[int] = None
                            ) -> List[int]:
    """LongCat schedule (longcat scheduler :326-381): warmup takes the
    single worst channel; afterwards the Wan-style mean-0.625*std threshold
    applies with min_replace=1 and a distill/standard max_replace clamp."""
    if current_step < 2:
        return []
    order = np.argsort(scores)
    warm = current_step <= (3 if distill else 5)
    if warm:
        return sorted(int(i) for i in order[:1].tolist())
    max_n = max_replace if max_replace is not None else (3 if distill else 1)
    threshold = scores.mean() - 0.625 * scores.std()
    below = [i for i, s in enumerate(scores) if s < threshold]
    if len(below) < 1:
        sel = order[:1].tolist()
    elif len(below) > max_n:
        below.sort(key=lambda i: scores[i])
        sel = below[:max_n]
    else:
        sel = below
    return sorted(int(i) for i in sel)


def select_mask_wan_device(scores: jnp.ndarray, step: jnp.ndarray
                           ) -> jnp.ndarray:
    """Device-side (traceable) Wan selection schedule: returns a float mask
    [C], 1 = hand the channel back to the generated latents. Same semantics
    as select_channels_wan; `step` may be a traced scalar (scan-fused loop).

    Below-threshold channels are exactly the lowest-ranked ones, so the
    min-2/max-6 clamps reduce to rank comparisons."""
    c = scores.shape[0]
    order = jnp.argsort(scores)
    ranks = jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32))
    thr = jnp.mean(scores) - 0.625 * jnp.std(scores)
    below = scores < thr
    nbelow = jnp.sum(below.astype(jnp.int32))
    sel_late = jnp.where(
        nbelow < 2, ranks < 2,
        jnp.where(nbelow > 6, below & (ranks < 6), below))
    sel_mid = ranks < 1
    mask = jnp.where(step <= 5, jnp.zeros((c,), bool),
                     jnp.where(step <= 10, sel_mid, sel_late))
    mask = jnp.where(step < 2, jnp.zeros((c,), bool), mask)
    return mask.astype(jnp.float32)


def select_mask_longcat_device(scores: jnp.ndarray, step: jnp.ndarray,
                               distill: bool,
                               max_replace: Optional[int] = None
                               ) -> jnp.ndarray:
    """Device-side LongCat selection schedule (select_channels_longcat as
    traceable rank math)."""
    c = scores.shape[0]
    order = jnp.argsort(scores)
    ranks = jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32))
    n_late = max_replace if max_replace is not None else (3 if distill else 1)
    early = step <= (3 if distill else 5)
    thr = jnp.mean(scores) - 0.625 * jnp.std(scores)
    below = scores < thr
    nbelow = jnp.sum(below.astype(jnp.int32))
    sel_late = jnp.where(
        nbelow < 1, ranks < 1,
        jnp.where(nbelow > n_late, below & (ranks < n_late), below))
    mask = jnp.where(early, ranks < 1, sel_late)
    mask = jnp.where(step < 2, jnp.zeros((c,), bool), mask)
    return mask.astype(jnp.float32)


def apply_channel_replacement(encoded_ref: jnp.ndarray, pred_x0: jnp.ndarray,
                              channels: Sequence[int]) -> jnp.ndarray:
    """Give the selected (low-correlation) channels of the fused/encoded
    reference back to the generated latents (fuse_latents :1410-1412)."""
    if not channels:
        return encoded_ref
    mask = np.zeros((encoded_ref.shape[1],), np.float32)
    mask[list(channels)] = 1.0
    m = jnp.asarray(mask)[None, :, None, None, None]
    return encoded_ref * (1.0 - m) + pred_x0.astype(encoded_ref.dtype) * m
