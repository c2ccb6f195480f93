"""Flow-matching Euler scheduler (LongCat path) — pure-functional.

Behavioral reference: /root/reference/longcat_for_worldforge/longcat_video/
modules/scheduling_flow_match_euler_discrete.py:401-1233 and the pipeline's
sigma tables (pipeline_longcat_video.py:316-331):

  standard: sigmas = linspace(0.999, 0, steps)
  distill (16-step LoRA): indices round(arange(1..16)*T/16); inference picks
    floor(linspace(0, 16, steps, endpoint=False)); sigmas = flip(idx)/T,
    shifted to end at 0
  then static shift: s' = shift*s/(1+(shift-1)*s); terminal 0 appended
  timesteps = sigmas * num_train_timesteps
  x0 = x - sigma_i * v          (scheduler step :857)
  euler: x_{i+1} = x + (sigma_{i+1} - sigma_i) * v   (:900)
  stochastic: x_{i+1} = (1-sigma_{i+1}) * x0 + sigma_{i+1} * eps (:895-897)
  add_noise: (1-sigma_i) * x0 + sigma_i * eps (:1041-1070)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    sigmas: np.ndarray     # [N+1], terminal 0
    timesteps: np.ndarray  # [N]
    num_steps: int
    stochastic: bool = False


def longcat_sigmas(num_steps: int, *, use_distill: bool = False,
                   num_train_timesteps: int = 1000,
                   num_distill_steps: int = 16) -> np.ndarray:
    if use_distill:
        idx = np.round(np.arange(1, num_distill_steps + 1, dtype=np.float64)
                       * (num_train_timesteps // num_distill_steps))
        inf_idx = np.floor(np.linspace(0, num_distill_steps, num=num_steps,
                                       endpoint=False)).astype(np.int64)
        sig = np.flip(idx)[inf_idx] / num_train_timesteps
        sig = sig - sig[-1]
        return sig.astype(np.float64)
    return np.linspace(0.999, 0.0, num_steps, dtype=np.float64)


def make_flow_match_schedule(num_steps: int, *, shift: float = 1.0,
                             use_distill: bool = False,
                             num_train_timesteps: int = 1000,
                             stochastic: bool = False) -> FlowMatchSchedule:
    sig = longcat_sigmas(num_steps, use_distill=use_distill,
                         num_train_timesteps=num_train_timesteps)
    if shift != 1.0:
        sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    timesteps = sig * num_train_timesteps
    sigmas = np.concatenate([sig, [0.0]])
    return FlowMatchSchedule(sigmas=sigmas, timesteps=timesteps,
                             num_steps=num_steps, stochastic=stochastic)


def fm_pred_x0(sched: FlowMatchSchedule, i: int, v: jnp.ndarray,
               x: jnp.ndarray) -> jnp.ndarray:
    return x - float(sched.sigmas[i]) * v


def fm_euler_step(sched: FlowMatchSchedule, i: int, x: jnp.ndarray,
                  v: jnp.ndarray) -> jnp.ndarray:
    dt = float(sched.sigmas[i + 1] - sched.sigmas[i])
    return x.astype(jnp.float32) + dt * v.astype(jnp.float32)


def fm_stochastic_step(sched: FlowMatchSchedule, i: int, x0: jnp.ndarray,
                       noise: jnp.ndarray) -> jnp.ndarray:
    s_next = float(sched.sigmas[i + 1])
    return (1.0 - s_next) * x0 + s_next * noise


def fm_add_noise(sched: FlowMatchSchedule, i: int, x0: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
    s = float(sched.sigmas[i])
    return (1.0 - s) * x0 + s * noise


def cfg_zero_combine(v_cond: jnp.ndarray, v_uncond: jnp.ndarray,
                     guidance_scale: float) -> jnp.ndarray:
    """CFG-zero optimized scale (pipeline_longcat_video.py:374-383, 875-885):
    st* = <v_c, v_u> / ||v_u||^2 per batch; pred = v_u*st* + g*(v_c - v_u*st*).
    """
    b = v_cond.shape[0]
    pf = v_cond.reshape(b, -1).astype(jnp.float32)
    nf = v_uncond.reshape(b, -1).astype(jnp.float32)
    st = (jnp.sum(pf * nf, axis=1, keepdims=True)
          / (jnp.sum(nf * nf, axis=1, keepdims=True) + 1e-8))
    st = st.reshape(b, *([1] * (v_cond.ndim - 1)))
    vu = v_uncond.astype(jnp.float32) * st
    out = vu + guidance_scale * (v_cond.astype(jnp.float32) - vu)
    return out.astype(v_cond.dtype)
