"""UniPC multistep solver with flow-matching sigmas — pure-functional.

Behavioral reference: /root/reference/wan_for_worldforge/utils/
scheduling_unipc_multistep_clean.py (UniPCMultistepScheduler, :649-1648),
restricted to the configuration the WorldForge Wan pipeline actually uses:
predict_x0=True, prediction_type='flow_prediction', solver_order=2,
solver_type='bh2', lower_order_final=True, use_flow_sigmas=True. Notably the
reference's step() never invokes the corrector (multistep_uni_c_bh_update is
dead code in the custom scheduler), so the effective algorithm is the UniP
predictor, which is what we implement.

TPU-first design: the reference recomputes lambda/phi coefficients in torch
per step (with stateful step_index/order rollback hacks for IRR/DSG,
pipeline_wan_i2v_clean.py:584-587,683-706). Here the noise schedule is static
per run, so ALL solver coefficients are precomputed on host in float64
(including the sigma->0 final-step limit) and each device-side update is
x_t = c_x * x + c_m0 * m0 + c_m1 * m1. Solver state is an explicit pytree;
"re-do the step with a corrected output" is just calling the same pure
function again.

Flow sigma semantics (reference :816-823, :882-889):
  sigmas_i = shift*s/(1+(shift-1)*s), s = linspace(1,1/T,N+1)[::-1] flipped;
  timestep_i = sigma_i * num_train_timesteps; alpha_t = 1-sigma; sigma_t=sigma
  x0 = x - sigma*v ; lambda = log(alpha) - log(sigma)
  add_noise: x_noisy = (1-sigma)*x0 + sigma*eps  (:1542-1585)
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowUniPCSchedule:
    """Static per-run schedule + precomputed UniP coefficients."""

    sigmas: np.ndarray            # [N+1] float64, sigmas[-1] = 0
    timesteps: np.ndarray         # [N] float64 (sigma * num_train_timesteps)
    resample_timesteps: np.ndarray  # [N] int64, floor(sigma*T) (:1594-1629)
    num_steps: int
    # per-step coefficient tables, index i = step; order entries:
    c_x: np.ndarray               # [N] float64: sigma_t / sigma_s0
    c_m0_o1: np.ndarray           # [N]: order-1 m0 coefficient
    c_m0_o2: np.ndarray           # [N]: order-2 m0 coefficient
    c_m1_o2: np.ndarray           # [N]: order-2 m1 coefficient

    def order_for_step(self, i: int, lower_order_nums: int,
                       solver_order: int = 2) -> int:
        """this_order = min(min(solver_order, N-i), lower_order_nums+1)
        (reference step(), lower_order_final=True path :1493-1499)."""
        return min(min(solver_order, self.num_steps - i), lower_order_nums + 1)


def _lmbda(sigma: float) -> float:
    """lambda(sigma) for flow sigmas; +inf at sigma=0."""
    if sigma <= 0.0:
        return math.inf
    return math.log(1.0 - sigma) - math.log(sigma)


def make_flow_unipc_schedule(num_inference_steps: int, shift: float = 5.0,
                             num_train_timesteps: int = 1000,
                             solver_type: str = "bh2") -> FlowUniPCSchedule:
    """Build the flow-sigma schedule + UniP-bh coefficient tables.

    Mirrors set_timesteps use_flow_sigmas branch (:816-823) and
    multistep_uni_p_bh_update math (:978-1099) with final_sigmas_type='zero'.
    """
    n = num_inference_steps
    alphas = np.linspace(1.0, 1.0 / num_train_timesteps, n + 1, dtype=np.float64)
    s = 1.0 - alphas
    sig = np.flip(shift * s / (1.0 + (shift - 1.0) * s))[:-1].copy()
    # the reference CASTS timesteps to int64 (set_timesteps :826-827), so
    # the transformer sees floor(sigma*T); resample timesteps floor to the
    # same values — IRR re-denoise uses the identical model timestep
    timesteps = np.floor(sig * num_train_timesteps).astype(np.float64)
    sigmas = np.concatenate([sig, [0.0]])
    resample_ts = timesteps.astype(np.int64)

    c_x = np.zeros(n)
    c_m0_o1 = np.zeros(n)
    c_m0_o2 = np.zeros(n)
    c_m1_o2 = np.zeros(n)
    for i in range(n):
        s0, st = sigmas[i], sigmas[i + 1]
        a_t = 1.0 - st
        l_t, l_s0 = _lmbda(st), _lmbda(s0)
        h = l_t - l_s0
        hh = -h  # predict_x0
        phi1 = math.expm1(hh) if math.isfinite(hh) else -1.0
        b_h = phi1 if solver_type == "bh2" else hh
        c_x[i] = st / s0
        c_m0_o1[i] = -a_t * phi1
        if i >= 1 and math.isfinite(h) and h != 0.0:
            l_s1 = _lmbda(sigmas[i - 1])
            r1 = (l_s1 - l_s0) / h
            # rhos_p = [0.5] for order 2 (:1076-1079); D1 = (m1-m0)/r1
            k = a_t * b_h * 0.5 / r1
            c_m0_o2[i] = -a_t * phi1 + k
            c_m1_o2[i] = -k
        else:
            c_m0_o2[i] = c_m0_o1[i]
            c_m1_o2[i] = 0.0

    return FlowUniPCSchedule(
        sigmas=sigmas, timesteps=timesteps, resample_timesteps=resample_ts,
        num_steps=n, c_x=c_x, c_m0_o1=c_m0_o1, c_m0_o2=c_m0_o2,
        c_m1_o2=c_m1_o2)


class UniPCState(NamedTuple):
    """Solver history carried across steps (device arrays)."""
    m0: jnp.ndarray  # model_outputs[-1]: latest converted (and fused) x0
    m1: jnp.ndarray  # model_outputs[-2]


def init_unipc_state(latents_shape, dtype=jnp.float32) -> UniPCState:
    z = jnp.zeros(latents_shape, dtype)
    return UniPCState(m0=z, m1=z)


def flow_pred_x0(sched: FlowUniPCSchedule, i: int, v: jnp.ndarray,
                 x: jnp.ndarray) -> jnp.ndarray:
    """convert_model_output for flow_prediction: x0 = x - sigma_i * v
    (:934-941). IRR resampling uses resample_sigmas[i] == sigmas[i]."""
    return x - float(sched.sigmas[i]) * v


def unip_update(sched: FlowUniPCSchedule, i: int, order: int,
                x: jnp.ndarray, m0: jnp.ndarray,
                m1: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """multistep_uni_p_bh_update (:978-1099) as a static-coefficient axpy."""
    if order <= 1:
        return float(sched.c_x[i]) * x + float(sched.c_m0_o1[i]) * m0
    assert m1 is not None
    return (float(sched.c_x[i]) * x + float(sched.c_m0_o2[i]) * m0
            + float(sched.c_m1_o2[i]) * m1)


def add_noise(sched: FlowUniPCSchedule, i: int, x0: jnp.ndarray,
              noise: jnp.ndarray) -> jnp.ndarray:
    """(1 - sigma_i) * x0 + sigma_i * eps (:1542-1585). Used by IRR to
    re-noise pred_x0 at the current step's sigma."""
    s = float(sched.sigmas[i])
    return (1.0 - s) * x0 + s * noise


def dsg_extrapolate(good: jnp.ndarray, worse: jnp.ndarray,
                    omega: float) -> jnp.ndarray:
    """DSG directional extrapolation (pipeline_wan_i2v_clean.py:664-681):

      better = good + omega*sin(theta)*(good - (|good|/|worse|)*cos(theta)*worse)

    with theta the angle between the flattened predictions (per batch)."""
    axes = tuple(range(1, good.ndim))
    gf = good.astype(jnp.float32)
    wf = worse.astype(jnp.float32)
    dot = jnp.sum(gf * wf, axis=axes, keepdims=True)
    ng = jnp.sqrt(jnp.sum(gf * gf, axis=axes, keepdims=True))
    nw = jnp.sqrt(jnp.sum(wf * wf, axis=axes, keepdims=True))
    cos_t = jnp.clip(dot / (ng * nw + 1e-8), -1.0, 1.0)
    sin_t = jnp.sin(jnp.arccos(cos_t))
    ratio = ng / (nw + 1e-8)
    better = gf + omega * sin_t * (gf - (ratio * cos_t) * wf)
    return better.astype(good.dtype)
