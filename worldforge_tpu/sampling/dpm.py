"""Flow DPM-Solver++ multistep — pure-functional, host-precomputed tables.

Behavioral reference: /root/reference/wan_for_worldforge/wan/utils/
fm_solvers.py (FlowDPMSolverMultistepScheduler :71-859), restricted to the
deterministic configuration the vendored Wan facades use:
algorithm_type='dpmsolver++', prediction_type='flow_prediction',
solver_type='midpoint' (or 'heun'), solver_order<=3, lower_order_final=True,
final_sigmas_type='zero'. The SDE variants add noise terms the WorldForge
paths never enable and are not implemented.

TPU-first design (same pattern as sampling/unipc.py): the noise schedule is
static per run, so every per-step DPM coefficient — including the
sigma->0 final-step limit where h->inf and the update degenerates to
x' = m0 — is precomputed on host in float64. The device-side step is a
3-term axpy: x' = c_x*x + c_m0*m0 + c_m1*m1 + c_m2*m2 over the converted
x0 predictions, which XLA fuses into the surrounding graph (no stateful
step_index / model_outputs list as in the reference :764-776).

Math (fm_solvers.py):
  x0 = x - sigma*v                      (convert_model_output :383-386)
  lambda = log(1-sigma) - log(sigma); h = lambda_t - lambda_s
  order 1 (:460-463):  x' = (s_t/s_s) x - a_t (e^-h - 1) m0
  order 2 midpoint (:549-553): ... - 0.5 a_t (e^-h - 1) D1,
      D1 = (m0 - m1)/r0, r0 = (lambda_s0-lambda_s1)/h
  order 2 heun (:554-557): + a_t ((e^-h - 1)/h + 1) D1
  order 3 (:666-672): + a_t((e^-h-1)/h+1) D1 - a_t((e^-h-1+h)/h^2 - 0.5) D2
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    """Pre-shifted sigma grid used by the vendored Wan facades
    (fm_solvers.py:24-29): linspace(1,0,N+1)[:N] then time-shift."""
    s = np.linspace(1.0, 0.0, sampling_steps + 1,
                    dtype=np.float64)[:sampling_steps]
    return shift * s / (1.0 + (shift - 1.0) * s)


@dataclasses.dataclass(frozen=True)
class FlowDPMSchedule:
    """Static per-run schedule + per-step DPM-Solver++ coefficients."""

    sigmas: np.ndarray       # [N+1] float64, sigmas[-1] = 0
    timesteps: np.ndarray    # [N] float64 == floor(sigma*T) (int64 cast :278)
    num_steps: int
    order: np.ndarray        # [N] int: effective order actually taken
    c_x: np.ndarray          # [N] float64: sample coefficient sigma_t/sigma_s0
    c_m0: np.ndarray         # [N]
    c_m1: np.ndarray         # [N] (zero where order < 2)
    c_m2: np.ndarray         # [N] (zero where order < 3)


def _lmbda(sigma: float) -> float:
    if sigma <= 0.0:
        return math.inf
    if sigma >= 1.0:      # sigma grid can start at exactly 1 (pure noise)
        return -math.inf
    return math.log(1.0 - sigma) - math.log(sigma)


def make_flow_dpm_schedule(num_inference_steps: int, shift: float = 5.0,
                           num_train_timesteps: int = 1000,
                           sigmas: Optional[np.ndarray] = None,
                           solver_order: int = 2,
                           solver_type: str = "midpoint") -> FlowDPMSchedule:
    """Build the flow-sigma grid + coefficient tables.

    Mirrors set_timesteps (:228-293): default grid
    linspace(sigma_max, 0, N+1)[:-1] with the time-shift applied (sigma_max
    itself already shifted at init :187-193), or a caller-provided grid
    (e.g. get_sampling_sigmas) to which the shift is applied again with the
    facades' shift=1 convention; final sigma 0 appended
    (final_sigmas_type='zero'). Timesteps are cast to int64 by the
    reference (:278-279), so we floor them here.

    The effective order at step i replicates step() (:749-786):
    warmup min(order, i+1); forced order 1 at the final step
    (final_sigmas_type='zero'); order<=2 at N-2 when N < 15.
    """
    n = num_inference_steps
    if sigmas is None:
        s_max = 1.0 - 1.0 / num_train_timesteps
        s_max = shift * s_max / (1.0 + (shift - 1.0) * s_max)
        grid = np.linspace(s_max, 0.0, n + 1, dtype=np.float64)[:-1]
        grid = shift * grid / (1.0 + (shift - 1.0) * grid)
    else:
        grid = np.asarray(sigmas, np.float64)
        grid = shift * grid / (1.0 + (shift - 1.0) * grid)
        n = len(grid)
    sig = np.concatenate([grid, [0.0]])
    timesteps = np.floor(grid * num_train_timesteps)

    lam = np.array([_lmbda(s) for s in sig])
    alpha = 1.0 - sig

    order = np.zeros(n, np.int64)
    c_x = np.zeros(n)
    c_m0 = np.zeros(n)
    c_m1 = np.zeros(n)
    c_m2 = np.zeros(n)
    for i in range(n):
        o = min(solver_order, i + 1)
        if i == n - 1:
            o = 1
        elif i == n - 2 and n < 15:
            o = min(o, 2)
        order[i] = o

        s_t, s0 = sig[i + 1], sig[i]
        a_t = alpha[i + 1]
        if s_t == 0.0:
            # h -> inf: sigma_t/sigma_s0 -> 0, -a_t(e^-h - 1) -> a_t = 1
            c_x[i], c_m0[i] = 0.0, 1.0
            continue
        h = lam[i + 1] - lam[i]
        phi = math.exp(-h) - 1.0
        c_x[i] = s_t / s0
        c_m0[i] = -a_t * phi
        if o >= 2:
            r0 = (lam[i] - lam[i - 1]) / h
            if solver_type == "midpoint":
                d1c = -0.5 * a_t * phi          # coefficient of D1
            else:                                # heun
                d1c = a_t * (phi / h + 1.0)
            if o == 2:
                c_m0[i] += d1c / r0
                c_m1[i] = -d1c / r0
            else:
                r1 = (lam[i - 1] - lam[i - 2]) / h
                d1c = a_t * (phi / h + 1.0)      # order 3 always uses this
                d2c = -a_t * ((phi + h) / (h * h) - 0.5)
                w = r0 / (r0 + r1)
                # D1 = (1+w) D1_0 - w D1_1; D2 = (D1_0 - D1_1)/(r0+r1)
                k10, k11 = (1.0 + w) / r0, w / r1
                k20 = 1.0 / ((r0 + r1) * r0)
                k21 = 1.0 / ((r0 + r1) * r1)
                c_m0[i] += d1c * k10 + d2c * k20
                c_m1[i] = d1c * (-k10 - k11) + d2c * (-k20 - k21)
                c_m2[i] = d1c * k11 + d2c * k21
    return FlowDPMSchedule(sigmas=sig, timesteps=timesteps, num_steps=n,
                           order=order, c_x=c_x, c_m0=c_m0, c_m1=c_m1,
                           c_m2=c_m2)


def dpm_pred_x0(sched: FlowDPMSchedule, i: int, v: jnp.ndarray,
                x: jnp.ndarray) -> jnp.ndarray:
    """x0 = x - sigma_i * v (convert_model_output :383-386)."""
    return x - jnp.float32(sched.sigmas[i]) * v


def dpm_update(sched: FlowDPMSchedule, i: int, x: jnp.ndarray,
               m0: jnp.ndarray, m1: Optional[jnp.ndarray] = None,
               m2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One DPM-Solver++ step at the schedule's effective order. m1/m2 are
    the previous converted outputs (newest first); pass None during warmup
    (their table coefficients are zero then anyway)."""
    out = jnp.float32(sched.c_x[i]) * x + jnp.float32(sched.c_m0[i]) * m0
    if m1 is not None and sched.c_m1[i] != 0.0:
        out = out + jnp.float32(sched.c_m1[i]) * m1
    if m2 is not None and sched.c_m2[i] != 0.0:
        out = out + jnp.float32(sched.c_m2[i]) * m2
    return out


def dpm_add_noise(sched: FlowDPMSchedule, i: int, x0: jnp.ndarray,
                  noise: jnp.ndarray) -> jnp.ndarray:
    """(1-sigma)*x0 + sigma*noise (add_noise :817-857)."""
    s = jnp.float32(sched.sigmas[i])
    return (1.0 - s) * x0 + s * noise
