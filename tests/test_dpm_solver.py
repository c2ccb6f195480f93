"""Flow DPM-Solver++ parity vs the reference fm_solvers.py (torch CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.sampling.dpm import (FlowDPMSchedule, dpm_add_noise,
                                         dpm_pred_x0, dpm_update,
                                         get_sampling_sigmas,
                                         make_flow_dpm_schedule)

torch = pytest.importorskip("torch")
from tests.reference_oracle import import_fm_solvers  # noqa: E402


def _pseudo_model_np(x: np.ndarray, t: float, base: np.ndarray) -> np.ndarray:
    # deterministic stand-in velocity field, same math in torch and jax
    return (0.05 * x - 0.1 * base) * (1.0 + t / 2000.0)


def _run_reference(x0: np.ndarray, base: np.ndarray, num_steps: int,
                   shift: float, solver_order: int, explicit_sigmas: bool):
    m = import_fm_solvers()
    sch = m.FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000,
        shift=1.0 if explicit_sigmas else shift,
        use_dynamic_shifting=False, solver_order=solver_order)
    if explicit_sigmas:
        sch.set_timesteps(sigmas=m.get_sampling_sigmas(num_steps, shift))
    else:
        sch.set_timesteps(num_inference_steps=num_steps)
    x = torch.tensor(x0, dtype=torch.float32)
    b = torch.tensor(base, dtype=torch.float32)
    for t in sch.timesteps:
        v = (0.05 * x - 0.1 * b) * (1.0 + float(t) / 2000.0)
        x = sch.step(v, t, x).prev_sample
    return np.asarray(x), np.asarray(sch.timesteps)


def _run_ours(x0: np.ndarray, base: np.ndarray, num_steps: int, shift: float,
              solver_order: int, explicit_sigmas: bool):
    if explicit_sigmas:
        sched = make_flow_dpm_schedule(
            num_steps, shift=1.0, sigmas=get_sampling_sigmas(num_steps, shift),
            solver_order=solver_order)
    else:
        sched = make_flow_dpm_schedule(num_steps, shift=shift,
                                       solver_order=solver_order)
    x = jnp.asarray(x0, jnp.float32)
    b = jnp.asarray(base, jnp.float32)
    m1 = m2 = None
    for i in range(sched.num_steps):
        v = _pseudo_model_np(x, float(sched.timesteps[i]), b)
        m0 = dpm_pred_x0(sched, i, v, x)
        x = dpm_update(sched, i, x, m0, m1, m2)
        m2, m1 = m1, m0
    return np.asarray(x), sched


@pytest.mark.parametrize("num_steps,solver_order,explicit",
                         [(10, 2, True), (10, 2, False), (20, 3, False),
                          (6, 3, True)])
def test_dpm_matches_reference(rng, num_steps, solver_order, explicit):
    x0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    base = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    ref, ref_ts = _run_reference(x0, base, num_steps, 5.0, solver_order,
                                 explicit)
    ours, sched = _run_ours(x0, base, num_steps, 5.0, solver_order, explicit)
    np.testing.assert_array_equal(sched.timesteps.astype(np.int64), ref_ts)
    rel = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 1e-4, rel


def test_dpm_add_noise_matches_flow():
    sched = make_flow_dpm_schedule(8, shift=3.0)
    x0 = np.ones((2, 3), np.float32)
    noise = np.full((2, 3), 2.0, np.float32)
    got = np.asarray(dpm_add_noise(sched, 3, jnp.asarray(x0),
                                   jnp.asarray(noise)))
    s = sched.sigmas[3]
    np.testing.assert_allclose(got, (1 - s) * x0 + s * noise, rtol=1e-6)


def test_final_step_is_x0():
    sched = make_flow_dpm_schedule(5, shift=5.0)
    assert sched.order[-1] == 1
    assert sched.c_x[-1] == 0.0 and sched.c_m0[-1] == 1.0
    assert sched.sigmas[-1] == 0.0
