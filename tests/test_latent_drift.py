"""END-TO-END latent drift vs the REFERENCE scheduler (BASELINE.json gate:
<=1e-2 drift).

Drives the reference UniPCMultistepScheduler (torch, imported read-only from
/root/reference with its own step/add_noise/resample-mode methods) through
the exact pipeline state machine — IRR resampling, re-noise, DSG re-update —
with a shared deterministic fake velocity model and shared torch noise, and
requires our pure-functional wan_denoise_loop to land on the same latents.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.reference_oracle import import_wan_scheduler
from worldforge_tpu.sampling.engine import wan_denoise_loop
from worldforge_tpu.sampling.guidance import GuidanceConfig
from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule
from worldforge_tpu.utils.torch_rng import TorchCompatibleRNG

SHAPE = (1, 4, 3, 4, 4)


def _fake_v(x: np.ndarray, t: float) -> np.ndarray:
    """Deterministic nonlinear 'velocity model' shared by both drivers."""
    return np.tanh(0.3 * x) * (0.5 + t / 1000.0) + 0.05 * np.sin(x)


def _run_reference(sched_mod, n_steps, resample_steps, guide_steps,
                   resample_round, omega, omega_resample, x0_init,
                   noise_seq):
    """The reference pipeline loop (pipeline_wan_i2v_clean.py:560-712)
    executed against the reference scheduler object, guided=False."""
    s = sched_mod.UniPCMultistepScheduler(
        prediction_type="flow_prediction", use_flow_sigmas=True,
        flow_shift=5.0, solver_order=2)
    s.set_timesteps(n_steps)
    latents = torch.from_numpy(x0_init.copy())
    noise_iter = iter(noise_seq)

    for i, t in enumerate(s.timesteps):
        s.derivative_history = []
        pred_x0 = None
        scheduler_output = None
        for r in range(resample_steps):
            if r > 0:
                s.set_resample_mode(True)
                t_model = float(s.get_resample_timestep(i))
                s._step_index -= 1
                if s.lower_order_nums > 0 and \
                        s.last_lower_order_nums < s.config.solver_order:
                    s.lower_order_nums -= 1
                s.this_order = s.last_this_order
            else:
                s.set_resample_mode(False)
                t_model = float(t)
            v = torch.from_numpy(_fake_v(latents.numpy(), t_model))
            s.derivative_history.append(v)  # pipeline records r=0 under CFG
            scheduler_output = s.step(
                v, t, latents, resampling=r > 0, return_dict=True,
                current_step=i, resample_count=resample_steps,
                is_resample_round=i < resample_round)
            pred_x0 = scheduler_output.pred_x0
            if i >= resample_round:
                break
            if r < resample_steps - 1 and pred_x0 is not None:
                noise = torch.from_numpy(next(noise_iter))
                t_noise = s.get_resample_timestep(i).unsqueeze(0)
                latents = s.add_noise(pred_x0, noise, t_noise, r,
                                      use_resample_sigma=True)
        if len(s.derivative_history) > 1:
            good = s.derivative_history[-1]
            worse = s.derivative_history[0]
            dims = list(range(1, good.dim()))
            dot = torch.sum(good * worse, dim=dims, keepdim=True)
            ng = torch.sqrt(torch.sum(good ** 2, dim=dims, keepdim=True))
            nw = torch.sqrt(torch.sum(worse ** 2, dim=dims, keepdim=True))
            cos_t = torch.clamp(dot / (ng * nw + 1e-8), -1.0, 1.0)
            sin_t = torch.sin(torch.acos(cos_t))
            om = omega_resample if i >= guide_steps else omega
            better = good + om * sin_t * (good - (ng / (nw + 1e-8)) * cos_t
                                          * worse)
            s._step_index -= 1
            if s.lower_order_nums > 0 and \
                    s.last_lower_order_nums < s.config.solver_order:
                s.lower_order_nums -= 1
            conv = s.convert_model_output(better, sample=latents)
            s.last_sample = latents
            s.model_outputs[-1] = conv
            latents = s.multistep_uni_p_bh_update(
                model_output=better, sample=latents, order=s.this_order)
            s._step_index += 1
            if 0 <= s.lower_order_nums < s.config.solver_order:
                s.lower_order_nums += 1
        else:
            latents = scheduler_output.prev_sample
        s.set_resample_mode(False)
    return latents.numpy()


def _run_ours(n_steps, resample_steps, guide_steps, resample_round, omega,
              omega_resample, x0_init, noise_seq):
    sched = make_flow_unipc_schedule(n_steps, shift=5.0)
    noise_iter = iter(noise_seq)

    def model_fn(lat, t_model, i, r):
        return jnp.asarray(_fake_v(np.asarray(lat), float(t_model)))

    g = GuidanceConfig(guided=False, resample_steps=resample_steps,
                       guide_steps=guide_steps,
                       resample_round=resample_round, omega=omega,
                       omega_resample=omega_resample, use_flf=False)
    out = wan_denoise_loop(model_fn, jnp.asarray(x0_init), sched, g,
                           noise_fn=lambda shape: next(noise_iter),
                           record_r0=True)
    return np.asarray(out)


@pytest.mark.parametrize("resample_steps,guide_steps,resample_round", [
    (2, 4, 5),   # IRR + DSG active, omega switch mid-run
    (1, 3, 0),   # plain UniPC, no IRR/DSG
    (3, 8, 8),   # triple resample, DSG every step
])
def test_latent_drift_vs_reference(resample_steps, guide_steps,
                                   resample_round):
    n_steps = 8
    rng = TorchCompatibleRNG(42)
    x0 = rng.randn(*SHAPE)
    # enough noise draws for every (step, r) re-noise
    noise_seq = [rng.randn(*SHAPE) for _ in range(n_steps * resample_steps)]

    sched_mod = import_wan_scheduler()
    ref = _run_reference(sched_mod, n_steps, resample_steps, guide_steps,
                         resample_round, 4.0, 1.0, x0, list(noise_seq))
    ours = _run_ours(n_steps, resample_steps, guide_steps, resample_round,
                     4.0, 1.0, x0, list(noise_seq))

    assert ref.shape == ours.shape
    drift = np.abs(ref - ours).max()
    scale = np.abs(ref).max() + 1e-8
    assert drift / scale < 1e-4, f"latent drift {drift/scale:.2e}"
