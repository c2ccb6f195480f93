"""Latent drift vs the REFERENCE LongCat flow-match scheduler: sigma
tables (standard + distill, with shift), Euler step, add_noise, pred_x0."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.reference_oracle import import_longcat_scheduler
from worldforge_tpu.sampling.flow_match import (fm_add_noise, fm_euler_step,
                                                fm_pred_x0, longcat_sigmas,
                                                make_flow_match_schedule)
from worldforge_tpu.utils.torch_rng import TorchCompatibleRNG


@pytest.fixture(scope="module")
def ref_mod():
    return import_longcat_scheduler()


def _ref_sigmas_pipeline(n, use_distill):
    """get_timesteps_sigmas (pipeline_longcat_video.py:316-331)."""
    if use_distill:
        idx = (torch.arange(1, 17, dtype=torch.float32) * (1000 // 16)
               ).round().long()
        inf = np.floor(np.linspace(0, 16, num=n, endpoint=False)).astype(
            np.int64)
        sig = torch.flip(idx, [0])[inf].float() / 1000
        sig = sig - sig[-1]
        return sig
    return torch.linspace(0.999, 0.000, n)


@pytest.mark.parametrize("use_distill,n", [(False, 50), (True, 16),
                                           (True, 8)])
def test_sigma_tables_match_reference(ref_mod, use_distill, n):
    ref_sig = _ref_sigmas_pipeline(n, use_distill)
    np.testing.assert_allclose(longcat_sigmas(n, use_distill=use_distill),
                               ref_sig.numpy(), atol=1e-7)
    # through set_timesteps with shift
    for shift in (1.0, 5.0):
        s = ref_mod.FlowMatchEulerDiscreteScheduler(shift=shift)
        s.set_timesteps(n, sigmas=list(ref_sig.numpy()))
        mine = make_flow_match_schedule(n, shift=shift,
                                        use_distill=use_distill)
        np.testing.assert_allclose(mine.sigmas, np.asarray(s.sigmas),
                                   atol=1e-6)
        np.testing.assert_allclose(mine.timesteps, np.asarray(s.timesteps),
                                   atol=1e-3)


def test_euler_trajectory_matches_reference(ref_mod):
    """Drive the reference scheduler step() across all steps with a fake
    velocity model; our pure functions must match."""
    n = 10
    rng = TorchCompatibleRNG(0)
    x0 = rng.randn(1, 4, 2, 4, 4)

    def fake_v(x, t):
        return np.tanh(0.2 * x) * (0.3 + t / 1000.0)

    s = ref_mod.FlowMatchEulerDiscreteScheduler(shift=2.0)
    s.set_timesteps(n, sigmas=list(longcat_sigmas(n)))
    lat_t = torch.from_numpy(x0.copy())
    mine = make_flow_match_schedule(n, shift=2.0)
    lat_j = jnp.asarray(x0)
    for i, t in enumerate(s.timesteps):
        v = fake_v(lat_t.numpy(), float(t))
        out = s.step(torch.from_numpy(v), t, lat_t, return_dict=True)
        # our side
        vj = jnp.asarray(fake_v(np.asarray(lat_j), float(mine.timesteps[i])))
        x0_j = fm_pred_x0(mine, i, vj, lat_j)
        np.testing.assert_allclose(np.asarray(x0_j), out.pred_x0.numpy(),
                                   atol=1e-5, rtol=1e-5)
        lat_t = out.prev_sample
        lat_j = fm_euler_step(mine, i, lat_j, vj)
        np.testing.assert_allclose(np.asarray(lat_j), lat_t.numpy(),
                                   atol=1e-5, rtol=1e-5)


def test_add_noise_matches_reference(ref_mod):
    n = 10
    rng = TorchCompatibleRNG(1)
    x0 = rng.randn(1, 4, 2, 4, 4)
    eps = rng.randn(1, 4, 2, 4, 4)
    s = ref_mod.FlowMatchEulerDiscreteScheduler(shift=2.0)
    s.set_timesteps(n, sigmas=list(longcat_sigmas(n)))
    mine = make_flow_match_schedule(n, shift=2.0)
    i = 3
    t = s.timesteps[i].unsqueeze(0)
    ref = s.add_noise(torch.from_numpy(x0), torch.from_numpy(eps), t)
    ours = fm_add_noise(mine, i, jnp.asarray(x0), jnp.asarray(eps))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)
