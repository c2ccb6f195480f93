"""END-TO-END GUIDED drift vs the reference LONGCAT loop (round-1 VERDICT
item 4, LongCat half).

The reference's flow-match `fuse_latents`
(scheduling_flow_match_euler_discrete.py:1072-1233, strict-shape variant)
and its `VideoMotionChannelSelector` execute as oracle inside the full
pipeline state machine (pipeline_longcat_video.py:835-991): IRR resampling
at the same timestep, pixel fuse on the FULL latents with zeroed frame-0
velocity (scheduler :861-886), FLF channel replacement, re-noise from the
FUSED pred_x0, Euler update from the RAW velocity, and DSG extrapolation —
against our product `longcat_denoise_loop` with the exact fuse wiring of
`pipelines/longcat.py::generate_i2v`.

The stub VAE + determinism notes are shared with tests/test_guided_drift.py
(use_optical_flow=False -> bit-identical temporal-difference motion both
sides; the flow metric itself is parity-gated in test_flf_metric_parity.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.reference_oracle import import_longcat_scheduler
from tests.test_guided_drift import _StubVAE
from tests.test_latent_drift import _fake_v
from tests.test_longcat_drift import _ref_sigmas_pipeline
from worldforge_tpu.sampling.channel_select import apply_channel_replacement
from worldforge_tpu.sampling.engine import longcat_denoise_loop
from worldforge_tpu.sampling.flow_match import make_flow_match_schedule
from worldforge_tpu.sampling.guidance import (GuidanceConfig, flf_select,
                                              fuse_latents)
from worldforge_tpu.utils.torch_rng import TorchCompatibleRNG


def _run_reference(ref_mod, n_steps, shift, use_distill, resample_steps,
                   guide_steps, resample_round, omega, omega_resample,
                   x0_full, noise_seq, vae, video_pix, mask_pix, use_flf,
                   max_replace):
    """pipeline_longcat_video.py:835-991 against the reference scheduler,
    guided=True, with the scheduler's own fuse_latents + channel selector."""
    sig = _ref_sigmas_pipeline(n_steps, use_distill)
    s = ref_mod.FlowMatchEulerDiscreteScheduler(shift=shift)
    s.set_timesteps(n_steps, sigmas=list(np.asarray(sig)))
    s.derivative_history = []
    if use_flf:
        sel = ref_mod.VideoMotionChannelSelector(debug=False)
        sel.use_optical_flow = False   # deterministic temporal-diff path
        s._channel_selector = sel

    latents = torch.from_numpy(x0_full.copy())
    video_t = torch.from_numpy(video_pix.copy())
    mask_t = torch.from_numpy(mask_pix.copy())
    noise_iter = iter(noise_seq)
    timesteps = s.timesteps

    for i, t in enumerate(timesteps):
        s.derivative_history = []
        pred_x0 = None
        scheduler_output = None
        for r in range(resample_steps if i < resample_round else 1):
            if r > 0:
                s.set_resample_mode(True)
                s._step_index -= 1
            else:
                s.set_resample_mode(False)
            v = torch.from_numpy(-_fake_v(latents.numpy(), float(t)))
            scheduler_output = s.step(
                v[:, :, 1:], t, latents[:, :, 1:],
                video_ref=video_t, mask=mask_t,
                guided=i < guide_steps,        # pipeline :901
                resampling=r > 0,
                vae=vae,
                use_pca_channel_selection=use_flf,
                static=False,
                current_step=i, total_steps=len(timesteps),
                sample_full=latents,
                use_distill=use_distill,
                max_replace_threshold=max_replace,
                return_dict=True)
            if scheduler_output.pred_x0 is not None:
                pred_x0 = scheduler_output.pred_x0
            if i >= resample_round:
                break
            if r < resample_steps - 1 and pred_x0 is not None:
                noise = torch.from_numpy(next(noise_iter))
                ct = t.expand(pred_x0.shape[0])
                latents[:, :, 1:] = s.add_noise(pred_x0, noise, ct,
                                                use_resample_sigma=False)
        s.set_resample_mode(False)

        if i < resample_round and len(s.derivative_history) > 1:
            worse = s.derivative_history[0]
            good = s.derivative_history[-1]
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
            out = s.step(better, t, latents[:, :, 1:], guided=False,
                         resampling=False, vae=vae, sample_full=latents,
                         use_distill=use_distill, return_dict=True)
            latents[:, :, 1:] = out.prev_sample
        else:
            latents[:, :, 1:] = scheduler_output.prev_sample
    return latents.numpy()


def _run_ours(n_steps, shift, use_distill, resample_steps, guide_steps,
              resample_round, omega, omega_resample, x0_full, noise_seq,
              vae, video_pix, mask_pix, use_flf, max_replace):
    sched = make_flow_match_schedule(n_steps, shift=shift,
                                     use_distill=use_distill)
    noise_iter = iter(noise_seq)
    dec, enc = vae.jax_fns()
    video_ref = jnp.asarray(video_pix)
    mask = jnp.asarray(mask_pix)

    g = GuidanceConfig(guided=True, resample_steps=resample_steps,
                       guide_steps=guide_steps,
                       resample_round=resample_round, omega=omega,
                       omega_resample=omega_resample, use_flf=use_flf,
                       flf_backend="longcat", distill=use_distill,
                       max_replace=max_replace, use_optical_flow=False)

    def model_fn(lat, t_val, i, r):
        return jnp.asarray(-_fake_v(np.asarray(lat), float(t_val)))

    # the product fuse wiring, pipelines/longcat.py::generate_i2v
    def fuse_fn(x0_full_j, i, r):
        pre = x0_full_j
        x0f = fuse_latents(x0_full_j, video_ref, mask, dec, enc)
        if g.use_flf:
            sel = flf_select(pre, x0f, i, g)
            if sel:
                x0f = apply_channel_replacement(x0f, pre, sel)
        return x0f

    out = longcat_denoise_loop(model_fn, jnp.asarray(x0_full), sched, g,
                               noise_fn=lambda shape: next(noise_iter),
                               fuse_fn=fuse_fn)
    return np.asarray(out)


def _drive(shape, n_steps, shift, use_distill, resample_steps, guide_steps,
           resample_round, use_flf, max_replace=None, seed=7, tol=1e-4):
    rng = TorchCompatibleRNG(seed)
    x0 = rng.randn(*shape)
    nshape = (shape[0], shape[1], shape[2] - 1) + shape[3:]
    noise_seq = [rng.randn(*nshape) for _ in range(n_steps * resample_steps)]
    vae = _StubVAE(shape[1], seed=321)

    # LongCat fuse is the STRICT-shape variant (scheduler :1131-1153):
    # video/mask must equal the decoded shape exactly
    tgt = (shape[0], 3, shape[2], shape[3], shape[4])
    vr = np.random.default_rng(seed + 1)
    video_pix = vr.uniform(0, 1, tgt).astype(np.float32)
    mask_pix = (vr.uniform(0, 1, (shape[0], 1) + tgt[2:]) > 0.5
                ).astype(np.float32)

    ref_mod = import_longcat_scheduler()
    args = (n_steps, shift, use_distill, resample_steps, guide_steps,
            resample_round)
    ref = _run_reference(ref_mod, *args, 4.0, 1.0, x0, list(noise_seq),
                         vae, video_pix, mask_pix, use_flf, max_replace)
    ours = _run_ours(*args, 4.0, 1.0, x0, list(noise_seq),
                     vae, video_pix, mask_pix, use_flf, max_replace)
    assert ref.shape == ours.shape
    drift = np.abs(ref - ours).max()
    scale = np.abs(ref).max() + 1e-8
    assert drift / scale < tol, f"longcat guided drift {drift/scale:.2e}"


@pytest.mark.parametrize("resample_steps,guide_steps,resample_round", [
    (3, 4, 5),   # the reference default IRR depth (resample_steps=3)
    (2, 8, 8),   # fuse + DSG every step
    (1, 6, 0),   # fuse only, no IRR/DSG
])
def test_longcat_guided_fuse_drift(resample_steps, guide_steps,
                                   resample_round):
    _drive((1, 4, 4, 4, 4), 8, 1.0, False, resample_steps, guide_steps,
           resample_round, use_flf=False)


def test_longcat_guided_flf_drift():
    """FLF live via the reference's VideoMotionChannelSelector (16ch,
    temporal-diff path) against our flf_select longcat schedule."""
    _drive((1, 16, 4, 8, 8), 8, 1.0, False, 2, 6, 5, use_flf=True,
           max_replace=2)


def test_longcat_guided_distill_flf():
    """Distilled 16-step schedule (sigma table + FLF distill gating) with
    guided fusion — the fast WorldForge mode end-to-end."""
    _drive((1, 16, 3, 8, 8), 8, 1.0, True, 2, 6, 4, use_flf=True,
           max_replace=2)


def test_longcat_guided_realistic_shape():
    """Production latent shape (1,16,13,60,104) — FLF statistics and fuse
    at the real aspect ratio (VERDICT round-1 weak #6)."""
    _drive((1, 16, 13, 60, 104), 4, 1.0, False, 2, 4, 3, use_flf=True,
           max_replace=2, tol=1e-3)
