"""END-TO-END GUIDED drift vs the reference (round-1 VERDICT item 4).

test_latent_drift.py gates the solver state machine with guided=False; here
the reference's own `fuse_latents` (scheduling_unipc_multistep_clean.py
:1248-1421) EXECUTES as the oracle — decode -> masked pixel blend ->
re-encode -> optional FLF channel replacement — inside the full
IRR + re-noise + DSG loop, against our `wan_denoise_loop` + `fuse_latents`
+ `flf_select` (the exact wiring of pipelines/wan_i2v.py:259-267).

The VAE is a deterministic linear+tanh stub implemented once in numpy and
wrapped for torch (reference duck-type: .config.latents_mean/std/z_dim,
.decode(z, return_dict=False), .encode(x).latent_dist.mode()) and for JAX
(vae_decode/vae_encode closures handling the per-channel normalization,
reference :1272-1281 and :1384-1385). This isolates the drift gate to the
fusion ORCHESTRATION; VAE numerics are gated separately by
tests/test_wan_vae.py.

FLF configs run with use_optical_flow=False so both sides take the
bit-identical temporal-difference motion path (reference :439-471 fallback
== channel_select._temporal_diff_motion); the flow METRIC itself is
parity-gated in test_flf_metric_parity.py and the Farneback flows in
test_farneback.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_wan_scheduler
from tests.test_latent_drift import _fake_v
from worldforge_tpu.sampling.channel_select import apply_channel_replacement
from worldforge_tpu.sampling.engine import wan_denoise_loop
from worldforge_tpu.sampling.guidance import (GuidanceConfig, flf_select,
                                              fuse_latents)
from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule
from worldforge_tpu.utils.torch_rng import TorchCompatibleRNG


# ------------------------------------------------------------- stub VAE


class _StubVAE:
    """Deterministic linear+tanh 'VAE' over the reference's duck-typed
    surface (fuse_latents uses .config.latents_mean/.latents_std/.z_dim,
    .decode(z, return_dict=False)[0], .encode(x).latent_dist.mode())."""

    def __init__(self, z_dim: int, seed: int = 123):
        r = np.random.default_rng(seed)
        self.M = r.standard_normal((3, z_dim)).astype(np.float32) * 0.5
        self.E = r.standard_normal((z_dim, 3)).astype(np.float32) * 0.5
        self.b = r.standard_normal((z_dim,)).astype(np.float32) * 0.1
        mean = r.standard_normal((z_dim,)).astype(np.float32) * 0.2
        std = r.uniform(0.6, 1.4, z_dim).astype(np.float32)

        class _Cfg:
            pass

        self.config = _Cfg()
        self.config.z_dim = z_dim
        self.config.latents_mean = mean.tolist()
        self.config.latents_std = std.tolist()
        self.dtype = torch.float32

    # torch side (the reference feeds DEnormalized latents into decode)
    def decode(self, z, return_dict=False):
        y = torch.einsum("cz,bzthw->bcthw", torch.from_numpy(self.M),
                         z.to(torch.float32))
        return (torch.tanh(y),)

    def encode(self, x):
        enc = torch.einsum("zc,bcthw->bzthw", torch.from_numpy(self.E),
                           x.to(torch.float32))
        enc = enc + torch.from_numpy(self.b)[None, :, None, None, None]
        outer = self

        class _Dist:
            def mode(self):
                return enc

        class _Out:
            latent_dist = _Dist()

        return _Out()

    # JAX side: closures INCLUDING the normalization round trip the
    # reference performs around its vae calls (:1272-1281, :1384-1385)
    def jax_fns(self):
        M, E, b = jnp.asarray(self.M), jnp.asarray(self.E), jnp.asarray(self.b)
        mean = jnp.asarray(self.config.latents_mean)[None, :, None, None, None]
        inv_std = (1.0 / jnp.asarray(self.config.latents_std)
                   )[None, :, None, None, None]

        def dec(z):
            # reference: pred / (1/std) + mean, cast fp32, decode
            zd = (z.astype(jnp.float32) / inv_std + mean)
            return jnp.tanh(jnp.einsum("cz,bzthw->bcthw", M, zd))

        def enc(x):
            e = jnp.einsum("zc,bcthw->bzthw", E, x.astype(jnp.float32))
            e = e + b[None, :, None, None, None]
            return (e - mean) * inv_std

        return dec, enc


# -------------------------------------------------------- reference loop


def _run_reference_guided(sched_mod, n_steps, resample_steps, guide_steps,
                          resample_round, omega, omega_resample, x0_init,
                          noise_seq, vae, video_pix, mask_pix, use_flf):
    """pipeline_wan_i2v_clean.py:562-712 with guided=True — the scheduler's
    own fuse_latents (and FLF selector) executes inside step()."""
    s = sched_mod.UniPCMultistepScheduler(
        prediction_type="flow_prediction", use_flow_sigmas=True,
        flow_shift=5.0, solver_order=2)
    s.set_timesteps(n_steps)
    latents = torch.from_numpy(x0_init.copy())
    video_t = torch.from_numpy(video_pix.copy())
    mask_t = torch.from_numpy(mask_pix.copy())
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
                mask=mask_t,
                guided=i < guide_steps,       # pipeline :624
                video_latents=video_t,
                vae=vae,
                current_step=i, resample_count=resample_steps,
                is_resample_round=i < resample_round,
                use_pca_channel_selection=use_flf,
                use_optical_flow=False,
                static=False)
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


# --------------------------------------------------------------- our loop


def _run_ours_guided(n_steps, resample_steps, guide_steps, resample_round,
                     omega, omega_resample, x0_init, noise_seq, vae,
                     video_pix, mask_pix, use_flf):
    sched = make_flow_unipc_schedule(n_steps, shift=5.0)
    noise_iter = iter(noise_seq)
    dec, enc = vae.jax_fns()
    video_ref = jnp.asarray(video_pix)
    mask = jnp.asarray(mask_pix)

    g = GuidanceConfig(guided=True, resample_steps=resample_steps,
                       guide_steps=guide_steps,
                       resample_round=resample_round, omega=omega,
                       omega_resample=omega_resample, use_flf=use_flf,
                       flf_backend="wan", use_optical_flow=False)

    def model_fn(lat, t_model, i, r):
        return jnp.asarray(_fake_v(np.asarray(lat), float(t_model)))

    # the product fuse wiring, pipelines/wan_i2v.py:259-267
    def fuse_fn(x0, i, r):
        pre = x0
        x0 = fuse_latents(x0, video_ref, mask, dec, enc)
        if g.use_flf and r == 0:
            sel = flf_select(pre, x0, i, g)
            if sel:
                x0 = apply_channel_replacement(x0, pre, sel)
        return x0

    out = wan_denoise_loop(model_fn, jnp.asarray(x0_init), sched, g,
                           noise_fn=lambda shape: next(noise_iter),
                           fuse_fn=fuse_fn, record_r0=True)
    return np.asarray(out)


# ------------------------------------------------------------------ tests


def _drive(shape, n_steps, resample_steps, guide_steps, resample_round,
           use_flf, video_shape=None, mask_shape=None, seed=42, tol=1e-4):
    rng = TorchCompatibleRNG(seed)
    x0 = rng.randn(*shape)
    noise_seq = [rng.randn(*shape) for _ in range(n_steps * resample_steps)]
    vae = _StubVAE(shape[1])

    # pixel target = stub decode output shape [B,3,T,H,W]
    tgt = (shape[0], 3, shape[2], shape[3], shape[4])
    vs = video_shape or tgt
    ms = mask_shape or (shape[0], 1, shape[2], shape[3], shape[4])
    vr = np.random.default_rng(seed + 1)
    video_pix = vr.uniform(0, 1, vs).astype(np.float32)
    # block-constant binary mask: robust to nearest-neighbor convention
    mask_pix = (vr.uniform(0, 1, ms) > 0.5).astype(np.float32)

    sched_mod = import_wan_scheduler()
    ref = _run_reference_guided(sched_mod, n_steps, resample_steps,
                                guide_steps, resample_round, 4.0, 1.0, x0,
                                list(noise_seq), vae, video_pix, mask_pix,
                                use_flf)
    ours = _run_ours_guided(n_steps, resample_steps, guide_steps,
                            resample_round, 4.0, 1.0, x0, list(noise_seq),
                            vae, video_pix, mask_pix, use_flf)
    assert ref.shape == ours.shape
    drift = np.abs(ref - ours).max()
    scale = np.abs(ref).max() + 1e-8
    assert drift / scale < tol, f"guided drift {drift/scale:.2e}"


@pytest.mark.parametrize("resample_steps,guide_steps,resample_round", [
    (2, 4, 5),   # IRR + fuse + DSG active
    (1, 8, 0),   # fuse every step, no IRR/DSG
    (3, 8, 8),   # triple resample: fuse also under resampling
])
def test_guided_fuse_drift(resample_steps, guide_steps, resample_round):
    _drive((1, 4, 3, 4, 4), 8, resample_steps, guide_steps, resample_round,
           use_flf=False)


def test_guided_fuse_resize_paths():
    """video/mask at half SPATIAL resolution -> the fuse interpolation
    alignment (reference :1316-1324 bilinear / :1355-1362 nearest vs our
    jax.image.resize) must agree; factor-2 upsampling keeps the
    nearest/bilinear conventions identical between torch and XLA.

    Note the reference's TEMPORAL branch (:1326-1334, :1364-1371) is dead
    code on current torch: it reshapes to a 4-D tensor then calls
    F.interpolate with a 3-element size, which raises ValueError — frame
    counts must already match in practice. Our trilinear resize handles the
    frame-mismatch case instead (documented deviation, COMPONENTS.md)."""
    _drive((1, 4, 4, 8, 8), 6, 2, 4, 4, use_flf=False,
           video_shape=(1, 3, 4, 4, 4), mask_shape=(1, 1, 4, 4, 4))


def test_guided_fuse_flf_drift():
    """FLF channel selection live in the loop: the reference's
    VideoMotionPCASelector (temporal-difference path) selects channels from
    the fused/encoded latents and replaces them with the generated pred_x0
    (:1393-1412); our flf_select + apply_channel_replacement must land on
    the same latents. 16 channels (the Wan z_dim the schedule expects)."""
    _drive((1, 16, 4, 8, 8), 8, 2, 6, 5, use_flf=True)


def test_bf16_vae_fuse_drift():
    """Gate for the 16 GB guided-serving deviation: the flagship e2e recipe
    (scripts/run_e2e_guided.py, docs/SERVING.md) runs the VAE in bf16
    because the fp32 streaming decode cannot coexist with the resident
    14B DiT (measured RESOURCE_EXHAUSTED) — the reference runs its VAE
    fp32 (infer_worldforge.py:179-197). One fuse_latents round-trip through
    the REAL (tiny-config) Wan VAE with bf16-cast params — bf16 COMPUTE,
    the VAE entry casts activations to the param dtype — must stay within
    3.5% of the fp32 fuse (measured 2.2%; the guided loop re-anchors to
    the reference video each step, so per-step noise does not accumulate —
    same damping measured for int8 in tests/test_int8_quality.py)."""
    from worldforge_tpu.models.wan.vae import (WanVAEConfig, init_wan_vae,
                                               vae_decode, vae_encode)
    cfg = WanVAEConfig.tiny()
    p32 = init_wan_vae(jax.random.key(0), cfg, dtype=jnp.float32)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, p32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, cfg.z_dim, 5, 8, 8)),
                     jnp.float32)
    ref = jnp.asarray(rng.uniform(0, 1, (1, 3, 17, 64, 64)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (1, 1, 17, 64, 64)) > 0.5,
                       jnp.float32)
    f32 = fuse_latents(x0, ref, mask,
                       lambda z: vae_decode(p32, cfg, z),
                       lambda v: vae_encode(p32, cfg, v))
    f16 = fuse_latents(x0, ref, mask,
                       lambda z: vae_decode(p16, cfg, z),
                       lambda v: vae_encode(p16, cfg, v))
    f32, f16 = np.asarray(f32), np.asarray(f16)
    drift = np.abs(f32 - f16).max() / (np.abs(f32).max() + 1e-8)
    assert 0.0 < drift < 0.035, f"bf16 VAE fuse drift {drift:.4f}"


def test_guided_fuse_realistic_shape():
    """VERDICT round-1 weak #6: the drift gate at the PRODUCTION latent
    shape (1,16,13,60,104) — shape-dependent behaviors (FLF statistics over
    60x104 maps, fuse at real aspect) rather than toy 4x4."""
    _drive((1, 16, 13, 60, 104), 4, 2, 4, 3, use_flf=True, tol=1e-3)
