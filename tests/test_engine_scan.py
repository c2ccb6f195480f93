"""Scan-fused denoise engine == Python-loop engine (exact), and the
device-side FLF selection == host schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldforge_tpu.sampling.channel_select import (select_channels_wan,
                                                    select_mask_wan_device)
from worldforge_tpu.sampling.engine import wan_denoise_loop, wan_denoise_scan
from worldforge_tpu.sampling.guidance import GuidanceConfig
from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule

SHAPE = (1, 4, 2, 4, 4)


def _model_fn_loop(lat, t, i, r):
    return jnp.tanh(0.3 * lat) * (0.5 + t / 1000.0)


def _model_fn_scan(lat, t):
    return jnp.tanh(0.3 * lat) * (0.5 + t / 1000.0)


@pytest.mark.parametrize("rs,guide,rround", [
    (2, 4, 5), (1, 3, 0), (3, 8, 8), (2, 8, 4),
])
def test_scan_matches_loop(rs, guide, rround):
    n = 8
    sched = make_flow_unipc_schedule(n, shift=5.0)
    g = GuidanceConfig(guided=True, resample_steps=rs, guide_steps=guide,
                       resample_round=rround, omega=4.0, omega_resample=1.0,
                       use_flf=False)
    x0 = jax.random.normal(jax.random.key(0), SHAPE, jnp.float32)

    def fuse_loop(x, i, r):
        return 0.9 * x + 0.1 * jnp.sin(x)

    def fuse_scan(x, step):
        return 0.9 * x + 0.1 * jnp.sin(x)

    out_loop = wan_denoise_loop(_model_fn_loop, x0, sched, g,
                                key=jax.random.key(7), fuse_fn=fuse_loop,
                                record_r0=True)
    out_scan = wan_denoise_scan(_model_fn_scan, x0, sched, g,
                                key=jax.random.key(7), fuse_fn=fuse_scan,
                                record_r0=True)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               atol=1e-5, rtol=1e-5)


def test_scan_jits_whole_program():
    n = 6
    sched = make_flow_unipc_schedule(n, shift=5.0)
    g = GuidanceConfig(guided=False, resample_steps=2, guide_steps=4,
                       resample_round=4, use_flf=False)
    x0 = jax.random.normal(jax.random.key(1), SHAPE, jnp.float32)
    f = jax.jit(lambda x, k: wan_denoise_scan(_model_fn_scan, x, sched, g,
                                              key=k))
    out = f(x0, jax.random.key(2))
    assert np.isfinite(np.asarray(out)).all()
    # same key -> deterministic
    out2 = f(x0, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("step", [0, 1, 4, 8, 15, 30])
def test_device_flf_selection_matches_host(rng, step):
    scores = rng.uniform(0, 1, 16).astype(np.float32)
    host = select_channels_wan(scores, step)
    dev = np.asarray(select_mask_wan_device(jnp.asarray(scores),
                                            jnp.float32(step)))
    assert sorted(np.nonzero(dev)[0].tolist()) == host


def test_device_flf_selection_outlier_case():
    scores = np.concatenate([np.zeros(10), np.ones(6)]).astype(np.float32)
    host = select_channels_wan(scores, 20)
    dev = np.asarray(select_mask_wan_device(jnp.asarray(scores),
                                            jnp.float32(20)))
    assert len(np.nonzero(dev)[0]) == len(host) == 6


def test_longcat_unguided_default_is_single_pass():
    """Regression: guided=True (the config default) with NO fuse_fn must be
    a plain single-pass denoise — no IRR resampling, no DSG on
    self-predictions (the reference pairs `guided` with a video reference;
    pipeline_longcat_video.py:844)."""
    from worldforge_tpu.sampling.engine import longcat_denoise_loop
    from worldforge_tpu.sampling.flow_match import make_flow_match_schedule

    sched = make_flow_match_schedule(6, shift=5.0)
    g = GuidanceConfig(guided=True, resample_steps=3, guide_steps=4,
                       resample_round=6, omega=4.0, use_flf=False)
    calls = []

    def model_fn(lat, t, i, r):
        calls.append((i, r))
        return jnp.tanh(0.1 * lat)

    x0 = jax.random.normal(jax.random.key(1), (1, 4, 3, 4, 4), jnp.float32)
    longcat_denoise_loop(model_fn, x0, sched, g,
                         key=jax.random.key(2), fuse_fn=None)
    assert calls == [(i, 0) for i in range(6)], calls


def test_chunk_plan_cost_weighting():
    """wan_scan_chunks: exec_chunk is in PLAIN-step equivalents — guided
    segments (rs model calls + rs fuses/step ~= 3x a plain step) and
    IRR-only segments (2x) get proportionally fewer steps per chunk, so
    one setting keeps every execution under the runtime watchdog
    (docs/COMPONENTS.md deviation 9). Production flagship shape: 50 steps,
    guide 15, resample_round 20, rs=2, exec_chunk 4."""
    from worldforge_tpu.sampling.engine import wan_scan_chunks

    sched = make_flow_unipc_schedule(50, 5.0)
    g = GuidanceConfig(guided=True, guide_steps=15, resample_steps=2,
                       resample_round=20)
    plan = wan_scan_chunks(sched, g, fuse_on=True, exec_chunk=4)
    sizes = [(sf, si, len(xs[0])) for sf, si, xs in plan]
    # guided segment (0,15): weight 3 -> chunks of 1
    assert sizes[:15] == [(True, True, 1)] * 15
    # IRR-only segment (15,20): weight 2 -> chunks of 2
    assert sizes[15:18] == [(False, True, 2), (False, True, 2),
                            (False, True, 1)]
    # plain segment (20,50): chunks of 4
    assert sizes[18:] == [(False, False, 4)] * 7 + [(False, False, 2)]
    # every step appears exactly once, in order
    steps = np.concatenate([xs[-1] for _, _, xs in plan])
    np.testing.assert_array_equal(steps, np.arange(50, dtype=np.float32))


def test_longcat_chunk_plan_cost_weighting():
    """longcat_scan_chunks under the production distilled guided config
    (16 steps, guide 15, rs=2, exec_chunk 6): guided chunks of 2, plain
    tail of 1."""
    from worldforge_tpu.sampling.engine import longcat_scan_chunks
    from worldforge_tpu.sampling.flow_match import make_flow_match_schedule

    sched = make_flow_match_schedule(16, shift=1.0, use_distill=True)
    g = GuidanceConfig(guided=True, guide_steps=15, resample_steps=2,
                       resample_round=20, flf_backend="longcat")
    plan = longcat_scan_chunks(sched, g, fuse_on=True, exec_chunk=6)
    sizes = [(sf, len(xs[0])) for sf, _, xs in plan]
    assert sizes == [(True, 2)] * 7 + [(True, 1), (False, 1)]
    steps = np.concatenate([xs[-1] for _, _, xs in plan])
    np.testing.assert_array_equal(steps, np.arange(16, dtype=np.float32))
