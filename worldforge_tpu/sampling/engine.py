"""The WorldForge denoise engine: one UniPC + IRR/FLF/DSG loop shared by the
Wan pipelines (SURVEY.md §7 unification: one guidance engine parameterized
by backend).

State machine semantics transcribed from the reference
(pipeline_wan_i2v_clean.py:560-712 + scheduling_unipc_multistep_clean.py
step/add_noise); see pipelines/wan_i2v.py for the line-by-line citations.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from worldforge_tpu.sampling.guidance import GuidanceConfig
from worldforge_tpu.sampling.unipc import (FlowUniPCSchedule, add_noise,
                                           dsg_extrapolate, flow_pred_x0,
                                           unip_update)


def wan_denoise_loop(
    model_fn: Callable[[jnp.ndarray, float, int, int], jnp.ndarray],
    latents: jnp.ndarray,
    sched: FlowUniPCSchedule,
    guidance: GuidanceConfig,
    *,
    key=None,
    noise_fn: Optional[Callable] = None,
    fuse_fn: Optional[Callable] = None,
    callback: Optional[Callable] = None,
    record_r0: bool = True,
) -> jnp.ndarray:
    """Run the full denoise loop.

    model_fn(latents, t_model, i, r) -> velocity (CFG already applied).
    fuse_fn(x0, i, r) -> fused x0 (guided pixel fusion + FLF); None = off.
    noise_fn(shape) -> IRR re-noise override (torch-compatible RNG).
    record_r0: whether the r=0 prediction joins the DSG history — the
    reference records it only under CFG (pipeline :612-616), so DSG without
    CFG needs resample_steps >= 3.
    """
    m0 = m1 = None
    guided_on = fuse_fn is not None

    for i in range(sched.num_steps):
        order = sched.order_for_step(i, min(i, 2))
        t_main = float(sched.timesteps[i])
        t_res = float(sched.resample_timesteps[i])

        deriv_history: List[jnp.ndarray] = []
        prev_sample = None
        n_resample = (guidance.resample_steps
                      if i < guidance.resample_round else 1)

        for r in range(n_resample):
            t_model = t_main if r == 0 else t_res
            v = model_fn(latents, t_model, i, r)
            if r > 0 or record_r0:
                deriv_history.append(v)

            x0 = flow_pred_x0(sched, i, v, latents)
            if guided_on and i < guidance.guide_steps:
                x0 = fuse_fn(x0, i, r)

            if r == 0:
                m1 = m0
            m0 = x0
            # reference quirk: in resample mode the next-sigma index clamps
            # to the resample table (uni_p :1005-1012), so at the FINAL step
            # sigma_t == sigma_s0 and the update is the identity
            is_final = i == sched.num_steps - 1
            if r > 0 and is_final:
                prev_sample = latents
            else:
                prev_sample = unip_update(sched, i, order, latents, m0,
                                          m1 if order >= 2 else None)

            if i < guidance.resample_round and r < n_resample - 1:
                if noise_fn is not None:
                    noise = jnp.asarray(noise_fn(x0.shape), x0.dtype)
                else:
                    key, k_n = jax.random.split(key)
                    noise = jax.random.normal(k_n, x0.shape, x0.dtype)
                latents = add_noise(sched, i, x0, noise)

        if len(deriv_history) > 1:
            omega = (guidance.omega if i < guidance.guide_steps
                     else guidance.omega_resample)
            better = dsg_extrapolate(deriv_history[-1], deriv_history[0],
                                     omega)
            m0 = flow_pred_x0(sched, i, better, latents)
            if n_resample > 1 and i == sched.num_steps - 1:
                pass  # resample-mode final-step identity (see above)
            else:
                latents = unip_update(sched, i, order, latents, m0,
                                      m1 if order >= 2 else None)
        else:
            latents = prev_sample

        if callback is not None:
            callback(i, latents)
    return latents


def longcat_denoise_loop(
    model_fn: Callable,
    latents: jnp.ndarray,
    sched,
    guidance: GuidanceConfig,
    *,
    key=None,
    noise_fn: Optional[Callable] = None,
    fuse_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """LongCat i2v denoise python loop (flow-match Euler + IRR/DSG on the
    noise frames, cond frame in slot 0) — the host-loop twin of
    longcat_denoise_scan, usable with noise_fn/callback-style injection.

    model_fn(latents_full, t_scalar, i, r) -> NEGATED velocity for the full
    latents (CFG-zero already applied). fuse_fn(x0_full, i, r) -> fused
    full-latent x0 (invoked only at r == 0 while i < guide_steps, matching
    the reference's guided/resampling gating). noise_fn(shape) overrides
    the IRR re-noise draw (torch-compatible RNG injection for the drift
    harness). Semantics: pipeline_longcat_video.py:835-991 +
    scheduling_flow_match_euler_discrete.py:740-906 (fusion feeds pred_x0
    -> the IRR re-noise only; the Euler update itself integrates the raw
    velocity)."""
    from worldforge_tpu.sampling.flow_match import (fm_add_noise,
                                                    fm_euler_step,
                                                    fm_pred_x0)

    # In the reference, `guided` implies a warped video reference is wired in
    # (pipeline_longcat_video.py:844 gates the IRR loop on self.guided, and
    # guided runs always carry video_latents). Here that pairing is explicit:
    # without a fuse_fn the call is a plain single-pass denoise, so IRR
    # resampling and DSG must not fire on self-predictions.
    guided_on = guidance.guided and fuse_fn is not None

    for i in range(sched.num_steps):
        t_val = float(sched.timesteps[i])
        deriv_history: List[jnp.ndarray] = []
        prev_noise = None
        n_resample = (guidance.resample_steps
                      if (guided_on and i < guidance.resample_round)
                      else 1)

        for r in range(n_resample):
            v = model_fn(latents, t_val, i, r)
            v_noise = v[:, :, 1:]
            # the reference records the SLICED noise-frame output (step()
            # is called with noise_pred[:, :, 1:], pipeline :896) — DSG
            # cosine/norm statistics must exclude the cond frame
            deriv_history.append(v_noise)
            x_noise = latents[:, :, 1:]
            x0 = fm_pred_x0(sched, i, v_noise, x_noise)
            if guided_on and i < guidance.guide_steps and r == 0:
                # fuse on FULL latents with zeroed frame-0 output
                # (scheduling_flow_match :861-886)
                v_full = jnp.concatenate(
                    [jnp.zeros_like(v[:, :, :1]), v_noise], axis=2)
                x0_full = fm_pred_x0(sched, i, v_full, latents)
                x0 = fuse_fn(x0_full, i, r)[:, :, 1:]

            prev_noise = fm_euler_step(sched, i, x_noise, v_noise)

            if i < guidance.resample_round and r < n_resample - 1:
                if noise_fn is not None:
                    noise = jnp.asarray(noise_fn(x0.shape), x0.dtype)
                else:
                    key, k_r = jax.random.split(key)
                    noise = jax.random.normal(k_r, x0.shape, x0.dtype)
                latents = latents.at[:, :, 1:].set(
                    fm_add_noise(sched, i, x0, noise))

        if (guided_on and i < guidance.resample_round
                and len(deriv_history) > 1):
            omega = (guidance.omega if i < guidance.guide_steps
                     else guidance.omega_resample)
            better = dsg_extrapolate(deriv_history[-1], deriv_history[0],
                                     omega)
            latents = latents.at[:, :, 1:].set(
                fm_euler_step(sched, i, latents[:, :, 1:], better))
        else:
            latents = latents.at[:, :, 1:].set(prev_noise)
    return latents


# -------------------------------------------------------------- scan-fused


def _order_coeffs(sched: FlowUniPCSchedule):
    """Per-step UniP coefficients with the order schedule baked in
    (order_i = min(2, N-i, i+1)); cm1 is 0 where order==1 so the axpy can
    always take (x, m0, m1)."""
    import numpy as np

    n = sched.num_steps
    cx = np.asarray(sched.c_x, np.float32)
    cm0 = np.empty(n, np.float32)
    cm1 = np.empty(n, np.float32)
    for i in range(n):
        order = min(2, n - i, i + 1)
        if order >= 2:
            cm0[i] = sched.c_m0_o2[i]
            cm1[i] = sched.c_m1_o2[i]
        else:
            cm0[i] = sched.c_m0_o1[i]
            cm1[i] = 0.0
    return cx, cm0, cm1


def _wan_tables(sched: FlowUniPCSchedule, guidance: GuidanceConfig,
                fuse_on: bool):
    """Segment bounds + per-step xs tables shared by the one-program scan
    (wan_denoise_scan) and the chunked-execution plan (wan_scan_chunks).
    xs order: (t, t_resample, c_x, c_m0, c_m1, sigma, omega, final, step).
    The UniPC order coefficients are baked per step (order = min(2, n-i,
    i+1)), so slicing the tables preserves multistep semantics; the m0/m1
    history crosses chunk boundaries via the carry."""
    import numpy as np

    n = sched.num_steps
    r_round = min(guidance.resample_round, n)
    g_steps = min(guidance.guide_steps, n)

    cx, cm0, cm1 = _order_coeffs(sched)
    ts = np.asarray(sched.timesteps, np.float32)
    trs = np.asarray(sched.resample_timesteps, np.float32)
    sig = np.asarray(sched.sigmas[:-1], np.float32)
    omegas = np.where(np.arange(n) < g_steps, guidance.omega,
                      guidance.omega_resample).astype(np.float32)
    finals = (np.arange(n) == n - 1).astype(np.float32)
    steps = np.arange(n, dtype=np.float32)

    bounds = sorted({0, g_steps if fuse_on else 0, r_round, n})
    segments = [(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    tables = (ts, trs, cx, cm0, cm1, sig, omegas, finals, steps)
    return segments, tables, g_steps, r_round


# ----------------------------------------------------- exec-chunk auto-sizing
#
# The environment kills any single device execution over ~65-72 s
# (scripts/probe_long_execution.py, model-free repro; docs/COMPONENTS.md
# deviation 9). Chunk plans were hand-tuned per config in round 4 (4 for
# Wan-480p, 6 for LongCat-480p) — new configs could trip the watchdog by
# mis-tuning (VERDICT r4 item 8). The sizing below derives the plan from
# MEASURED per-config step costs (docs/PERF.md) with a safety factor,
# power-law-interpolated in token count for unmeasured shapes.

WATCHDOG_SECONDS = 65.0   # lower edge of the measured 65-72 s fault window

# (tokens -> seconds per PLAIN scan step) measured on one v5e at serving
# quant (docs/PERF.md): "wan" steps are CFG pairs (2 forwards), "longcat"
# distilled steps are single forwards, "longcat-bsa" is the 0.875-sparse
# refine step.
STEP_COST_ANCHORS = {
    "wan": ((20280, 10.5), (46800, 37.3)),       # 480p r3/r4; 720p r4
    "longcat": ((20280, 6.4),),                  # 103 s / 16 distilled steps
    "longcat-bsa": ((56320, 15.0),),             # 720p refine median step
}

# (pixels-per-frame -> seconds per VAE fuse round trip, 49-frame clips):
# 480p dec 3.3 + enc 2.1 ≈ 5.1 s; 720p dec 23.9 steady + enc ≈ 6 s scaled.
FUSE_COST_ANCHORS = ((399360, 5.1), (921600, 30.0))

# exponent of the wan anchor pair: cost ∝ tokens^1.51 (attention makes the
# scaling superlinear); reused for single-anchor families
import math as _math
_COST_EXPONENT = (_math.log(37.3 / 10.5) / _math.log(46800 / 20280))


def _interp_cost(anchors, x: float) -> float:
    """Power-law (log-log) interpolation through measured anchors;
    single-anchor families extrapolate with the wan-pair exponent."""
    if len(anchors) == 1:
        x0, c0 = anchors[0]
        return c0 * (x / x0) ** _COST_EXPONENT
    pts = sorted(anchors)
    # clamp to the nearest segment for extrapolation
    for (x0, c0), (x1, c1) in zip(pts[:-1], pts[1:]):
        if x <= x1 or (x0, c0) == pts[-2]:
            exp = _math.log(c1 / c0) / _math.log(x1 / x0)
            return c0 * (x / x0) ** exp
    raise AssertionError  # pragma: no cover


import dataclasses as _dc


@_dc.dataclass(frozen=True)
class ExecChunkPlan:
    exec_chunk: int        # plain-step-equivalents per execution
    fuse_cost: float       # fuse/plain cost ratio (feeds _seg_chunk_steps)
    plain_step_s: float    # estimated seconds per plain step
    fuse_s: float          # estimated seconds per fuse round trip
    max_chunk_s: float     # estimated wall of the most expensive chunk
    fits_watchdog: bool    # False -> even k=1 trips the limit: use the
    #                        per-phase dispatch loop mode instead


def auto_exec_chunk(model: str, tokens: int, *, fuse_pixels: int = 0,
                    guidance: Optional[GuidanceConfig] = None,
                    watchdog_s: float = WATCHDOG_SECONDS,
                    safety: float = 0.8) -> ExecChunkPlan:
    """Derive the chunked-execution plan size from the measured cost
    tables. ``tokens`` = DiT sequence length; ``fuse_pixels`` = H*W of the
    pixel-space fuse (0 = unguided / no in-loop VAE). The returned
    exec_chunk keeps every estimated chunk execution under
    safety * watchdog_s; ``fits_watchdog`` is False when even a single
    guided step exceeds the watchdog (e.g. Wan 720p guided: one IRR step =
    2 CFG forwards + 2 fuses ≈ 135 s) — those configs must serve through
    the per-phase dispatch loop, whose individual programs stay small."""
    plain = _interp_cost(STEP_COST_ANCHORS[model], float(tokens))
    fuse = (_interp_cost(FUSE_COST_ANCHORS, float(fuse_pixels))
            if fuse_pixels else 0.0)
    budget = safety * watchdog_s
    k = (max(1, int(budget / plain)) if _math.isfinite(budget)
         else 10 ** 9)  # watchdog-free runtime: one big chunk
    fuse_ratio = (fuse / plain) if fuse_pixels else 0.5

    g = guidance or GuidanceConfig()
    worst = k * plain    # plain segment
    if fuse_pixels and g.guided:
        for seg_fuse, seg_irr in ((True, True), (True, False),
                                  (False, True)):
            rs = g.resample_steps if seg_irr else 1
            weight = rs * (1.0 + (fuse_ratio if seg_fuse else 0.0))
            k_seg = max(1, int(k / weight))
            per_step = rs * (plain + (fuse if seg_fuse else 0.0))
            worst = max(worst, k_seg * per_step)
    return ExecChunkPlan(exec_chunk=k, fuse_cost=fuse_ratio,
                         plain_step_s=plain, fuse_s=fuse,
                         max_chunk_s=worst,
                         fits_watchdog=worst <= watchdog_s)


def _seg_chunk_steps(exec_chunk: int, guidance: GuidanceConfig,
                     seg_fuse: bool, seg_irr: bool,
                     fuse_cost: float = 0.5) -> int:
    """Cost-weighted steps-per-chunk for one segment. exec_chunk is
    calibrated by the caller in PLAIN-step equivalents (one model call
    per step): a guided/IRR step costs rs model calls plus rs VAE fuse
    round-trips (a fuse ≈ half a model call at production scale — 5.0 s
    vs 10.45 s measured, docs/PERF.md round 3), so a uniform steps-per-
    chunk split would blow the ~65-75 s single-execution watchdog
    (docs/COMPONENTS.md deviation 9) inside guided segments."""
    rs = guidance.resample_steps if seg_irr else 1
    weight = rs * (1.0 + (fuse_cost if seg_fuse else 0.0))
    return max(1, int(exec_chunk / weight))


def wan_scan_chunks(sched: FlowUniPCSchedule, guidance: GuidanceConfig,
                    fuse_on: bool, exec_chunk: int,
                    fuse_cost: float = 0.5):
    """Chunked-execution plan for the Wan denoise loop — the longcat
    analog's twin (see longcat_scan_chunks): same segment structure as
    wan_denoise_scan, sub-split so no chunk's estimated execution time
    exceeds exec_chunk plain steps (guided segments get proportionally
    fewer steps per chunk — _seg_chunk_steps). Returns
    [(seg_fuse, seg_irr, xs_numpy_tuple), ...]."""
    segments, tables, g_steps, r_round = _wan_tables(sched, guidance,
                                                     fuse_on)
    plan = []
    for a, b in segments:
        seg_fuse = fuse_on and a < g_steps
        seg_irr = a < r_round
        k = _seg_chunk_steps(exec_chunk, guidance, seg_fuse, seg_irr,
                             fuse_cost=fuse_cost)
        for c in range(a, b, k):
            d = min(c + k, b)
            plan.append((seg_fuse, seg_irr,
                         tuple(t[c:d] for t in tables)))
    return plan


def make_wan_body(model_fn: Callable, fuse_fn: Optional[Callable],
                  flf_fn: Optional[Callable], guidance: GuidanceConfig,
                  record_r0: bool, seg_fuse: bool, seg_irr: bool):
    """Per-step scan body for the Wan UniPC + IRR/FLF/DSG loop. Carry:
    (latents, m0, m1, key). xs: the _wan_tables order. Matches
    wan_denoise_loop numerically (same coefficients, same state machine,
    including the resample-mode final-step identity quirk)."""
    rs = guidance.resample_steps
    dsg_on = seg_irr and (rs >= 2 if record_r0 else rs >= 3)

    def body(carry, xs):
        lat, m0, m1, k = carry
        t_i, tr_i, cxi, c0i, c1i, s_i, om_i, fin_i, step_i = xs

        v0 = model_fn(lat, t_i)
        x0 = lat - s_i * v0
        if seg_fuse:
            fused = fuse_fn(x0, step_i)
            if flf_fn is not None:
                fused = flf_fn(x0, fused, step_i)
            x0 = fused
        m1n, m0n = m0, x0
        prev = cxi * lat + c0i * m0n + c1i * m1n

        v_resample = []
        if seg_irr and rs >= 2:
            for _ in range(rs - 1):
                k, kn = jax.random.split(k)
                noise = jax.random.normal(kn, x0.shape, x0.dtype)
                lat = (1.0 - s_i) * x0 + s_i * noise
                v = model_fn(lat, tr_i)
                v_resample.append(v)
                x0 = lat - s_i * v
                if seg_fuse:
                    x0 = fuse_fn(x0, step_i)  # FLF skipped (r>0)
                m0n = x0
                prev = jnp.where(fin_i > 0, lat,
                                 cxi * lat + c0i * m0n + c1i * m1n)

        if dsg_on:
            worse = v0 if record_r0 else v_resample[0]
            good = v_resample[-1]
            better = dsg_extrapolate(good, worse, om_i)
            m0n = lat - s_i * better
            nxt = cxi * lat + c0i * m0n + c1i * m1n
            lat_next = jnp.where(fin_i > 0, lat, nxt)
        else:
            lat_next = prev
        return (lat_next, m0n, m1n, k), None

    return body


def wan_denoise_scan(
    model_fn: Callable,
    latents: jnp.ndarray,
    sched: FlowUniPCSchedule,
    guidance: GuidanceConfig,
    *,
    key,
    fuse_fn: Optional[Callable] = None,
    flf_fn: Optional[Callable] = None,
    record_r0: bool = True,
) -> jnp.ndarray:
    """The whole denoise loop — IRR, pixel-space fusion, device-side FLF
    selection, DSG — as lax.scan segments inside ONE traced program (the
    reference runs this as Python callbacks; SURVEY §7: keeping it compiled
    is the single biggest TPU win).

    model_fn(latents, t_scalar) -> velocity (traceable, CFG inside).
    fuse_fn(x0, step_scalar) -> fused x0 (traceable; pixel blend).
    flf_fn(pre_x0, fused_x0, step_scalar) -> x0 (traceable; device FLF).

    For chunked-execution serving on watchdog-limited runtimes see
    wan_scan_chunks + the pipeline's exec_chunk path.
    """
    fuse_on = fuse_fn is not None
    segments, tables, g_steps, r_round = _wan_tables(sched, guidance,
                                                     fuse_on)
    m0 = jnp.zeros_like(latents)
    m1 = jnp.zeros_like(latents)
    carry = (latents, m0, m1, key)
    for a, b in segments:
        seg_fuse = fuse_on and a < g_steps
        seg_irr = a < r_round
        xs = tuple(jnp.asarray(t[a:b]) for t in tables)
        body = make_wan_body(model_fn, fuse_fn, flf_fn, guidance,
                             record_r0, seg_fuse, seg_irr)
        carry, _ = jax.lax.scan(body, carry, xs)
    return carry[0]



def _longcat_tables(sched, guidance: GuidanceConfig, fuse_on: bool):
    """Segment bounds + per-step xs tables shared by the one-program scan
    (longcat_denoise_scan) and the chunked-execution plan
    (longcat_scan_chunks). xs order: (t, sigma, sigma_next, omega, step)."""
    import numpy as np

    n = sched.num_steps
    r_round = min(guidance.resample_round, n)
    g_steps = min(guidance.guide_steps, n)

    ts = np.asarray(sched.timesteps, np.float32)
    sig = np.asarray(sched.sigmas[:-1], np.float32)
    sig_next = np.asarray(sched.sigmas[1:], np.float32)
    omegas = np.where(np.arange(n) < g_steps, guidance.omega,
                      guidance.omega_resample).astype(np.float32)
    steps = np.arange(n, dtype=np.float32)

    bounds = sorted({0, g_steps if fuse_on else 0,
                     r_round if guidance.guided else 0, n})
    segments = [(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    return segments, (ts, sig, sig_next, omegas, steps), g_steps, r_round


def longcat_scan_chunks(sched, guidance: GuidanceConfig, fuse_on: bool,
                        exec_chunk: int, fuse_cost: float = 0.5):
    """Chunked-execution plan: the SAME segment structure
    longcat_denoise_scan runs inside one jit, sub-split so no chunk scans
    more than exec_chunk steps — for runtimes that kill long single
    executions (the ~65-72 s watchdog pinned by
    scripts/probe_long_execution.py; docs/COMPONENTS.md deviation 9).
    Returns [(seg_fuse, seg_irr, xs_numpy_tuple), ...]; chunks with equal
    (seg_fuse, seg_irr, length) share one compiled program. exec_chunk is
    in plain-step equivalents; guided segments get proportionally fewer
    steps per chunk (_seg_chunk_steps).
    """
    segments, tables, g_steps, r_round = _longcat_tables(sched, guidance,
                                                         fuse_on)
    plan = []
    for a, b in segments:
        seg_fuse = fuse_on and a < g_steps
        seg_irr = guidance.guided and a < r_round
        k = _seg_chunk_steps(exec_chunk, guidance, seg_fuse, seg_irr,
                             fuse_cost=fuse_cost)
        for c in range(a, b, k):
            d = min(c + k, b)
            plan.append((seg_fuse, seg_irr,
                         tuple(t[c:d] for t in tables)))
    return plan


def make_longcat_body(model_fn: Callable, fuse_fn: Optional[Callable],
                      guidance: GuidanceConfig, seg_fuse: bool,
                      seg_irr: bool):
    """Per-step scan body for the LongCat denoise loop (flow-match Euler +
    IRR/DSG on the noise frames, cond frame in slot 0). Carry: (latents,
    key). xs: (t, sigma, sigma_next, omega, step). Semantics:
    pipeline_longcat_video.py:827-991."""
    rs = guidance.resample_steps
    dsg_on = seg_irr and rs >= 2 and guidance.guided

    def body(carry, xs):
        lat, k = carry
        t_i, s_i, sn_i, om_i, step_i = xs

        def run_r(lat, first):
            v = model_fn(lat, t_i)
            vn = v[:, :, 1:]
            x0 = lat[:, :, 1:] - s_i * vn
            if seg_fuse and first:
                vfull = jnp.concatenate(
                    [jnp.zeros_like(v[:, :, :1]), vn], axis=2)
                x0f = lat - s_i * vfull
                x0 = fuse_fn(x0f, step_i)[:, :, 1:]
            elif seg_fuse:
                pass  # reference fuses only when not resampling
            prev = lat[:, :, 1:] + (sn_i - s_i) * vn
            # DSG history records the SLICED noise-frame output
            # (pipeline :896 calls step with noise_pred[:, :, 1:])
            return vn, x0, prev

        v0, x0, prev = run_r(lat, True)
        v_last = v0
        if seg_irr and rs >= 2:
            for _ in range(rs - 1):
                k, kn = jax.random.split(k)
                noise = jax.random.normal(kn, x0.shape, x0.dtype)
                lat = lat.at[:, :, 1:].set((1.0 - s_i) * x0
                                           + s_i * noise)
                v, x0, prev = run_r(lat, False)
                v_last = v

        if dsg_on:
            better = dsg_extrapolate(v_last, v0, om_i)
            nxt = lat[:, :, 1:] + (sn_i - s_i) * better
            lat = lat.at[:, :, 1:].set(nxt)
        else:
            lat = lat.at[:, :, 1:].set(prev)
        return (lat, k), None

    return body


def longcat_denoise_scan(
    model_fn,
    latents,
    sched,
    guidance: GuidanceConfig,
    *,
    key,
    fuse_fn=None,
):
    """LongCat i2v denoise loop as lax.scan segments inside ONE traced
    program — the Euler analog of wan_denoise_scan. model_fn(latents_full,
    t_scalar) -> NEGATED velocity for the full latents (CFG-zero applied
    inside); fuse_fn(x0_full, step) -> fused full-latent x0. Semantics:
    pipeline_longcat_video.py:827-991. For chunked-execution serving on
    watchdog-limited runtimes see longcat_scan_chunks + the pipeline's
    exec_chunk path."""
    fuse_on = fuse_fn is not None
    segments, tables, g_steps, r_round = _longcat_tables(sched, guidance,
                                                         fuse_on)
    carry = (latents, key)
    for a, b in segments:
        seg_fuse = fuse_on and a < g_steps
        seg_irr = guidance.guided and a < r_round
        xs = tuple(jnp.asarray(t[a:b]) for t in tables)
        body = make_longcat_body(model_fn, fuse_fn, guidance, seg_fuse,
                                 seg_irr)
        carry, _ = jax.lax.scan(body, carry, xs)
    return carry[0]
