"""Auto-sized exec-chunk plans (sampling/engine.py::auto_exec_chunk —
VERDICT r4 item 8): the chunk size is derived from the measured
per-config cost tables, not hand-tuned; these pins are the authority for
what each production config serves with."""

import pytest

from worldforge_tpu.sampling.engine import (ExecChunkPlan, WATCHDOG_SECONDS,
                                            auto_exec_chunk, wan_scan_chunks)
from worldforge_tpu.sampling.guidance import GuidanceConfig
from worldforge_tpu.sampling.unipc import make_flow_unipc_schedule


def test_wan_480p_guided_matches_round4_tuning():
    """The derived flagship plan must reproduce the measured-safe round-4
    hand tuning (exec_chunk 4, longest steady execution 41.6 s)."""
    plan = auto_exec_chunk("wan", 20280, fuse_pixels=480 * 832,
                           guidance=GuidanceConfig())
    assert plan.exec_chunk == 4
    assert plan.fits_watchdog
    assert plan.max_chunk_s < 0.8 * WATCHDOG_SECONDS + 1e-6
    # cost estimates track the measured anchors
    assert plan.plain_step_s == pytest.approx(10.5, rel=0.01)
    assert plan.fuse_s == pytest.approx(5.1, rel=0.01)


def test_wan_720p_guided_flags_loop_mode():
    """720p guided: one IRR step = 2 CFG forwards + 2 fuses ≈ 135 s — no
    chunking can fit the watchdog; the plan must say so instead of letting
    the run fault (the mis-tuning class item 8 guards against)."""
    plan = auto_exec_chunk("wan", 46800, fuse_pixels=720 * 1280,
                           guidance=GuidanceConfig())
    assert plan.exec_chunk == 1
    assert not plan.fits_watchdog
    assert plan.max_chunk_s > 100.0


def test_wan_720p_unguided_fits():
    plan = auto_exec_chunk("wan", 46800)
    assert plan.exec_chunk == 1
    assert plan.fits_watchdog          # 37.3 s/step single-step chunks


def test_longcat_distilled_480p():
    """Derived plan for the measured round-4 config (hand-tuned 6): the
    cost table gives 8 — every chunk still under the watchdog."""
    g = GuidanceConfig(distill=True)
    plan = auto_exec_chunk("longcat", 20280, fuse_pixels=480 * 832,
                           guidance=g)
    assert plan.exec_chunk == 8
    assert plan.fits_watchdog


def test_longcat_bsa_refine_720p():
    plan = auto_exec_chunk("longcat-bsa", 56320)
    assert plan.exec_chunk == 3
    assert plan.fits_watchdog


def test_power_law_interp_hits_anchors():
    for tokens, cost in ((20280, 10.5), (46800, 37.3)):
        assert auto_exec_chunk("wan", tokens).plain_step_s == pytest.approx(
            cost, rel=1e-6)


def test_plan_threads_fuse_cost_into_scan_chunks():
    """wan_scan_chunks(fuse_cost=...) must size guided chunks with the
    ESTIMATED ratio, not the hardcoded 0.5 — at 720p the fuse costs ~0.8x
    a step, so guided chunks shrink accordingly."""
    g = GuidanceConfig()
    sched = make_flow_unipc_schedule(50, 5.0)
    plan_default = wan_scan_chunks(sched, g, True, 8, fuse_cost=0.5)
    plan_heavy = wan_scan_chunks(sched, g, True, 8, fuse_cost=3.0)
    # same total steps either way
    for p in (plan_default, plan_heavy):
        assert sum(len(xs[0]) for _, _, xs in p) == 50
    # heavier fuse -> smaller guided chunks -> more executions
    assert len(plan_heavy) > len(plan_default)


def test_watchdog_safety_margin_scales():
    """A watchdog-free runtime (watchdog=inf) should get one big chunk."""
    plan = auto_exec_chunk("wan", 20280, watchdog_s=float("inf"))
    assert plan.exec_chunk >= 10 ** 6
    assert isinstance(plan, ExecChunkPlan)
