"""Tracing / profiling subsystem.

The reference has almost none (SURVEY.md §5: opt-in CUDA-event timing in
DepthCrafter only). Here profiling is first-class: per-phase wall timers
with device sync, and jax.profiler trace capture for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax
import numpy as np

_PHASES: Dict[str, float] = {}
_COUNTS: Dict[str, int] = {}


def _sync(x=None):
    if x is not None:
        jax.block_until_ready(x)
        # axon tunnel: force a scalar host read (see .claude/skills/verify)
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf[(0,) * leaf.ndim])


@contextlib.contextmanager
def phase(name: str, sync_on=None):
    """Accumulating phase timer: `with phase("denoise"): ...`. Pass the
    phase's output array as sync_on for accurate device timing."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _sync(sync_on)
        dt = time.perf_counter() - t0
        _PHASES[name] = _PHASES.get(name, 0.0) + dt
        _COUNTS[name] = _COUNTS.get(name, 0) + 1


def phase_report(reset: bool = True) -> Dict[str, Dict[str, float]]:
    rep = {k: {"total_s": round(v, 4), "calls": _COUNTS[k],
               "mean_s": round(v / _COUNTS[k], 4)}
           for k, v in _PHASES.items()}
    if reset:
        _PHASES.clear()
        _COUNTS.clear()
    return rep


def print_phase_report(reset: bool = True) -> None:
    print(json.dumps(phase_report(reset), indent=2))


@contextlib.contextmanager
def trace(logdir: str = "/tmp/worldforge_trace"):
    """Capture a jax.profiler trace (open with xprof / tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
