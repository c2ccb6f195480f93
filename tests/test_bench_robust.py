"""bench.py crash-proofing: the driver's official round artifact must be
ONE valid JSON line with exit 0 on every chip state — cold, warm, or
immediately after an OOM (BENCH_r04 was an escaped RESOURCE_EXHAUSTED
traceback with rc=1 and no JSON; VERDICT r4 item 1).

These tests exercise the degradation ladder on CPU by monkeypatching the
bench rungs; scripts/probe_bench_after_oom.py exercises the real
induced-OOM case on the chip.
"""

import importlib.util
import json
import sys

import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def bench():
    return _load_bench()


def _run_main(bench, capsys):
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    # exactly one stdout line, and it parses as the bench JSON contract
    assert len(out) == 1, out
    rec = json.loads(out[0])
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in rec, rec
    return rec


def test_all_rungs_fail_still_emits_json(bench, capsys, monkeypatch):
    """Total failure (every rung raises) -> honest zero-value JSON line,
    no exception escaping main()."""
    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    monkeypatch.setattr(bench, "bench_wan_14b_full", boom)
    monkeypatch.setattr(bench, "bench_wan_dit_480p", boom)
    monkeypatch.setattr(bench, "bench_attention_only", boom)
    rec = _run_main(bench, capsys)
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert "RESOURCE_EXHAUSTED" in rec["error"]


def test_full_model_oom_falls_back_to_layer(bench, capsys, monkeypatch):
    """The BENCH_r04 scenario: full model OOMs, layer mode must still
    produce the metric (and its own failures must be caught too)."""
    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(bench, "bench_wan_14b_full", boom)
    monkeypatch.setattr(bench, "bench_wan_dit_480p", lambda: 0.123)
    rec = _run_main(bench, capsys)
    assert rec["value"] == 0.123
    assert "layer-extrapolated" in rec["metric"]


def test_layer_oom_falls_back_to_attention(bench, capsys, monkeypatch):
    """r4's exact gap: the layer fallback itself OOMs -> attention rung."""
    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(bench, "bench_wan_14b_full", boom)
    monkeypatch.setattr(bench, "bench_wan_dit_480p", boom)
    monkeypatch.setattr(bench, "bench_attention_only",
                        lambda: (None, 0.0425))
    rec = _run_main(bench, capsys)
    assert rec["unit"] == "ms"
    assert rec["value"] == pytest.approx(42.5)


def test_retry_after_transient_failure(bench, capsys, monkeypatch):
    """One transient failure (remote-compile 500 / post-OOM state) must be
    retried after freeing memory, not fallen through immediately."""
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient HTTP 500")
        return 0.0944

    monkeypatch.setattr(bench, "bench_wan_14b_full", flaky)
    # belt-and-braces: a signature regression above must NOT fall through
    # to the REAL 14B layer bench — on the CPU test backend that allocates
    # ~130 GB of attention scores and gets the suite OOM-killed (happened:
    # the zero-arg flaky was called with (mode), TypeError'd both
    # attempts, and the ladder degraded to the real rung)
    monkeypatch.setattr(bench, "bench_wan_dit_480p", lambda *a, **k: -1.0)
    monkeypatch.setattr(bench, "bench_attention_only",
                        lambda *a, **k: (None, -1.0))
    rec = _run_main(bench, capsys)
    assert calls["n"] == 2
    assert rec["value"] == 0.0944
    assert "measured full model" in rec["metric"]


def test_attempt_frees_memory_between_tries(bench, monkeypatch):
    """_attempt must call the memory-free hook after each failure, outside
    the except block (so tracebacks don't pin OOM'd buffers)."""
    freed = []
    monkeypatch.setattr(bench, "_free_memory", lambda: freed.append(1))

    def boom():
        raise RuntimeError("x")

    val, err = bench._attempt(boom, "t", retries=2)
    assert val is None and "RuntimeError" in err
    assert len(freed) == 3  # after each of the 3 tries


def test_cli_exit_zero_on_unhandled_error(tmp_path):
    """Even an exception outside main() (import-time flake aside) must not
    produce rc!=0: run bench.py as __main__ with a poisoned BENCH_MODE
    forcing the full ladder, on CPU."""
    import subprocess
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_MODE"] = "bf16_layer"  # skips full-model; layer runs on CPU
    # CPU layer bench would take minutes at 14B size — instead force total
    # failure by hiding the package so every import-at-call-time fails
    # run a COPY of bench.py from tmp_path so sys.path[0] (the script dir)
    # resolves worldforge_tpu to the poisoned stub, not the real package
    (tmp_path / "worldforge_tpu").mkdir()
    (tmp_path / "worldforge_tpu" / "__init__.py").write_text(
        "raise ImportError('poisoned for test')\n")
    bench_copy = tmp_path / "bench.py"
    bench_copy.write_text(open("/root/repo/bench.py").read())
    p = subprocess.run([sys.executable, str(bench_copy)],
                       capture_output=True, text=True, env=env, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, p.stdout
    rec = json.loads(lines[0])
    assert rec["value"] == 0.0 and "error" in rec
