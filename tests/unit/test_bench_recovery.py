"""bench.py relay-recovery hardening (round-4 VERDICT item 1).

The benchmark is the driver's one artifact per round; round 4 zeroed
because the recovery probe could neither diagnose a dead relay nor
outlast a long wedge.  These tests pin the recovery logic that doesn't
need a TPU: relay detection semantics, budget plumbing, and the
fast-fail on a dead relay.
"""

import importlib.util
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_relay_alive_returns_tristate():
    bench = _load_bench()
    alive = bench.relay_alive()
    # On the dev box the relay process exists; in any sandbox the scan
    # must still return a clean True/False/None — never raise.
    assert alive in (True, False, None)


def test_wait_for_backend_succeeds_quickly_on_cpu(monkeypatch):
    """With FASTA_BENCH_PLATFORM=cpu the probe subprocess dispatches on
    the CPU backend and must succeed on the FIRST attempt (no backoff
    sleeps), regardless of relay state."""
    monkeypatch.setenv("FASTA_BENCH_PLATFORM", "cpu")
    bench = _load_bench()          # module reads the env at import
    t0 = time.monotonic()
    ok = bench.wait_for_backend(total_budget_s=60.0,
                                attempt_timeout_s=50.0)
    assert ok
    assert time.monotonic() - t0 < 50.0


def test_dead_relay_fails_fast(monkeypatch):
    """A dead LOCAL relay is unrecoverable (its stdio channel to the
    orchestrator cannot be re-created in-container): wait_for_backend
    must return False immediately instead of burning the budget."""
    monkeypatch.delenv("FASTA_BENCH_PLATFORM", raising=False)
    bench = _load_bench()
    monkeypatch.setattr(bench, "relay_alive", lambda: False)
    t0 = time.monotonic()
    ok = bench.wait_for_backend(total_budget_s=300.0)
    assert not ok
    assert time.monotonic() - t0 < 5.0, "must not probe a dead relay"


def test_watchdog_budget_env_tunable(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    assert bench._watchdog_budget() == 480
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quick"])
    assert bench._watchdog_budget() == 180
    monkeypatch.setenv("FASTA_BENCH_WATCHDOG", "1800")
    assert bench._watchdog_budget() == 1800.0
