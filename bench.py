"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: solver iterations/second on the BASELINE LASSO config
(dense Gaussian A 1000×2000, adaptive BB mode, fp32, fixed iteration
count so every run does identical work).  ``vs_baseline`` is the speedup
over the float64 NumPy oracle running the same instance on this host's
CPU — the reference implementation's measured rate (BASELINE.md: the
oracle run *is* the baseline; the upstream publishes no numbers).

Two paths are measured at the baseline size and the BEST validated one
is the headline: the jitted XLA while_loop (HBM-bound — A streams from
HBM every matvec) and the whole-solve Pallas microsolver (same adaptive
BB+backtracking math, hardware trajectory parity asserted by
benchmarks/hw_validate.py check [7]), which pins A in VMEM across all
iterations and cleared 250k+ it/s live on 2026-08-19.  The detail line
reports both.  At --large streaming sizes only the XLA path exists.

RTT robustness (round-3 VERDICT item 1): every readback through the
tunneled TPU costs one round trip (measured 1–28 ms depending on the
day), so the measured solve chains 20k iterations per readback (200k
in-kernel for the microsolver row) — the subtracted barrier stays under
10% even on a bad-RTT day.  The detail line
prints the barrier fraction so the margin is auditable.  Before
measuring, a bounded relay-recovery probe retries a trivial dispatch in
a subprocess (exponential backoff, budget = watchdog headroom, both
env-tunable: FASTA_BENCH_PROBE_BUDGET / FASTA_BENCH_WATCHDOG) — a
transient tunnel outage delays the benchmark instead of zeroing the
round, while a DEAD local relay process (see relay_alive) fails fast
with that diagnosis: the relay's stdio channel to the orchestrator is
created by init at boot and cannot be restored from inside the
container.

Usage:  python bench.py            # full benchmark (TPU if available)
        python bench.py --quick    # reduced iteration counts (smoke)
        python bench.py --large    # HBM-bound config (512 MB operand):
                                   # measures streaming bandwidth instead
                                   # of the VMEM-resident baseline size
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

METRIC = "lasso_1000x2000_adaptive_iters_per_sec"

# Best result measured so far — the watchdog/failure path emits this
# instead of a zero record when a LATER stage (e.g. the microsolver
# row's remote Pallas compile) hangs after a good measurement landed.
_BEST = {"value": 0.0, "vs_baseline": 0.0, "metric": METRIC}

# FASTA_BENCH_PLATFORM overrides the backend (e.g. "cpu" to smoke-test
# the harness logic off-TPU).  Must go through jax.config: the image's
# sitecustomize rewrites jax_platforms to "axon,cpu" in every process,
# ignoring the JAX_PLATFORMS env var (CLAUDE.md).
_PLATFORM = os.environ.get("FASTA_BENCH_PLATFORM", "")


def _apply_platform():
    if _PLATFORM:
        import jax
        jax.config.update("jax_platforms", _PLATFORM)


_PROBE = ("import os, jax; "
          "p = os.environ.get('FASTA_BENCH_PLATFORM', ''); "
          "p and jax.config.update('jax_platforms', p); "
          "import jax.numpy as jnp; "
          "x = jnp.ones((128,128), jnp.float32); "
          "print(float((x@x).sum()))")


def relay_alive():
    """Is the local stdio↔TCP relay (`/root/.tpu_init.py`) alive?

    The tunneled axon backend reaches the TPU through a relay process
    spawned by init at boot with its stdin/stdout wired to the EXTERNAL
    orchestrator (it pumps bytes between local ports 8082–8117 and that
    stdio channel).  Because the stdio channel cannot be re-created
    from inside the container, a dead relay is UNRECOVERABLE here —
    only diagnosable.  Diagnosis matters for the failure record: "local
    relay process gone" (retrying is pointless, fail fast) vs "relay up
    but the remote end is wedged" (CLAUDE.md: wedges typically clear in
    ~1 min after the stuck client is reaped — keep probing).

    Returns True/False, or None when /proc isn't scannable.  The scan
    never touches the relay's sockets (a bare connect would emit an
    open-marker upstream)."""
    try:
        import glob
        for path in glob.glob("/proc/[0-9]*/cmdline"):
            try:
                with open(path, "rb") as fh:
                    cmd = fh.read()
            except OSError:
                continue
            if b".tpu_init.py" in cmd:
                return True
        return False
    except Exception:                            # pragma: no cover
        return None


def wait_for_backend(total_budget_s: float = 300.0,
                     attempt_timeout_s: float = 75.0) -> bool:
    """Bounded relay-recovery probe: retry a trivial dispatch in a
    SUBPROCESS (a wedged in-process backend cannot be un-wedged) until
    it answers or the budget runs out.  The first attempt's timeout
    covers a cold XLA compile through the tunnel (~20–40 s).

    Backoff is exponential (5→60 s): the documented recovery mode is
    "clears in ~1 min on retry after the stuck client is reaped", so
    early retries are cheap and late ones spaced out.  When the LOCAL
    relay process is gone (see relay_alive) the probe fails fast —
    no amount of retrying restores a severed stdio channel."""
    if _PLATFORM:                 # off-TPU smoke runs skip relay checks
        pass
    elif relay_alive() is False:
        print("# local TPU relay process (.tpu_init.py) is DEAD — "
              "unrecoverable from inside the container, failing fast",
              file=sys.stderr)
        return False
    deadline = time.monotonic() + total_budget_s
    attempt = 0
    backoff = 5.0
    while time.monotonic() < deadline:
        attempt += 1
        budget = min(attempt_timeout_s, max(deadline - time.monotonic(), 5))
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE], timeout=budget,
                capture_output=True, text=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"# backend probe recovered on attempt {attempt}",
                          file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        if not _PLATFORM and relay_alive() is False:
            print("# local TPU relay process died mid-probe — "
                  "unrecoverable, failing fast", file=sys.stderr)
            return False
        left = max(deadline - time.monotonic(), 0)
        print(f"# backend probe attempt {attempt} failed"
              + (f"; retrying in {min(backoff, left):.0f}s "
                 f"({left:.0f}s budget left)" if left > 0
                 else "; budget exhausted"),
              file=sys.stderr)
        if left <= 0:
            break
        time.sleep(min(backoff, left))
        backoff = min(backoff * 2.0, 60.0)
    return False


def bench_tpu(prob, opts, tau0: float, repeats: int = 3):
    import jax.numpy as jnp

    from fasta_tpu import make_solver

    solve = make_solver(opts)
    args = (prob.op, prob.fterm, prob.gterm, jnp.asarray(prob.x0),
            jnp.asarray(tau0, jnp.float32))

    def run_blocking():
        # a host scalar readback is the only reliable completion barrier
        # on remote/tunneled backends where block_until_ready returns at
        # dispatch time
        out = solve(*args)
        return out, float(jnp.sum(out.taus))

    warm, _ = run_blocking()             # warmup / compile
    # The barrier itself costs one tunnel round trip — time it on the
    # already-materialized warm result and subtract it, so the metric is
    # solver time, not network latency.  The solve chains enough
    # iterations per readback that the barrier stays <10% of net wall.
    barrier = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(warm.taus))
        barrier = min(barrier, time.perf_counter() - t0)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_blocking()
        best = min(best, time.perf_counter() - t0)
    net = max(best - barrier, 1e-9)
    return opts.max_iters / net, net, barrier


def bench_micro(inst, tau0: float, iters: int, repeats: int = 3):
    """Steady-state rate of the whole-solve Pallas microsolver on the
    SAME config — the framework's fastest validated path for the
    baseline problem (hardware trajectory parity vs the XLA hp loop is
    asserted by benchmarks/hw_validate.py check [7]).  The kernel pins
    A in VMEM across all iterations, so it clears the HBM roofline the
    XLA loop is bound by; at its measured rate the chained run needs
    ~10x the iterations to keep the readback barrier <10% of wall."""
    import jax.numpy as jnp

    from fasta_tpu.kernels.microsolver import microsolve_lasso

    A = jnp.asarray(inst["A"], jnp.float32)
    b = jnp.asarray(inst["b"], jnp.float32)
    x0 = jnp.asarray(inst["x0"], jnp.float32)

    def run_blocking():
        _x, taus, _r, _k, _c = microsolve_lasso(
            A, b, x0, tau0, inst["mu"], max_iters=iters, tol=0.0)
        return float(jnp.sum(taus))

    run_blocking()                       # warmup / compile
    _x, taus, _r, _k, _c = microsolve_lasso(
        A, b, x0, tau0, inst["mu"], max_iters=iters, tol=0.0)
    float(jnp.sum(taus))
    barrier = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(taus))
        barrier = min(barrier, time.perf_counter() - t0)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_blocking()
        best = min(best, time.perf_counter() - t0)
    net = max(best - barrier, 1e-9)
    return iters / net, net, barrier


def bench_oracle(inst, tau0: float, iters: int):
    from reference_oracle.fasta_numpy import fasta as fasta_np

    t0 = time.perf_counter()
    r = fasta_np(inst["op"], None, inst["f"], inst["gradf"], inst["g"],
                 inst["proxg"], inst["x0"], tau0=tau0, max_iters=iters,
                 stop_rule="iterations", tol=0.0)
    dt = time.perf_counter() - t0
    return r.iteration_count / dt


def main():
    quick = "--quick" in sys.argv
    large = "--large" in sys.argv

    # Probe budget defaults to the watchdog headroom left after the
    # measurement itself (~120 s warm through the persistent compile
    # cache, ~200 s with cold tunnel compiles), and is env-tunable —
    # a driver that tolerates a longer wall can raise both:
    #   FASTA_BENCH_WATCHDOG=1800 FASTA_BENCH_PROBE_BUDGET=1500
    probe_budget = float(os.environ.get(
        "FASTA_BENCH_PROBE_BUDGET",
        max(30.0, _watchdog_budget() - (120.0 if quick else 200.0))))
    if not wait_for_backend(probe_budget):
        why = ("backend probe never recovered within the retry "
               "budget (relay down)")
        if relay_alive() is False:
            why = ("local relay process (.tpu_init.py) dead — stdio "
                   "channel severed, unrecoverable from inside the "
                   "container")
        _fail_record(why)

    import jax
    _apply_platform()
    import jax.numpy as jnp

    # persistent compile cache: repeat runs (and driver round-end runs)
    # skip the slow tunnel recompiles
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import problems
    from fasta_tpu import FastaOptions

    if large:
        # 8192x16384 f32 = 512 MB: far beyond VMEM, exercises true HBM
        # streaming (where the fused Pallas pass halves traffic).
        # 2000 iters/readback ≈ 1.8 s net wall at the measured rate:
        # the per-readback RTT stays ≪10% of the wall.
        iters = 2000
        oracle_iters = 5
        prob = problems.build("lasso", m=8192, n=16384, k=400)
        metric = "lasso_8192x16384_adaptive_iters_per_sec"
    else:
        # 20k iterations per readback ≈ 0.45 s net wall at the headline
        # rate — a worst-day 28 ms barrier is ~6% of the measurement.
        iters = 100 if quick else 20000
        oracle_iters = 50 if quick else 300
        prob = problems.build("lasso")        # BASELINE: 1000x2000
        metric = METRIC
    tau0 = 0.05
    opts = FastaOptions(max_iters=iters, stop_rule="iterations",
                        adaptive=True, backtrack=True)

    # Capture the Pallas streaming decision ONCE, before the solver is
    # traced, and reuse it for the traffic estimate — the traced path
    # and the report can't disagree (round-2 ADVICE finding).
    m, n = prob.instance["A"].shape
    from fasta_tpu.kernels.lstsq_fused import supports_fusion
    fused_path = supports_fusion(m, n, jnp.float32)

    tpu_ips, best, barrier = bench_tpu(prob, opts, tau0)
    oracle_ips = bench_oracle(prob.instance, tau0, oracle_iters)
    _BEST.update(value=tpu_ips, vs_baseline=tpu_ips / oracle_ips,
                 metric=metric)

    # Headline = the framework's best validated path for the config.
    # At the baseline size the whole-solve microsolver (same adaptive
    # BB+backtracking math, hardware-parity-checked) pins A in VMEM and
    # clears the XLA loop's HBM bound; at streaming sizes (--large) it
    # has no kernel and the XLA loop IS the path.
    micro_ips = micro_net = micro_barrier = None
    if not large:
        try:
            micro_ips, micro_net, micro_barrier = bench_micro(
                prob.instance, tau0, 1000 if quick else 10 * iters)
        except Exception as e:                      # pragma: no cover
            print(f"# microsolver row skipped: {e}", file=sys.stderr)
    headline = max(tpu_ips, micro_ips or 0.0)

    # adaptive iteration = 2 streaming passes over A (fwd + adjoint-grad)
    # — or ONE when the fused one-pass kernel is active (auto at
    # streaming sizes)
    passes = 1 if fused_path else 2
    bytes_per_iter = passes * m * n * 4
    gbps = tpu_ips * bytes_per_iter / 1e9

    result = {
        "metric": metric,
        "value": round(headline, 1),
        "unit": "iterations/s",
        "vs_baseline": round(headline / oracle_ips, 2),
    }
    print(json.dumps(result))
    print(f"# detail: XLA loop {tpu_ips:.0f} it/s "
          f"(net_wall={best - barrier:.4f}s for {iters} iters; "
          f"readback barrier {barrier*1e3:.1f} ms subtracted = "
          f"{barrier / max(best, 1e-9) * 100:.1f}% of raw wall; "
          f"matvec traffic {gbps:.1f} GB/s vs ~819 GB/s v5e HBM "
          f"roofline, {'one-pass fused' if fused_path else 'two-pass XLA'})"
          + (f"; VMEM-resident microsolver {micro_ips:.0f} it/s "
             f"(net_wall={micro_net:.4f}s, barrier "
             f"{micro_barrier / max(micro_net + micro_barrier, 1e-9) * 100:.1f}"
             f"% of raw wall; hw-parity per hw_validate [7])"
             if micro_ips else "")
          + f"; oracle={oracle_ips:.1f} it/s", file=sys.stderr)


def _fail_record(why: str):
    # "partial": true marks an aborted-but-partially-measured run (a
    # later stage hung after a best-so-far value was recorded) so it is
    # never mistaken for a clean run even though the exit code is 0 to
    # let the driver accept the valid measurement (round-3 ADVICE).
    print(json.dumps({
        "metric": _BEST["metric"],
        "value": round(_BEST["value"], 1),
        "unit": "iterations/s",
        "vs_baseline": round(_BEST["vs_baseline"], 2),
        "partial": True,
    }))
    tail = ("the best already-measured stage is recorded above"
            if _BEST["value"] > 0 else
            "measured results are recorded in BENCH_RESULTS.md and "
            "BASELINE.md when the backend responds")
    print(f"# TPU benchmark aborted: {why} — the dev tunnel wedges "
          f"intermittently and its local relay can die outright; {tail}",
          file=sys.stderr)
    sys.stdout.flush()
    os._exit(3 if _BEST["value"] == 0 else 0)


def _watchdog_budget() -> float:
    default = 180 if "--quick" in sys.argv else 480
    return float(os.environ.get("FASTA_BENCH_WATCHDOG", default))


def _watchdog():
    """The tunneled TPU backend can wedge mid-run (hangs even trivial
    dispatches); emit an explicit failure record instead of hanging the
    driver.  The default budget covers the recovery probe + compiles +
    the chained measurement (the round-2 driver tolerated 480 s);
    FASTA_BENCH_WATCHDOG raises it, and the probe budget scales with it
    (see main)."""
    import signal

    seconds = int(_watchdog_budget())

    def onalarm(signum, frame):
        _fail_record(f"TPU backend unresponsive after {seconds}s")

    signal.signal(signal.SIGALRM, onalarm)
    signal.alarm(seconds)


if __name__ == "__main__":
    _watchdog()
    main()
