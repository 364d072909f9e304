"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: solver iterations/second on the BASELINE LASSO config
(dense Gaussian A 1000×2000, adaptive BB mode, fp32, fixed iteration
count so every run does identical work).  ``vs_baseline`` is the speedup
over the float64 NumPy oracle running the same instance on this host's
CPU — the reference implementation's measured rate (BASELINE.md: the
oracle run *is* the baseline; the upstream publishes no numbers).

Usage:  python bench.py            # full benchmark (TPU if available)
        python bench.py --quick    # reduced iteration counts (smoke)
        python bench.py --large    # HBM-bound config (512 MB operand):
                                   # measures streaming bandwidth instead
                                   # of the VMEM-resident baseline size
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: repeat runs (and driver round-end runs)
# skip the slow tunnel recompiles
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def bench_tpu(prob, opts, tau0: float, repeats: int = 3):
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
    # The barrier itself costs one tunnel round trip (measured 1–28 ms
    # depending on the day's tunnel state) — time it on the already-
    # materialized warm result and subtract it, so the metric is solver
    # time, not network latency.
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
    import problems
    from fasta_tpu import FastaOptions

    if large:
        # 8192x16384 f32 = 512 MB: far beyond VMEM, exercises true HBM
        # streaming (where the fused Pallas pass halves traffic).
        # 200 iters so the tunnel's per-readback RTT (measured up to
        # ~28 ms) stays a small fraction of the wall.
        iters = 200
        oracle_iters = 5
        prob = problems.build("lasso", m=8192, n=16384, k=400)
        metric = "lasso_8192x16384_adaptive_iters_per_sec"
    else:
        iters = 100 if quick else 1000
        oracle_iters = 50 if quick else 300
        prob = problems.build("lasso")        # BASELINE: 1000x2000
        metric = "lasso_1000x2000_adaptive_iters_per_sec"
    tau0 = 0.05
    opts = FastaOptions(max_iters=iters, stop_rule="iterations",
                        adaptive=True, backtrack=True)

    tpu_ips, best, barrier = bench_tpu(prob, opts, tau0)
    oracle_ips = bench_oracle(prob.instance, tau0, oracle_iters)

    m, n = prob.instance["A"].shape
    # adaptive iteration = 2 streaming passes over A (fwd + adjoint-grad)
    # — or ONE when the fused one-pass kernel is active (auto at
    # streaming sizes)
    from fasta_tpu.kernels.lstsq_fused import supports_fusion
    passes = 1 if supports_fusion(m, n, jnp.float32) else 2
    bytes_per_iter = passes * m * n * 4
    gbps = tpu_ips * bytes_per_iter / 1e9

    result = {
        "metric": metric,
        "value": round(tpu_ips, 1),
        "unit": "iterations/s",
        "vs_baseline": round(tpu_ips / oracle_ips, 2),
    }
    print(json.dumps(result))
    print(f"# detail: net_wall={best:.4f}s for {iters} iters "
          f"(readback barrier {barrier*1e3:.1f} ms subtracted); "
          f"oracle={oracle_ips:.1f} it/s; matvec traffic "
          f"{gbps:.1f} GB/s vs ~819 GB/s v5e HBM roofline",
          file=sys.stderr)


def _watchdog(seconds: int = 480):
    """The tunneled TPU backend can wedge (hangs even trivial dispatches);
    emit an explicit failure record instead of hanging the driver."""
    import signal

    def onalarm(signum, frame):
        print(json.dumps({
            "metric": "lasso_1000x2000_adaptive_iters_per_sec",
            "value": 0.0,
            "unit": "iterations/s",
            "vs_baseline": 0.0,
        }))
        print("# TPU backend unresponsive after "
              f"{seconds}s — benchmark aborted (the dev tunnel wedges "
              "intermittently and its local relay can die outright; "
              "measured results are recorded in BENCH_RESULTS.md and "
              "BASELINE.md: 44.2k it/s barrier-subtracted on this "
              "metric when the backend responds, 2026-08-17)",
              file=sys.stderr)
        sys.stdout.flush()
        import os
        os._exit(3)

    signal.signal(signal.SIGALRM, onalarm)
    signal.alarm(seconds)


if __name__ == "__main__":
    _watchdog()
    main()
