"""Full benchmark sweep — oracle baseline vs TPU solver on the five
BASELINE.json configs.  Writes BENCH_RESULTS.md (markdown table) and
prints a JSON summary.

Protocol per problem:
  * oracle (float64 NumPy, this host's CPU): converged solve at the
    reference tolerance → iterations/s, wall time, iterations, objective.
  * TPU (f32/c64, jitted while_loop): (a) fixed-iteration run →
    steady-state iterations/s; (b) converged solve at an
    f32-achievable tolerance → wall time-to-solution.

Run:  python benchmarks/run.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


CONFIGS = [
    # name, builder kwargs, tau0, converge tol, fixed iters
    ("lasso", {}, 0.05, 1e-6, 1000),
    ("nnls", {}, 0.08, 1e-6, 1000),
    ("logistic", {}, 1.0, 1e-6, 1000),
    ("tv", {}, 2.0, 1e-5, 300),
    # planar complex: TPU backends have no native complex support; the
    # planar layout is the TPU-idiomatic formulation (identical math).
    # tol 1e-5, not the oracle's 1e-6: the normalized residual's floor
    # under f32 ITERATE storage is ~5e-6 for this instance (Δx is
    # quantized at eps32·‖x‖, so ‖Δx‖/τ cannot go lower) — measured
    # round 2; the plain-f32 path only "crossed" 1e-6 by reaching an
    # exact fixed point of the rounded iteration map (res == 0.0).
    ("phase_retrieval", {"planar": True}, 1.0, 1e-5, 300),
]


def bench_oracle(prob, tau0, tol, max_iters=20000):
    from reference_oracle.fasta_numpy import fasta as fasta_np
    inst = prob.instance
    t0 = time.perf_counter()
    r = fasta_np(inst["op"], inst.get("op_t"), inst["f"], inst["gradf"],
                 inst["g"], inst["proxg"], inst["x0"], tau0=tau0, tol=tol,
                 max_iters=max_iters, record_objective=True)
    dt = time.perf_counter() - t0
    # recovered=None (shape inference): the oracle's solution layout is
    # problem-dependent — TV solves the DUAL (recover() must map p to
    # the image; passing recovered=True here printed a nonsense 1.95
    # "oracle recovery error" on 2026-08-19), while planar phase
    # retrieval's oracle solves the native complex signal (recover must
    # be skipped).  The shape rule distinguishes exactly these cases
    # (recovery_error docstring).
    return dict(iters=r.iteration_count, seconds=dt,
                ips=r.iteration_count / dt, converged=bool(r.converged),
                objective=float(r.objectives[-1]),
                rel_err=prob.recovery_error(np.asarray(r.solution),
                                            recovered=None))


def _readback_barrier(warm_out, repeats=3):
    """Cost of the completion barrier itself (one tunnel round trip,
    measured 1–28 ms depending on the day) — timed on an already-
    materialized result and subtracted from every wall below, so the
    table records solver time, not network latency (docs/PERF.md)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(warm_out.taus))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_tpu(prob, tau0, tol, fixed_iters, repeats=3):
    from fasta_tpu import FastaOptions, make_solver

    # (a) steady-state iterations/s at a fixed iteration count.  Timing
    # uses a host scalar readback as the completion barrier — on the
    # tunneled backend block_until_ready returns at dispatch time.
    opts = FastaOptions(max_iters=fixed_iters, stop_rule="iterations")
    solve = make_solver(opts)
    args = (prob.op, prob.fterm, prob.gterm, jnp.asarray(prob.x0), tau0)
    warm = solve(*args)
    float(jnp.sum(warm.taus))                    # compile+warm
    barrier = _readback_barrier(warm, repeats)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(solve(*args).taus))
        best = min(best, time.perf_counter() - t0)
    best = max(best - barrier, 1e-9)
    ips = fixed_iters / best

    # (b) converged wall time
    opts_c = FastaOptions(max_iters=20000, tol=tol, record_objective=True)
    solve_c = make_solver(opts_c)
    float(jnp.sum(solve_c(*args).taus))          # compile+warm
    t0 = time.perf_counter()
    out = solve_c(*args)
    float(jnp.sum(out.taus))
    dt = max(time.perf_counter() - t0 - barrier, 1e-9)
    k = int(out.iteration_count)
    return dict(ips=ips, fixed_iters=fixed_iters, fixed_seconds=best,
                conv_iters=k, conv_seconds=dt,
                converged=bool(out.converged),
                objective=float(np.asarray(out.objectives)[k - 1]),
                rel_err=prob.recovery_error(np.asarray(out.solution),
                                            recovered=False))


def main():
    quick = "--quick" in sys.argv
    import problems

    device = jax.devices()[0].device_kind
    rows = []
    for name, kwargs, tau0, tol, fixed in CONFIGS:
        if quick:
            fixed = min(fixed, 100)
        prob = problems.build(name, **kwargs)
        oracle = bench_oracle(prob, tau0, tol,
                              max_iters=2000 if quick else 20000)
        tpu = bench_tpu(prob, tau0, tol, fixed)
        rows.append((prob.name, oracle, tpu))
        print(f"{prob.name}: oracle {oracle['ips']:.0f} it/s "
              f"({oracle['iters']} iters, {oracle['seconds']:.3f}s) | "
              f"tpu {tpu['ips']:.0f} it/s, conv {tpu['conv_iters']} iters "
              f"in {tpu['conv_seconds'] * 1e3:.1f}ms, "
              f"obj {tpu['objective']:.6g} (oracle {oracle['objective']:.6g})",
              flush=True)

    lines = [
        "# BENCH_RESULTS — measured",
        "",
        f"Device: {device}; oracle: float64 NumPy on 1-core host CPU.  "
        "TPU walls subtract the measured readback-barrier round trip "
        "(docs/PERF.md methodology).",
        "",
        "Solver quality = `obj match` (relative objective gap vs the "
        "converged float64 oracle).  `recovery err` is distance to the "
        "PLANTED signal — a property of the problem instance and its "
        "regularization (e.g. logistic's μ admits large weights), not "
        "of the solver; the oracle column shows the same metric for "
        "the float64 reference so the two can be compared directly.",
        "",
        "| problem | oracle it/s | oracle iters | oracle wall | "
        "TPU it/s | TPU conv iters | TPU wall | speedup (it/s) | "
        "obj match | recovery err TPU | recovery err oracle |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for pname, o, t in rows:
        objmatch = abs(t["objective"] - o["objective"]) / max(
            abs(o["objective"]), 1e-12)
        lines.append(
            f"| {pname} | {o['ips']:.0f} | {o['iters']} | "
            f"{o['seconds']:.3f}s | {t['ips']:.0f} | {t['conv_iters']} | "
            f"{t['conv_seconds']*1e3:.1f}ms | "
            f"{t['ips']/o['ips']:.0f}x | {objmatch:.2e} | "
            f"{t['rel_err']:.2e} | {o['rel_err']:.2e} |")
    # preserve the hand-curated sections (microsolver / streaming /
    # serving tables) below the first "## " heading — this script owns
    # only the header + five-config table
    tail = ""
    try:
        existing = open("BENCH_RESULTS.md").read()
        idx = existing.find("\n## ")
        if idx >= 0:
            tail = existing[idx:]
    except FileNotFoundError:
        pass
    with open("BENCH_RESULTS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n" + tail)
    print(json.dumps({
        "device": device,
        "results": {p: {"oracle_ips": o["ips"], "tpu_ips": t["ips"],
                        "speedup": t["ips"] / o["ips"]}
                    for p, o, t in rows},
    }))


if __name__ == "__main__":
    main()
