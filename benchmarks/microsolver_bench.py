"""Microsolver hardware benchmark — run when the TPU is available.

Whole-solve-in-one-kernel vs the XLA while_loop solver, host-readback
timed, for (a) the baseline LASSO 1000×2000 and (b) TV 512×512 (the
launch-bound case the TV microsolver targets).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _t(f):
    """Best-of-3 wall with the readback-barrier round trip subtracted —
    the tunnel's per-readback RTT (measured 1–28 ms depending on the
    day) is network latency, not kernel time (docs/PERF.md)."""
    out = f()
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    barrier = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(leaf))
        barrier = min(barrier, time.perf_counter() - t0)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return max(best - barrier, 1e-9)


def main():
    import problems
    from fasta_tpu import FastaOptions, make_solver
    from fasta_tpu.kernels.microsolver import microsolve_lasso
    from fasta_tpu.kernels.microsolver_tv import microsolve_tv

    # LASSO 1000x2000.  Rate rows run 20k in-kernel iterations: the
    # kernel is fast enough that a 1k-iteration wall sits inside the
    # tunnel's RTT jitter band (the round-2 "mxu default" verdict was
    # exactly this artifact).
    RATE_ITERS = 20000
    prob = problems.build("lasso")
    inst = prob.instance
    A = jnp.asarray(inst["A"], jnp.float32)
    b = jnp.asarray(inst["b"], jnp.float32)
    x0 = jnp.asarray(inst["x0"], jnp.float32)
    tm = _t(lambda: microsolve_lasso(A, b, x0, 0.05, inst["mu"],
                                     max_iters=RATE_ITERS, tol=0.0))
    solve = make_solver(FastaOptions(max_iters=RATE_ITERS,
                                     stop_rule="iterations"))
    args = (prob.op, prob.fterm, prob.gterm, jnp.asarray(prob.x0),
            jnp.asarray(0.05, jnp.float32))
    tx = _t(lambda: solve(*args))
    print(f"lasso: micro {RATE_ITERS/tm:.0f} it/s | xla "
          f"{RATE_ITERS/tx:.0f} it/s ({tx/tm:.2f}x)", flush=True)

    # matvec-engine A/B: VPU broadcast-reduce (default) vs MXU HIGHEST
    for eng in ("mxu",):
        te = _t(lambda: microsolve_lasso(A, b, x0, 0.05, inst["mu"],
                                         max_iters=RATE_ITERS, tol=0.0,
                                         engine=eng))
        print(f"lasso[{eng}]: micro {RATE_ITERS/te:.0f} it/s "
              f"(vpu default is {te/tm:.2f}x this)", flush=True)

    # LEAN serving mode: same math, no per-iteration recording kernels
    # (compare RATES, not walls — the rows run different iter counts)
    solve_lean = make_solver(FastaOptions(max_iters=RATE_ITERS,
                                          stop_rule="iterations",
                                          record_diagnostics=False))
    tx_lean = _t(lambda: solve_lean(*args))
    print(f"lasso-lean: xla {RATE_ITERS/tx_lean:.0f} it/s "
          f"({(RATE_ITERS/tx_lean)/(RATE_ITERS/tx):.2f}x the recorded "
          f"loop; micro is {(RATE_ITERS/tm)/(RATE_ITERS/tx_lean):.2f}x "
          f"lean)", flush=True)

    # dense microsolver hp + FISTA (round-3 additions): steady rates
    # and the wall-to-tol contest vs the XLA hp loop
    tm_hp = _t(lambda: microsolve_lasso(A, b, x0, 0.05, inst["mu"],
                                        max_iters=RATE_ITERS, tol=0.0,
                                        hp=True))
    solve_hp = make_solver(FastaOptions(max_iters=RATE_ITERS,
                                        stop_rule="iterations",
                                        precision="high"))
    tx_hp = _t(lambda: solve_hp(*args))
    print(f"lasso-hp: micro {RATE_ITERS/tm_hp:.0f} it/s | xla hp "
          f"{RATE_ITERS/tx_hp:.0f} it/s ({tx_hp/tm_hp:.2f}x)", flush=True)

    def lasso_conv(kw, mi):
        def run():
            _x, _t_, _r, kk, _c = microsolve_lasso(
                A, b, x0, 0.05, inst["mu"], max_iters=mi, tol=1e-5, **kw)
            return kk
        return int(run()), _t(run)
    for label, kw, mi in (("adapt", dict(), 512),
                          ("adapt-hp", dict(hp=True), 512),
                          ("fista-hp", dict(hp=True, accelerate=True),
                           1024)):
        k, tw = lasso_conv(kw, mi)
        print(f"lasso-to-tol[{label}]: micro k={k} wall={tw*1e3:.2f}ms",
              flush=True)

    # planar PhaseMax 16384x256 (flagship; Ar+Ai = 33.5 MB VMEM-resident)
    from fasta_tpu.kernels.microsolver_planar import (
        microsolve_planar_phasemax)
    pr = problems.build("phase_retrieval", planar=True,
                        dtype=jnp.float32)
    Ar = jnp.asarray(pr.op.Ar)
    Ai = jnp.asarray(pr.op.Ai)
    bp = jnp.asarray(pr.fterm.b)
    cp = jnp.asarray(pr.gterm.c)
    xp0 = jnp.asarray(pr.x0)
    PR_ITERS = 2000
    tm = _t(lambda: microsolve_planar_phasemax(
        Ar, Ai, bp, cp, xp0, 1.0, max_iters=PR_ITERS, tol=0.0))
    solve = make_solver(FastaOptions(max_iters=PR_ITERS,
                                     stop_rule="iterations"))
    argsp = (pr.op, pr.fterm, pr.gterm, jnp.asarray(pr.x0),
             jnp.asarray(1.0, jnp.float32))
    tx = _t(lambda: solve(*argsp))
    print(f"planar-pr: micro {PR_ITERS/tm:.0f} it/s | xla "
          f"{PR_ITERS/tx:.0f} it/s ({tx/tm:.2f}x)", flush=True)
    # (no planar engine A/B since 2026-08-20: the kernel is VPU-only —
    # the MXU variant measured 1.44x slower round-3 and exceeds scoped
    # VMEM under the rowt transposed storage)

    def pr_conv(kw, mi):
        def run():
            _x, _t_, _r, kk, _c = microsolve_planar_phasemax(
                Ar, Ai, bp, cp, xp0, 1.0, max_iters=mi, tol=1e-5, **kw)
            return kk
        return int(run()), _t(run)
    for label, kw in (("adapt", dict()), ("adapt-hp", dict(hp=True)),
                      ("fista-hp", dict(hp=True, accelerate=True))):
        k, tw = pr_conv(kw, 512)
        print(f"planar-pr-to-tol[{label}]: micro k={k} "
              f"wall={tw*1e3:.2f}ms", flush=True)

    # TV 512x512
    tvp = problems.build("tv")
    ti = tvp.instance
    bb = jnp.asarray(ti["b"], jnp.float32)
    p0 = jnp.asarray(ti["x0"], jnp.float32)
    tm = _t(lambda: microsolve_tv(bb, p0, 2.0, ti["mu"], max_iters=2000,
                                  tol=0.0))
    solve = make_solver(FastaOptions(max_iters=2000,
                                     stop_rule="iterations"))
    args = (tvp.op, tvp.fterm, tvp.gterm, jnp.asarray(tvp.x0),
            jnp.asarray(2.0, jnp.float32))
    tx = _t(lambda: solve(*args))
    print(f"tv:    micro {2000/tm:.0f} it/s | xla {2000/tx:.0f} it/s "
          f"({tx/tm:.2f}x)", flush=True)

    # TV wall-to-tol: the end-to-end contest (hp scalars, adaptive vs
    # FISTA, microsolver vs XLA loop) — the BENCH_RESULTS four-way
    def conv_wall(accel):
        def run():
            _p, _t_, _r, kk, _c = microsolve_tv(
                bb, p0, 2.0, ti["mu"], max_iters=2048 if accel else 4000,
                tol=1e-5, hp=True, accelerate=accel)
            return kk          # device scalar — _t adds the one barrier
        k = int(run())
        return k, _t(run)
    for accel in (False, True):
        k, tw = conv_wall(accel)
        mode = "fista" if accel else "adapt"
        print(f"tv-to-tol[{mode}]: micro k={k} wall={tw*1e3:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
