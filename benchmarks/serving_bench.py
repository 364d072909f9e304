"""Serving-regime benchmark — batch vs single-solve crossovers (TV).

Reproduces the BENCH_RESULTS.md "Serving throughput" table: for each
workload the best path among the XLA hp loop, the whole-solve
microsolver (adaptive + FISTA) and the vmapped batch solver, all
readback-barrier-subtracted (docs/PERF.md methodology).

Run on the TPU:  python benchmarks/serving_bench.py [--quick]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _rtt():
    """Per-readback round trip, probed with FRESH tiny dispatches
    (float() of the same array is cached host-side and measures 0)."""
    tiny = jax.jit(lambda i: jnp.sum(jnp.zeros(8) + i))
    float(tiny(0))
    best = 1e9
    for i in range(1, 4):
        t0 = time.perf_counter()
        float(tiny(i))
        best = min(best, time.perf_counter() - t0)
    return best


def _timed(fn, barrier, repeats=3):
    out = fn()
    float(jnp.sum(out.taus if hasattr(out, "taus") else out))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out.taus if hasattr(out, "taus") else out))
        best = min(best, time.perf_counter() - t0)
    return max(best - barrier, 1e-9), out


def main():
    import problems
    from fasta_tpu import FastaOptions, make_batch_solver, make_solver
    from fasta_tpu.kernels.microsolver_tv import microsolve_tv
    from fasta_tpu.terms import LeastSquares

    quick = "--quick" in sys.argv
    rtt = _rtt()
    print(f"# readback barrier: {rtt*1e3:.1f} ms (subtracted below)")
    tau0 = jnp.asarray(2.0, jnp.float32)

    for hw, nbatch in ((64, 16 if quick else 64),
                       (512, 2 if quick else 8)):
        probs = [problems.build("tv", h=hw, w=hw, seed=4 + i)
                 for i in range(nbatch)]
        bs = jnp.stack([p.fterm.b for p in probs])
        x0s = jnp.stack([jnp.asarray(p.x0) for p in probs])
        op, gt = probs[0].op, probs[0].gterm
        mi = 4000 if hw == 512 else 2000
        opts = FastaOptions(max_iters=mi, tol=1e-5)

        solve = make_solver(opts)
        w, o = _timed(lambda: solve(op, probs[0].fterm, gt, x0s[0], tau0),
                      rtt)
        print(f"tv{hw} single XLA hp loop: {w*1e3:8.1f} ms "
              f"({int(o.iteration_count)} iters)")

        # lean serving mode: no per-iteration recording kernels.  The
        # completion barrier reads the solution (taus is None).
        solve_lean = make_solver(opts.replace(record_diagnostics=False))

        def run_lean():
            return solve_lean(op, probs[0].fterm, gt, x0s[0],
                              tau0).solution
        w2, _o2 = _timed(run_lean, rtt)
        print(f"tv{hw} single XLA hp loop (lean): {w2*1e3:8.1f} ms "
              f"({w/w2:.2f}x the recorded loop)")

        ti = probs[0].instance
        bb = jnp.asarray(ti["b"], jnp.float32)
        p0 = jnp.asarray(ti["x0"], jnp.float32)
        for accel, label in ((False, "adaptive"), (True, "FISTA")):
            def run(accel=accel):
                _p, _t, _r, kk, _c = microsolve_tv(
                    bb, p0, 2.0, ti["mu"], max_iters=mi, tol=1e-5,
                    hp=True, accelerate=accel)
                return kk
            k = int(run())
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run())
                best = min(best, time.perf_counter() - t0)
            print(f"tv{hw} single microsolver {label}: "
                  f"{max(best-rtt,0)*1e3:8.1f} ms ({k} iters)")

        batch = make_batch_solver(
            opts, in_axes=(None, LeastSquares(0), None, 0, None))
        w, o = _timed(lambda: batch(op, LeastSquares(bs), gt, x0s, tau0),
                      rtt)
        ks = np.asarray(o.iteration_count)
        print(f"tv{hw} batch x{nbatch} vmapped solver: {w*1e3:8.1f} ms = "
              f"{w/nbatch*1e3:6.2f} ms/image ({nbatch/w:5.0f} images/s); "
              f"iters {ks.min()}..{ks.max()}, "
              f"converged={bool(np.all(np.asarray(o.converged)))}")

        # batched whole-solve kernel: vmap lowers to a leading Pallas
        # grid axis — the whole batch is ONE launch (FISTA hp, the
        # single-image to-tol winner)
        def run_bmicro():
            _pv, _tv, _rv, kk, _cv = jax.vmap(
                lambda bi, pi: microsolve_tv(
                    bi, pi, 2.0, ti["mu"], max_iters=mi, tol=1e-5,
                    hp=True, accelerate=True))(bs, x0s)
            return kk
        ksb = np.asarray(run_bmicro())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_bmicro())
            best = min(best, time.perf_counter() - t0)
        wb = max(best - rtt, 1e-9)
        print(f"tv{hw} batch x{nbatch} microsolver FISTA: "
              f"{wb*1e3:8.1f} ms = {wb/nbatch*1e3:6.2f} ms/image "
              f"({nbatch/wb:5.0f} images/s); iters "
              f"{ksb.min()}..{ksb.max()}")

        # recommend_path must pick the measured batch-path winner at
        # this config (the regime map as code — serving.py)
        from fasta_tpu import recommend_path
        plan = recommend_path(probs[0], nbatch)
        measured_best = ("microsolve_batch" if wb / nbatch < w / nbatch
                         else "batch_solver")
        tag = "OK" if plan.path == measured_best else "MISMATCH"
        print(f"tv{hw} recommend_path(batch={nbatch}) -> {plan.path} "
              f"[measured winner: {measured_best}] {tag}")
        # --quick shrinks the batches below the measured configs, where
        # the crossover genuinely moves — only the full run asserts
        assert quick or plan.path == measured_best, (
            f"regime map stale at tv{hw} batch {nbatch}: recommended "
            f"{plan.path}, measured winner {measured_best} — re-tune "
            f"serving.BATCH_CROSSOVER_UNKNOWNS")

    # ---- planar PhaseMax flagship serving (16384x256) ------------------
    # New row 2026-08-20: the rowt kernel cut the single solve to
    # ~2.4 ms — measure the batch paths at the flagship shape (n=512
    # unknowns, far below the TV-derived crossover, where the regime
    # map currently predicts the vmapped XLA batch solver).
    from fasta_tpu.kernels.microsolver_planar import \
        microsolve_planar_phasemax
    from fasta_tpu.terms import PlanarPhaseHinge

    ppr = problems.build("phase_retrieval", planar=True,
                         dtype=jnp.float32)
    Bp = 4 if quick else 16
    mi_p = 300
    bp = jnp.asarray(ppr.fterm.b, jnp.float32)
    bsp = jnp.stack([bp * (1.0 + 0.002 * i) for i in range(Bp)])
    x0p = jnp.asarray(ppr.x0, jnp.float32)
    x0ps = jnp.stack([x0p] * Bp)
    Arp = jnp.asarray(ppr.op.Ar, jnp.float32)
    Aip = jnp.asarray(ppr.op.Ai, jnp.float32)
    cp = jnp.asarray(ppr.gterm.c, jnp.float32)

    def run_bp():
        out = jax.vmap(
            lambda bi, xi: microsolve_planar_phasemax(
                Arp, Aip, bi, cp, xi, 1.0, max_iters=mi_p, tol=1e-5,
                hp=True))(bsp, x0ps)
        return out[3]                       # iteration counts
    ksp = np.asarray(run_bp())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_bp())
        best = min(best, time.perf_counter() - t0)
    wbp = max(best - rtt, 1e-9)
    print(f"pr16384 batch x{Bp} microsolver: {wbp*1e3:8.1f} ms = "
          f"{wbp/Bp*1e3:6.2f} ms/solve ({Bp/wbp:5.0f} solves/s); "
          f"iters {ksp.min()}..{ksp.max()}")

    opts_p = FastaOptions(max_iters=mi_p, tol=1e-5, adaptive=True,
                          backtrack=True, precision="standard")
    batchp = make_batch_solver(
        opts_p, in_axes=(None, PlanarPhaseHinge(0), None, 0, None))
    wp, op_ = _timed(lambda: batchp(ppr.op, PlanarPhaseHinge(bsp),
                                    ppr.gterm, x0ps,
                                    jnp.asarray(1.0, jnp.float32)), rtt)
    ksx = np.asarray(op_.iteration_count)
    print(f"pr16384 batch x{Bp} vmapped solver: {wp*1e3:8.1f} ms = "
          f"{wp/Bp*1e3:6.2f} ms/solve ({Bp/wp:5.0f} solves/s); "
          f"iters {ksx.min()}..{ksx.max()}")

    from fasta_tpu import recommend_path as _rp
    planp = _rp(ppr, Bp)
    measured_p = ("microsolve_batch" if wbp / Bp < wp / Bp
                  else "batch_solver")
    tagp = "OK" if planp.path == measured_p else "MISMATCH"
    print(f"pr16384 recommend_path(batch={Bp}) -> {planp.path} "
          f"[measured winner: {measured_p}] {tagp}")


if __name__ == "__main__":
    main()
