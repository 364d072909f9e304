"""Ablation probe: where do the NON-matvec ~1.8 us of the dense
microsolver's 3.2 us iteration go?  (round-3 VERDICT weak #2: the
matvec pair costs ~1.43 us — bf16_matvec_probe — leaving ~55% of each
iteration in the in-kernel tail: window max, O(1) record, residual/
stopping, prox, BB scalars, backtrack cond.)

Method: a cumulative LADDER of kernels, each adding one piece of the
real adaptive plain-mode body (kernels/microsolver.py), timed as K
in-kernel iterations per readback (>=100k per the RTT/chain-length
gotcha).  Ladder:
  L0  fwd + fof + adj               (the compute floor)
  L1  + prox step (shrink) + dx
  L2  + backtracking while_loop     (cond evaluates nd2 + <dx,g>)
  L3  + nonmonotone window (max + fwin update)
  L4  + residual/stopping (hybrid: nd2, sqrt, g.g, sm.sm, maxres)
  L5  + BB stepsize scalars (dg, <dx,dg>, dg.dg, tau select)
  L6  + O(1) tau/res recording      (~ the full shipped body)
plus optimization experiments:
  X1  L6 with the residual side in COLUMN (m,1) layout — removes the
      two lane<->sublane relayouts per matvec pair (see
      planar_matvec_probe.py for the planar version of this finding)
  X2  X1 + nd2/<dx,g> computed once in fb and threaded through
      backtrack -> resid_stop -> BB (no recomputed reductions)

The shipped kernel's own rate at the same iteration count is printed
for ladder fidelity (microsolve_lasso, stop_rule="iterations").

Run on the live TPU:  python benchmarks/micro_tail_probe.py
Interpret-mode check:  ... --check (CPU, small shape, 3 iters)

Measured live 2026-08-20 (K=100k in-kernel iters, 3 runs, RTT 24-26 ms
days; the chip was ~1.2x slower than the 2026-08-19 session — L0 here
is 1.77 us where the bf16 probe measured the bare pair at 1.43 us):

  L0 floor      1.77 us/iter  (565k it/s)
  L1 +prox      +0.02
  L2 +backtrack +0.61   <- the while_loop region itself (cond = 2
                            reduces + branch; carried (1,n) values
                            cross the region boundary)
  L3 +window    +0.01
  L4 +resid     +0.36
  L5 +BB        +1.46   <- the big one
  L6 +record    +0.00
  X1-col        3.68-3.75 us  (relayout-free matvec pair: -0.55)
  X2-+thread    3.62-3.85 us
  X3-vecscal    3.45-3.52 us  (best: all decisions in (1,1) vregs)
  X4-fusedred   3.62 us       (stacked multi-row reduce: WORSE)
  X5-condbt     3.50 us       (cond-wrapped backtrack: = X3)
  shipped       3.54-3.61 us  (same session)

VERDICT: the tail is NOT scalar extracts, recording, or the window —
it is the LATENCY of the serial per-iteration decision chain
(fwd-reduce -> f/adj -> backtrack viol -> BB dots -> tau -> next
x1hat), which no structural variant shortened by more than ~4% over
the shipped kernel (X3 3.45 vs shipped 3.54 us, within session noise;
L6 itself drifted 4.23-4.70 us between runs).  The round-3 VERDICT's
>=450k it/s target is UNREACHABLE for this algorithm on this chip:
the zero-tail floor is 565k and any faithful nonmonotone-backtracking
+ BB iteration must serialize its decision chain against the next
matvec.  The shipped kernel stands within ~2-4% of the best of nine
structural variants; left unchanged (churn without measurable gain).
Do not revisit without new hardware or a changed algorithm contract.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHECK = "--check" in sys.argv
if CHECK:
    jax.config.update("jax_platforms", "cpu")

M, N, K = (128, 256, 3) if CHECK else (1000, 2000, 100_000)
WPAD = 128
WINDOW = 10
MU = 0.1
TAU0 = 0.05
SHRINKF = 0.2
MAXBT = 20


def make(level, col=False, thread=False, vecscal=False, fusedred=False,
         condbt=False, interpret=False):
    """Ladder kernel at `level` (0..6); col/thread/vecscal = X-variants.

    vecscal (implies col+thread): every reduction keeps dims — nd2, f,
    dots, tau, res all live as (1,1) VREG values and the decision math
    (backtrack sufficient-decrease, BB select, stopping) runs on the
    VPU; the only vreg->sreg extracts per iteration are the two loop
    conditions (backtrack viol, outer stop).  Hypothesis: the ~8
    scalar extracts per iteration of the shipped kernel serialize the
    loop's critical path (each sum -> sreg -> scalar math -> sreg ->
    vreg splat round trip stalls the vector pipe)."""
    kpad = 128

    def kern_vecscal(A_ref, b_ref, x0_ref, o_ref, taus_ref, res_ref):
        A = A_ref[:]
        b = b_ref[:]                       # (m,1) column
        x0 = x0_ref[:]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, WPAD), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        taus_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)
        res_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)

        def fwd(x):
            return jnp.sum(A * x, axis=1, keepdims=True)       # (m,1)

        def adj(r):
            return jnp.sum(A * r, axis=0, keepdims=True)       # (1,n)

        def rsum(v):
            """Full reduction to a (1,1) vreg value."""
            return jnp.sum(v, keepdims=True).reshape(1, 1)

        def rsum2(va, vb):
            """Two same-shape row reductions fused into ONE (2,n)
            lane-reduce -> two (1,1) values (X4: one reduce chain
            instead of two)."""
            if not fusedred:
                return rsum(va), rsum(vb)
            s = jnp.sum(jnp.concatenate([va, vb], axis=0), axis=1,
                        keepdims=True)                    # (2,1)
            # sublane slices of a column hit Mosaic's unimplemented
            # lane-broadcast; extract scalars instead (2026-08-20)
            return s[0, 0], s[1, 0]

        def rsum4(va, vb, vc, vd):
            if not fusedred:
                return rsum(va), rsum(vb), rsum(vc), rsum(vd)
            s = jnp.sum(jnp.concatenate([va, vb, vc, vd], axis=0),
                        axis=1, keepdims=True)            # (4,1)
            return s[0, 0], s[1, 0], s[2, 0], s[3, 0]

        def fof(d):
            r = d - b
            return 0.5 * rsum(r * r)                           # (1,1)

        def shrink(z, t):
            mag = jnp.abs(z)
            return z * (jnp.maximum(mag - t, 0.0)
                        / jnp.maximum(mag, 1e-30))

        def record(k, tau, res, trow_c, rrow_c):
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            trow_n = jnp.where(lane128 == lane, tau, trow_c)
            rrow_n = jnp.where(lane128 == lane, res, rrow_c)
            taus_ref[pl.ds(row, 1), :] = trow_n
            res_ref[pl.ds(row, 1), :] = rrow_n
            return trow_n, rrow_n

        neg = jnp.full((1, WPAD), -jnp.inf, jnp.float32)
        d0 = fwd(x0)
        f0 = fof(d0)
        g0 = adj(d0 - b)
        fwin0 = jnp.where(lane_w == 0, f0, neg)

        def body(k, c):
            (x_c, g_c, tau_c, fwin_c, maxres_c, trow_c, rrow_c) = c
            M_ = jnp.max(fwin_c, axis=1, keepdims=True)        # (1,1)

            def fb(tau_):
                x1hat = x_c - tau_ * g_c
                x1 = shrink(x1hat, tau_ * MU)
                dx = x1 - x_c
                d1 = fwd(x1)
                nd2, rdg = rsum2(dx * dx, dx * g_c)
                return x1hat, x1, dx, fof(d1), adj(d1 - b), nd2, rdg

            def bt_cond(bc):
                tau_b, f1_b, nd2, rdg = bc[0], bc[4], bc[6], bc[7]
                cnt = bc[-1]
                suff = M_ + rdg + nd2 / (2.0 * tau_b)
                # Mosaic can't squeeze a bool vreg to a scalar — cast
                # to int32 first (the ONE extract per trial)
                viol = (f1_b - 1e-12 > suff).astype(jnp.int32)[0, 0]
                return (viol > 0) & (cnt < MAXBT)

            def bt_body(bc):
                tau_b, *_, cnt = bc
                tau_n = tau_b * SHRINKF
                return (tau_n,) + fb(tau_n) + (cnt + 1,)

            first = (tau_c,) + fb(tau_c) + (jnp.zeros((), jnp.int32),)
            if condbt:
                # X5: the hot path evaluates ONE trial + the violation
                # test; the while_loop region only exists behind a
                # rarely-taken branch (identical trial sequence)
                out = jax.lax.cond(
                    bt_cond(first),
                    lambda fs: jax.lax.while_loop(bt_cond, bt_body,
                                                  bt_body(fs)),
                    lambda fs: fs, first)
            else:
                out = jax.lax.while_loop(bt_cond, bt_body, first)
            tau, x1hat, x1, dx, f1, g1, nd2, _rdg = out[:8]

            res = jnp.sqrt(nd2) / tau                          # (1,1)
            maxres = jnp.maximum(maxres_c, res)
            sm = x1 - x1hat

            dg = g1 + (x1hat - x_c) / tau
            dotprod, ndg2, gg_, ss_ = rsum4(dx * dg, dg * dg,
                                            g_c * g_c, sm * sm)
            tau_s = jnp.where(dotprod != 0.0, nd2 / dotprod, jnp.inf)
            tau_m = jnp.maximum(
                jnp.where(ndg2 > 0.0, dotprod / ndg2, 0.0), 0.0)
            tau_n = jnp.where(2.0 * tau_m > tau_s, tau_m,
                              tau_s - 0.5 * tau_m)
            bad = (tau_n <= 0.0) | jnp.isinf(tau_n) | jnp.isnan(tau_n)
            tau_n = jnp.where(bad, tau * 1.5, tau_n)           # (1,1)

            normalizer = jnp.maximum(jnp.sqrt(gg_),
                                     jnp.sqrt(ss_) / tau) + 1e-8
            nres = res / normalizer
            stop = ((res / (maxres + 1e-8) < -1.0)
                    | (nres < -1.0))                           # (1,1)

            fwin_n = jnp.where(lane_w == (k + 1) % WINDOW, f1, fwin_c)
            trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)

            # keep the stop consumption fully vectorized (no extract):
            # a (1,1) f32 broadcasts across the (1,n) row
            x_n = x0 + 0.0 * x1 + 0.0 * stop.astype(jnp.float32)
            return (x_n, g1, tau_n, fwin_n, maxres, trow_n, rrow_n)

        init = (x0, g0, jnp.full((1, 1), TAU0, jnp.float32), fwin0,
                jnp.zeros((1, 1), jnp.float32),
                jnp.zeros((1, 128), jnp.float32),
                jnp.zeros((1, 128), jnp.float32))
        fin = jax.lax.fori_loop(0, K, body, init)
        o_ref[:] = fin[0] + 0.0 * fin[1]

    def kern(A_ref, b_ref, x0_ref, o_ref, taus_ref, res_ref):
        A = A_ref[:]
        b = b_ref[:]                       # (1,m) row or (m,1) column
        x0 = x0_ref[:]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, WPAD), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        taus_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)
        res_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)

        if col:
            def fwd(x):
                return jnp.sum(A * x, axis=1, keepdims=True)   # (m,1)

            def adj(r):
                return jnp.sum(A * r, axis=0, keepdims=True)   # (1,n)
        else:
            def fwd(x):
                return jnp.sum(A * x, axis=1).reshape(1, M)

            def adj(r):
                return jnp.sum(A * r.reshape(M, 1),
                               axis=0).reshape(1, N)

        def fof(d):
            r = d - b
            return 0.5 * jnp.sum(r * r)

        def shrink(z, t):
            mag = jnp.abs(z)
            return z * (jnp.maximum(mag - t, 0.0)
                        / jnp.maximum(mag, 1e-30))

        def record(k, tau, res, trow_c, rrow_c):
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            trow_n = jnp.where(lane128 == lane, tau, trow_c)
            rrow_n = jnp.where(lane128 == lane, res, rrow_c)
            taus_ref[pl.ds(row, 1), :] = trow_n
            res_ref[pl.ds(row, 1), :] = rrow_n
            return trow_n, rrow_n

        neg = jnp.full((1, WPAD), -jnp.inf, jnp.float32)
        d0 = fwd(x0)
        f0 = fof(d0)
        g0 = adj(d0 - b)
        fwin0 = jnp.where(lane_w == 0, f0, neg)

        def body(k, c):
            (x_c, g_c, tau_c, fwin_c, maxres_c, trow_c, rrow_c) = c
            tau = tau_c

            if level >= 2:
                M_ = jnp.max(fwin_c) if level >= 3 else jnp.inf

                def fb(tau_):
                    x1hat = x_c - tau_ * g_c
                    x1 = shrink(x1hat, tau_ * MU)
                    dx = x1 - x_c
                    d1 = fwd(x1)
                    if thread:
                        nd2 = jnp.sum(dx * dx)
                        rdg = jnp.sum(dx * g_c)
                        return (x1hat, x1, dx, fof(d1), adj(d1 - b),
                                nd2, rdg)
                    return x1hat, x1, dx, fof(d1), adj(d1 - b)

                def bt_cond(bc):
                    tau_b = bc[0]
                    dx_b, f1_b = bc[3], bc[4]
                    cnt = bc[-1]
                    if thread:
                        nd2 = bc[6]
                        rdg = bc[7]
                    else:
                        nd2 = jnp.sum(dx_b * dx_b)
                        rdg = jnp.sum(dx_b * g_c)
                    suff = M_ + rdg + nd2 / (2.0 * tau_b)
                    return (f1_b - 1e-12 > suff) & (cnt < MAXBT)

                def bt_body(bc):
                    tau_b, *_, cnt = bc
                    tau_n = tau_b * SHRINKF
                    return (tau_n,) + fb(tau_n) + (cnt + 1,)

                out = jax.lax.while_loop(
                    bt_cond, bt_body,
                    (tau,) + fb(tau) + (jnp.zeros((), jnp.int32),))
                if thread:
                    tau, x1hat, x1, dx, f1, g1, nd2, rdg = out[:8]
                else:
                    tau, x1hat, x1, dx, f1, g1 = out[:6]
                    nd2 = None
            else:
                x1hat = x_c - tau * g_c
                if level >= 1:
                    x1 = shrink(x1hat, tau * MU)
                else:
                    x1 = x_c
                dx = x1 - x_c
                d1 = fwd(x1)
                f1 = fof(d1)
                g1 = adj(d1 - b)
                nd2 = None

            if level >= 3:
                fwin_n = jnp.where(lane_w == (k + 1) % WINDOW, f1,
                                   fwin_c)
            else:
                fwin_n = fwin_c

            if level >= 4:
                if nd2 is None:
                    nd2 = jnp.sum(dx * dx)
                res = jnp.sqrt(nd2) / tau
                maxres = jnp.maximum(maxres_c, res)
                sm = x1 - x1hat
                normalizer = jnp.maximum(
                    jnp.sqrt(jnp.sum(g_c * g_c)),
                    jnp.sqrt(jnp.sum(sm * sm)) / tau) + 1e-8
                nres = res / normalizer
                stop = ((res / (maxres + 1e-8) < -1.0)
                        | (nres < -1.0))          # never stops
            else:
                res = f1
                maxres = maxres_c
                stop = jnp.zeros((), jnp.bool_)

            if level >= 5:
                if nd2 is None:
                    nd2 = jnp.sum(dx * dx)
                dg = g1 + (x1hat - x_c) / tau
                dotprod = jnp.sum(dx * dg)
                ndg2 = jnp.sum(dg * dg)
                tau_s = jnp.where(dotprod != 0.0, nd2 / dotprod,
                                  jnp.inf)
                tau_m = jnp.maximum(
                    jnp.where(ndg2 > 0.0, dotprod / ndg2, 0.0), 0.0)
                tau_n = jnp.where(2.0 * tau_m > tau_s, tau_m,
                                  tau_s - 0.5 * tau_m)
                bad = ((tau_n <= 0.0) | jnp.isinf(tau_n)
                       | jnp.isnan(tau_n))
                tau_n = jnp.where(bad, tau * 1.5, tau_n)
            else:
                tau_n = tau

            if level >= 6:
                trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)
            else:
                trow_n, rrow_n = trow_c, rrow_c

            # data-chain to the next iteration without converging: the
            # carry is x0 + 0*x1 (+ stop folded in so nothing is DCE'd)
            x_n = x0 + 0.0 * x1 + 0.0 * jnp.where(stop, 1.0, 0.0)
            return (x_n, g1, tau_n, fwin_n, maxres, trow_n, rrow_n)

        init = (x0, g0, jnp.asarray(TAU0, jnp.float32), fwin0,
                jnp.asarray(-jnp.inf, jnp.float32),
                jnp.zeros((1, 128), jnp.float32),
                jnp.zeros((1, 128), jnp.float32))
        fin = jax.lax.fori_loop(0, K, body, init)
        o_ref[:] = fin[0] + 0.0 * fin[1]

    use_col = col or vecscal

    @jax.jit
    def run(A, b, x0):
        bshape = (M, 1) if use_col else (1, M)
        return pl.pallas_call(
            kern_vecscal if vecscal else kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((kpad // 128, 128), jnp.float32),
                            pltpu.VMEM((kpad // 128, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(100 << 20,
                                     4 * M * N * 4 + (48 << 20)),
            ),
            interpret=interpret,
        )(A, b.reshape(bshape), x0)

    return run


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(M), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)

    variants = [(f"L{i}", dict(level=i)) for i in range(7)]
    variants += [("X1-col", dict(level=6, col=True)),
                 ("X2-col+thread", dict(level=6, col=True, thread=True)),
                 ("X3-vecscal", dict(level=6, vecscal=True)),
                 ("X4-fusedred", dict(level=6, vecscal=True,
                                      fusedred=True)),
                 ("X5-condbt", dict(level=6, vecscal=True, fusedred=True,
                                    condbt=True))]

    if CHECK:
        outs = {}
        for name, kw in variants:
            run = make(interpret=True, **kw)
            outs[name] = np.asarray(run(A, b, x0))
            assert np.all(np.isfinite(outs[name])), name
            print(f"{name}: finite OK (interpret)")
        # the x-variants reorganize layout, not math: same chained output
        np.testing.assert_allclose(outs["X1-col"], outs["L6"], rtol=1e-6)
        np.testing.assert_allclose(outs["X2-col+thread"], outs["L6"],
                                   rtol=1e-6)
        np.testing.assert_allclose(outs["X3-vecscal"], outs["L6"],
                                   rtol=1e-6)
        np.testing.assert_allclose(outs["X4-fusedred"], outs["L6"],
                                   rtol=1e-6)
        np.testing.assert_allclose(outs["X5-condbt"], outs["L6"],
                                   rtol=1e-6)
        print("X-variants bit-class match L6 (interpret)")
        return

    tiny = jax.jit(lambda i: jnp.sum(jnp.zeros(8) + i))
    float(tiny(0))
    rtt = 1e9
    for i in range(1, 4):
        t0 = time.perf_counter(); float(tiny(i))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"# rtt {rtt*1e3:.1f} ms; {K} in-kernel iterations per readback; "
          f"{M}x{N}")

    prev = None
    for name, kw in variants:
        run = make(**kw)
        float(jnp.sum(run(A, b, x0)))     # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(A, b, x0)))
            best = min(best, time.perf_counter() - t0 - rtt)
        us = best / K * 1e6
        delta = "" if prev is None or name.startswith("X") \
            else f"  (+{us - prev:.3f} us)"
        if name.startswith("X"):
            delta = f"  ({prev_l6 / us:.2f}x vs L6)"
        print(f"{name:>14}: {us:7.3f} us/iter  "
              f"({1.0/best*K:,.0f} it/s){delta}")
        if not name.startswith("X"):
            prev = us
        if name == "L6":
            prev_l6 = us

    # shipped-kernel fidelity row
    from fasta_tpu.kernels.microsolver import microsolve_lasso
    kship = min(K, 100_000)

    @jax.jit
    def ship(x0_):
        x, _t, _r, k_, _c = microsolve_lasso(
            A, b, x0_.reshape(N), TAU0, MU, max_iters=kship, tol=0.0,
            stop_rule="iterations")
        return k_
    int(ship(x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); int(ship(x0))
        best = min(best, time.perf_counter() - t0 - rtt)
    print(f"{'shipped':>14}: {best/kship*1e6:7.3f} us/iter  "
          f"({kship/best:,.0f} it/s)  [microsolve_lasso, "
          f"stop_rule=iterations]")


if __name__ == "__main__":
    main()
