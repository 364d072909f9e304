"""On-chip microsolver: the ENTIRE adaptive/FISTA FASTA loop in ONE kernel.

For VMEM-resident problems (dense A up to ~tens of MB — which includes
the BASELINE 1000×2000 LASSO at 8 MB) the jitted XLA loop is bound by
per-iteration kernel-launch and loop overhead, not arithmetic: the chip
could run an iteration in ~10 µs of VMEM traffic but spends several
times that dispatching the ~20 small kernels of the loop body.

This kernel is the logical extreme of fusion: ONE ``pallas_call`` runs
the full solve — matrix pinned in VMEM across ALL iterations, the
while_loop, the prox, the nonmonotone backtracking line search, the
Zhou–Gao–Dai BB stepsize (or FISTA + O'Donoghue–Candès restart with
``accelerate=True``), the hybrid stopping rule and the diagnostics ring
all execute on-core with zero HBM round trips and zero launches per
iteration.  Iteration math is the oracle's, matching the main solver at
f32 (Precision.HIGHEST MXU matvecs); ``hp=True`` runs the decision
scalars (f-values/window, backtracking dot, BB numerator) in in-kernel
double-word f32 — the XLA ``precision="auto"`` analog, with the dd
reduction trees fully vectorized on the VPU (same machinery as
kernels/microsolver_tv.py).

Scope: dense real f32 A, single chip; smooth losses ``loss`` ∈
{"lstsq" ½‖Ax−b‖², "logistic" Σlog(1+exp(Ax))−bᵀAx, "squared_hinge"
½Σmax(0,1−y⊙Ax)²} × prox ``prox`` ∈ {"l1", "nonneg", "box", "ridge"} —
the LASSO/BPDN, NNLS, box-constrained LS, sparse-logistic and SVM
problem families.  The general solver remains the XLA while_loop; this
is the speed-of-light path for VMEM-resident instances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["microsolve_lasso", "microsolve_lasso_path",
           "supports_microsolver"]

_WPAD = 128

STOP_RULES = ("residual", "normalized_residual", "ratio_residual",
              "hybrid_residual", "iterations")


def stop_from_rule(stop_rule, res, nres, maxres, tol):
    """C4 stopping rules, statically selected — the same five rules
    (and the same eps_r=1e-8 convention) as the XLA solver's branch
    (solver.py stopping-rule select); shared by all three whole-solve
    kernels.  ``nres`` may be None when the rule doesn't need the
    normalizer (the caller skips computing it)."""
    if stop_rule == "residual":
        return res < tol
    if stop_rule == "normalized_residual":
        return nres < tol
    if stop_rule == "ratio_residual":
        return res / (maxres + 1e-8) < tol
    if stop_rule == "iterations":
        return jnp.zeros((), jnp.bool_)
    return (res / (maxres + 1e-8) < tol) | (nres < tol)


def check_stop_rule(stop_rule):
    if stop_rule not in STOP_RULES:
        raise ValueError(f"unknown stop_rule {stop_rule!r} "
                         f"(choose from {STOP_RULES})")          # nonmonotone window ring, padded to one lane row


# A (m·n·4 f32) pinned once + the VPU engine's full-matrix broadcast
# temporaries (A*x and A*r are each another (m,n) value) + carry
# vectors and Mosaic stack must fit the kernel's 100 MB VMEM budget
# (the pallas_call provisions 4·|A| + 48 MB, capped at 100 MB) — so the
# matrix itself is bounded at 24 MB.  Oversized problems belong on the
# streaming lstsq_fused path / the XLA loop, and microsolve() raises a
# structured ValueError instead of dying inside the Mosaic compile.
_DENSE_VMEM_BYTES = 24 << 20


def supports_microsolver(m: int, n: int) -> bool:
    """VMEM-residency gate for the dense whole-solve kernel (the
    structure/backed checks live in micro._dispatch / microsolve —
    calling microsolve IS the opt-in, there is no env-var gate)."""
    return m * n * 4 <= _DENSE_VMEM_BYTES


def halt_code(stop, *finite_scalars):
    """Loop-halt status from the stop decision + nonfinite guard (all
    three whole-solve kernels): 0 = keep running, 1 = converged,
    2 = NONFINITE (f/τ/residual went NaN or ±inf — without this, every
    stop-rule comparison is False and the kernel silently burns
    max_iters; the XLA path's guard_nonfinite analog).  The nonfinite
    case wins over a coincidental True stop: a NaN-poisoned residual
    compares False everywhere, so the two are mutually exclusive in
    practice, and a poisoned 'converged' must never be reported."""
    finite = finite_scalars[0]
    for s in finite_scalars[1:]:
        finite = finite & s
    return jnp.where(~finite, jnp.int32(2),
                     jnp.where(stop, jnp.int32(1), jnp.int32(0)))


def _make_kernel(m, n, max_iters, window, tol, shrink_factor,
                 max_backtracks, kpad, engine="vpu", prox="l1",
                 hp=False, accelerate=False, restart=True,
                 restart_dd=False, loss="lstsq",
                 stop_rule="hybrid_residual", record_fvals=False,
                 record_bts=False, record_objs=False, record_its=False,
                 record_nres=False, warm_sweep=False):
    from .. import precision as prec
    from .ddreduce import dd_dot_rows as dd_dot
    from .ddreduce import dd_reduce
    # the normalized residual is only computed when a rule reads it
    # (or when the caller records the series — record_nres)
    need_nres = (stop_rule in ("normalized_residual", "hybrid_residual")
                 or record_nres)
    # warm_sweep: the kernel runs as an EXPLICIT sequential grid over
    # path points (microsolve_lasso_path) — step i>0 starts from step
    # i-1's solution and last accepted stepsize, carried across grid
    # steps in persistent VMEM/SMEM scratch (TPU grid steps execute
    # back-to-back on one core).  This is solve_path's continuation
    # recipe (warm x AND warm tau, same degenerate-tau guard) inside
    # one launch.

    # "vpu" = broadcast-reduce on the vector units (exact f32; the
    # default — a batch-1 GEMV keeps 1/128 of the MXU's rows busy, and
    # the 8x128 VPU formulation measured 4.3-8.2x the MXU kernel on
    # live hardware, 2026-08-19); "mxu" = Precision.HIGHEST dot_general
    # (6-pass exact f32).  (A Precision.HIGH "mxu3" engine was removed:
    # Mosaic has no lowering for HIGH — NotImplementedError on
    # hardware.)
    mxu_prec = jax.lax.Precision.HIGHEST

    def kernel(x0_ref, b_ref, ts_ref, A_ref,
               x_ref, taus_ref, res_ref, fv_ref, bt_ref, obj_ref,
               nres_ref, *rest):
        rest = list(rest)
        # optional HBM iterate-trajectory output precedes the SMEM
        # scalars; its staging scratch + DMA semaphore follow them
        its_ref = rest.pop(0) if record_its else None
        k_ref = rest.pop(0)
        conv_ref = rest.pop(0)
        if record_its:
            xstage = rest.pop(0)
            dma_sem = rest.pop(0)
        if warm_sweep:
            xprev_scr, tprev_scr = rest

        npad = ((n + 127) // 128) * 128

        def record_it(k, x1):
            """record_iterates analog: stage the accepted iterate at
            sublane k%8 of an (8, npad) VMEM buffer and DMA the FULL
            block to the HBM trajectory buffer every 8th iteration —
            Mosaic requires DMA slices tile-aligned in BOTH dims
            ((8, 128); a per-row or non-128-lane copy does not lower),
            so both the stage and the HBM buffer are lane-padded and
            the copy always moves whole blocks.  The final partial
            block is flushed in the epilogue (flush_its); rows >= the
            final k and lanes >= n are garbage and trimmed by the
            caller."""
            c8 = jnp.asarray(8, jnp.int32)      # x64-safe literal
            lane8 = jax.lax.rem(k, c8)
            if npad != n:
                x1 = jnp.concatenate(
                    [x1, jnp.zeros((1, npad - n), jnp.float32)], axis=1)
            xstage[pl.ds(lane8, 1), :] = x1

            @pl.when(lane8 == 7)
            def _flush_full():
                # offset spelled (k//8)*8 — syntactically divisible by
                # the sublane tile, which is what Mosaic's divisibility
                # prover needs ("Failed to prove that a tile index in
                # dimension 0 is divisible by the tiling (8)" for the
                # equivalent k - 7)
                blk = jax.lax.div(k, c8) * 8
                cp = pltpu.make_async_copy(
                    xstage, its_ref.at[pl.ds(blk, 8), :], dma_sem)
                cp.start()
                cp.wait()

        def flush_its(k):
            """Epilogue flush of the last (possibly partial) 8-row
            block; the trajectory buffer is 8-row padded so the block
            write is always in bounds."""
            c8 = jnp.asarray(8, jnp.int32)
            blk = jax.lax.div(jnp.maximum(k - 1, 0), c8) * 8
            cp = pltpu.make_async_copy(
                xstage, its_ref.at[pl.ds(blk, 8), :], dma_sem)
            cp.start()
            cp.wait()
        A = A_ref[:]                       # (m, n) pinned in VMEM
        b = b_ref[:]                       # (1, m)
        # μ is a RUNTIME SMEM scalar (ts_ref[0,1]), not a compile-time
        # constant: one executable serves every penalty weight, and
        # vmapping over it solves a whole regularization path in one
        # launch (the XLA solver's "penalty weights are leaves"
        # invariant, kept in-kernel).  ts is (1,2), NOT (2,): a vmapped
        # (B,2) SMEM operand gets a (1,2) block whose second-to-last
        # dim violates Mosaic's block rule (caught on hardware,
        # 2026-08-19 — passes interpret); (B,1,2) with a full (1,2)
        # trailing block lowers.  Under warm_sweep the (B,1,2) path
        # table arrives with the leading dim None-squeezed off the
        # block, so the ref is the same (1,2) either way.
        mu = ts_ref[0, 1]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, _WPAD), 1)
        # Per-iteration recording is O(1): a (1,128) accumulator row in
        # the carry, flushed to the (kpad//128, 128) output ref at
        # dynamic SUBLANE offset k>>7 every iteration.  Carrying the
        # whole (1, kpad) array and rebuilding it with a lane-select
        # made every iteration pay O(kpad) — measured on hardware as a
        # 295k -> 106k it/s rate decay from max_iters=10k to 200k.
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        taus_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)
        res_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)
        fv_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)
        bt_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)
        obj_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)
        nres_ref[:] = jnp.zeros((kpad // 128, 128), jnp.float32)

        def record(k, tau, res, trow_c, rrow_c):
            c128 = jnp.asarray(128, jnp.int32)   # x64-safe literal
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            trow_n = jnp.where(lane128 == lane, tau, trow_c)
            rrow_n = jnp.where(lane128 == lane, res, rrow_c)
            taus_ref[pl.ds(row, 1), :] = trow_n
            res_ref[pl.ds(row, 1), :] = rrow_n
            return trow_n, rrow_n

        def record_f(k, fv, frow_c):
            """Optional f-value row (C5 parity: fvals[k] = the XLA
            path's f_collapse(f_record)) — a separate flush because in
            FISTA mode f_record is known only after the mode update."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            frow_n = jnp.where(lane128 == lane, fv, frow_c)
            fv_ref[pl.ds(row, 1), :] = frow_n
            return frow_n

        def record_bt(k, bt, btrow_c):
            """Optional backtrack-count row (C5 parity: backtracks[k] =
            line-search trials this iteration, the XLA recorder's
            backtracks field) — same O(1) accumulator-row pattern."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            btrow_n = jnp.where(lane128 == lane,
                                bt.astype(jnp.float32), btrow_c)
            bt_ref[pl.ds(row, 1), :] = btrow_n
            return btrow_n

        def record_obj(k, ov, orow_c):
            """Optional objective row (C5 parity: objectives[k] =
            f(x1) + g(x1) at the PROX point — solver.py's
            record_objective formula; g is analytic per prox family,
            see gval)."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            orow_n = jnp.where(lane128 == lane, ov, orow_c)
            obj_ref[pl.ds(row, 1), :] = orow_n
            return orow_n

        def record_nr(k, nv, nrow_c):
            """Optional normalized-residual row (the last FastaResult
            series: norm_residuals[k] = res/normalizer, resid_stop's
            nres — need_nres is forced on when recording)."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            nrow_n = jnp.where(lane128 == lane, nv, nrow_c)
            nres_ref[pl.ds(row, 1), :] = nrow_n
            return nrow_n

        def f_plain(f):
            return prec.dd_to_float(f) if hp else f

        def fwd(x):
            """d = x Aᵀ : (1,n)·(m,n)ᵀ → (1,m)."""
            if engine == "vpu":
                # GEMV wastes 127/128 MXU rows; the VPU broadcast+reduce
                # formulation avoids the multi-pass MXU latency.
                return jnp.sum(A * x, axis=1).reshape(1, m)
            return jax.lax.dot_general(
                x, A, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_prec)

        def adj(r):
            """g = r A : (1,m)·(m,n) → (1,n)."""
            if engine == "vpu":
                return jnp.sum(A * r.reshape(m, 1), axis=0).reshape(1, n)
            return jax.lax.dot_general(
                r, A, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_prec)

        if loss == "lstsq":
            def fof(d):
                """f(d) = ½‖d − b‖² (dd under hp)."""
                r = d - b
                if hp:
                    p_, e_ = prec.two_prod(r, r)
                    return prec.dd_scale(dd_reduce(p_, e_), 0.5)
                return 0.5 * jnp.sum(r * r)

            def lgrad(d):
                return d - b
        elif loss == "logistic":
            # stable Σ log(1+exp(d)) − bᵀd (terms.Logistic formulas);
            # hp mirrors value_parts = (ℓ, 0) through the dd tree
            def fof(d):
                ell = (jnp.maximum(d, 0.0)
                       + jnp.log1p(jnp.exp(-jnp.abs(d))) - b * d)
                if hp:
                    return dd_reduce(ell, jnp.zeros_like(ell))
                return jnp.sum(ell)

            def lgrad(d):
                return 1.0 / (1.0 + jnp.exp(-d)) - b
        elif loss == "squared_hinge":
            # ½ Σ max(0, 1 − y⊙d)² with labels y ≡ b (terms.SquaredHinge)
            def fof(d):
                r = jnp.maximum(0.0, 1.0 - b * d)
                if hp:
                    p_, e_ = prec.two_prod(r, r)
                    return prec.dd_scale(dd_reduce(p_, e_), 0.5)
                return 0.5 * jnp.sum(r * r)

            def lgrad(d):
                return -b * jnp.maximum(0.0, 1.0 - b * d)
        else:                              # pragma: no cover
            raise ValueError(f"unknown loss {loss!r}")

        def f_hi(f):
            return f.hi if hp else f

        if prox == "l1":
            def shrink(z, t):
                mag = jnp.abs(z)
                return z * (jnp.maximum(mag - t, 0.0)
                            / jnp.maximum(mag, 1e-30))

            def gval(x):
                return mu * jnp.sum(jnp.abs(x))
        elif prox == "nonneg":
            def shrink(z, t):
                return jnp.maximum(z, 0.0)

            def gval(x):                   # indicator: 0 on the set
                return jnp.zeros((), jnp.float32)
        elif prox == "box":
            def shrink(z, t):
                return jnp.clip(z, -1.0, 1.0)

            def gval(x):                   # indicator: 0 on the set
                return jnp.zeros((), jnp.float32)
        elif prox == "ridge":
            def shrink(z, t):
                return z / (1.0 + t)           # t = τ·λ (mu carries λ)

            def gval(x):                       # (λ/2)‖x‖², mu carries λ
                return 0.5 * mu * jnp.sum(x * x)
        else:                              # pragma: no cover
            raise ValueError(f"unknown prox {prox!r}")

        if warm_sweep:
            # step i>0 continues from step i-1's solution (the scratch
            # reads are garbage at step 0 and fully masked by the
            # selects).  tau continuation is mode-dependent (the
            # solve_path rule, solver.py): BB/adaptive re-estimates tau
            # from the first secant so the carried last-accepted tau is
            # warm and safe; FISTA's tau is monotone non-increasing, so
            # an endgame-shrunk carry compounds across path points
            # (measured 15x the cold iteration count) — accelerate
            # warm-starts x ONLY and resets tau to the caller's tau0.
            i = pl.program_id(0)
            x0 = jnp.where(i > 0, xprev_scr[:], x0_ref[:])
            if accelerate:
                tau0 = ts_ref[0, 0]
            else:
                tprev = tprev_scr[0, 0]
                tau0 = jnp.where((i > 0) & (tprev > 0.0), tprev,
                                 ts_ref[0, 0])
        else:
            x0 = x0_ref[:]                 # (1, n)
            tau0 = ts_ref[0, 0]
        d0 = fwd(x0)
        f0 = fof(d0)
        g0 = adj(lgrad(d0))
        neg = jnp.full((1, _WPAD), -jnp.inf, jnp.float32)
        fwin = jnp.where(lane_w == 0, f_hi(f0), neg)
        fwin_lo = (jnp.where(lane_w == 0, f0.lo,
                             jnp.zeros((1, _WPAD), jnp.float32)) if hp
                   else None)

        def cond(c):
            # c[1] is the int32 halt status (see halt_code): 0 keeps
            # running, 1 = converged, 2 = nonfinite abort
            return (c[0] < max_iters) & (c[1] == 0)

        def window_max(fwin_c, fwlo_c):
            """Nonmonotone window max M (hp: lo-channel tiebreak —
            solver.py / precision.dd_max semantics)."""
            if hp:
                mhi = jnp.max(fwin_c)
                mlo = jnp.max(jnp.where(fwin_c == mhi, fwlo_c, -jnp.inf))
                return prec.DD(mhi, mlo)
            return jnp.max(fwin_c)

        def backtrack(fb, first, tau, g_c, M):
            """Zhang–Hager nonmonotone line search over fb trials.
            A mode's fb(tau) returns (x1hat, x1, dx, f1, *rest) — the
            first four slots are fixed so bt_cond can read dx/f1
            positionally."""
            def bt_cond(bc):
                tau_b = bc[0]
                dx_b, f1_b = bc[3], bc[4]
                cnt = bc[-1]
                nd2 = jnp.sum(dx_b * dx_b)
                if hp:
                    # slack from the CURRENT trial's f1 (solver.py
                    # bt_cond — f32 storage means the true f can exceed
                    # the window by O(eps32)·scale)
                    slack = 1e-12 + (64.0 * 1.1920929e-07) \
                        * (jnp.abs(M.hi)
                           + jnp.abs(prec.dd_to_float(f1_b)))
                    rdg = dd_dot(dx_b, g_c)
                    suff = prec.dd_add(M, prec.dd_add(
                        rdg, prec.dd(nd2 / (2.0 * tau_b))))
                    viol = prec.dd_to_float(
                        prec.dd_sub(f1_b, suff)) > slack
                else:
                    suff = (M + jnp.sum(dx_b * g_c)
                            + nd2 / (2.0 * tau_b))
                    viol = f1_b - 1e-12 > suff
                return viol & (cnt < max_backtracks)

            def bt_body(bc):
                tau_b, *_, cnt = bc
                tau_n = tau_b * shrink_factor
                return (tau_n,) + fb(tau_n) + (cnt + 1,)

            out = jax.lax.while_loop(
                bt_cond, bt_body,
                (tau,) + first + (jnp.zeros((), jnp.int32),))
            # the trial counter stays in the return so warm_sweep can
            # tell a genuinely ACCEPTED stepsize from a forced one
            # (count exhausted): at exact convergence dx == 0 and no
            # decrease is possible, so the final iteration shrinks tau
            # all the way to tau0*shrink^max_backtracks — carrying THAT
            # into the next path point strands a FISTA solve (tau is
            # monotone non-increasing there) at a dead stepsize
            return out

        def resid_stop(tau, x1, x1hat, dx, g_c, maxres_c):
            """Gradient-map residual + selectable stopping (oracle C4)."""
            nd2 = jnp.sum(dx * dx)
            res = jnp.sqrt(nd2) / tau
            maxres = jnp.maximum(maxres_c, res)
            if need_nres:
                sm = x1 - x1hat
                normalizer = jnp.maximum(
                    jnp.sqrt(jnp.sum(g_c * g_c)),
                    jnp.sqrt(jnp.sum(sm * sm)) / tau) + 1e-8
                nres = res / normalizer
            else:
                nres = None
            stop = stop_from_rule(stop_rule, res, nres, maxres, tol)
            return nd2, res, nres, maxres, stop

        if accelerate:
            def body(c):
                if warm_sweep:
                    *c, _tacc_c = c
                if record_nres:
                    *c, nrow_c = c
                if record_objs:
                    *c, orow_c = c
                if record_bts:
                    *c, btrow_c = c
                if record_fvals:
                    *c, frow_c = c
                else:
                    frow_c = None
                (k, _halt, y_c, g_c, tau_c, fwin_c, fwlo_c, maxres_c,
                 trow_c, rrow_c, xa_c, dacc_c, alpha_c) = c

                def fb(tau):
                    x1hat = y_c - tau * g_c
                    x1 = shrink(x1hat, tau * mu)
                    dx = x1 - y_c
                    d1 = fwd(x1)
                    # no adjoint during trials: accel needs ∇f̃ only at
                    # the extrapolated point, after acceptance
                    return x1hat, x1, dx, fof(d1), d1

                tau = tau_c
                first = fb(tau)
                M = window_max(fwin_c, fwlo_c)
                tau, x1hat, x1, dx, f1, d1, bt = backtrack(
                    fb, first, tau, g_c, M)

                _nd2, res, nres, maxres, stop = resid_stop(
                    tau, x1, x1hat, dx, g_c, maxres_c)
                trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)
                if record_its:
                    record_it(k, x1)

                # O'Donoghue–Candès gradient restart (plain-f32 sign
                # test by default; restart_dd mirrors solver.py's dd
                # restart dot bit-for-bit)
                if hp and restart_dd:
                    rdot = prec.dd_to_float(dd_dot(y_c - x1, x1 - xa_c))
                else:
                    rdot = jnp.sum((y_c - x1) * (x1 - xa_c))
                alpha0 = (jnp.where(rdot > 0.0, 1.0, alpha_c)
                          if restart else alpha_c)
                alpha1 = (1.0
                          + jnp.sqrt(1.0 + 4.0 * alpha0 * alpha0)) / 2.0
                beta = (alpha0 - 1.0) / alpha1
                y_n = x1 + beta * (x1 - xa_c)
                d_n = d1 + beta * (d1 - dacc_c)     # A is linear
                g_n = adj(lgrad(d_n))
                f_n = fof(d_n)
                # the window records f at the NEXT search point (the
                # extrapolated y) — oracle/solver.py semantics; on a
                # converged stop the prox-point value is recorded
                if hp:
                    f_rec = prec.dd_where(stop, f1, f_n)
                    fwlo_n = jnp.where(lane_w == (k + 1) % window,
                                       f_rec.lo, fwlo_c)
                else:
                    f_rec = jnp.where(stop, f1, f_n)
                    fwlo_n = None
                fwin_n = jnp.where(lane_w == (k + 1) % window,
                                   f_hi(f_rec), fwin_c)

                halt = halt_code(stop, jnp.isfinite(res),
                                 jnp.isfinite(tau),
                                 jnp.isfinite(f_hi(f_rec)))
                out = (k + 1, halt, y_n, g_n, tau, fwin_n, fwlo_n,
                       maxres, trow_n, rrow_n, x1, d1, alpha1)
                if record_fvals:
                    out += (record_f(k, f_plain(f_rec), frow_c),)
                if record_bts:
                    out += (record_bt(k, bt, btrow_c),)
                if record_objs:
                    # prox-point objective (f1 at x1, pre-extrapolation
                    # — solver.py's record_objective formula)
                    out += (record_obj(k, f_plain(f1) + gval(x1),
                                       orow_c),)
                if record_nres:
                    out += (record_nr(k, nres, nrow_c),)
                if warm_sweep:
                    # last genuinely ACCEPTED stepsize — a backtrack-
                    # exhausted tau (typical of the final converged
                    # iteration, where dx == 0 forbids decrease) keeps
                    # the previous carry instead
                    out += (jnp.where(bt < max_backtracks, tau,
                                      _tacc_c),)
                return out

            init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    x0, g0, tau0, fwin, fwin_lo,
                    jnp.asarray(-jnp.inf, jnp.float32),
                    jnp.zeros((1, 128), jnp.float32),
                    jnp.zeros((1, 128), jnp.float32),
                    x0, d0, jnp.asarray(1.0, jnp.float32))
            if record_fvals:
                init += (jnp.zeros((1, 128), jnp.float32),)
            if record_bts:
                init += (jnp.zeros((1, 128), jnp.float32),)
            if record_objs:
                init += (jnp.zeros((1, 128), jnp.float32),)
            if record_nres:
                init += (jnp.zeros((1, 128), jnp.float32),)
            if warm_sweep:
                init += (jnp.zeros((), jnp.float32),)
            fin = jax.lax.while_loop(cond, body, init)
            (k, halt, y_f, _g, _tau, _fw, _fwlo, _mr, _tr, _rr,
             xa_f, _d, _a) = fin[:13]

            # a converged stop exits at the prox iterate; max-iters
            # exhaustion returns the extrapolated point (oracle break
            # semantics, solver.py solution select)
            sol = jnp.where(halt == 1, xa_f, y_f)
            x_ref[:] = sol
            k_ref[0, 0] = k
            conv_ref[0, 0] = halt
            if record_its:
                flush_its(k)
            if warm_sweep:
                tau_acc = fin[-1]
                # a nonfinite abort must not poison the NEXT path
                # point: fall back to the caller's cold start/stepsize
                ok = halt != 2
                xprev_scr[:] = jnp.where(ok, sol, x0_ref[:])
                # solve_path's degenerate guard: keep the carried tau
                # when the solve died at 0 iterations / dead stepsize
                tprev_scr[0, 0] = jnp.where(
                    ok & (k > 0) & (tau_acc > 0.0), tau_acc, tau0)
            return

        def body(c):
            if warm_sweep:
                *c, _tacc_c = c
            if record_nres:
                *c, nrow_c = c
            if record_objs:
                *c, orow_c = c
            if record_bts:
                *c, btrow_c = c
            if record_fvals:
                *c, frow_c = c
            else:
                frow_c = None
            (k, _halt, x_c, g_c, tau_c, fwin_c, fwlo_c, maxres_c,
             trow_c, rrow_c) = c

            def fb(tau):
                x1hat = x_c - tau * g_c
                x1 = shrink(x1hat, tau * mu)
                dx = x1 - x_c
                d1 = fwd(x1)
                return x1hat, x1, dx, fof(d1), adj(lgrad(d1))

            tau = tau_c
            first = fb(tau)
            M = window_max(fwin_c, fwlo_c)
            tau, x1hat, x1, dx, f1, g1, bt = backtrack(
                fb, first, tau, g_c, M)

            nd2, res, nres, maxres, stop = resid_stop(
                tau, x1, x1hat, dx, g_c, maxres_c)
            trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)
            if record_its:
                record_it(k, x1)
            fwin_n = jnp.where(lane_w == (k + 1) % window, f_hi(f1),
                               fwin_c)
            fwlo_n = (jnp.where(lane_w == (k + 1) % window, f1.lo,
                                fwlo_c) if hp else None)

            # BB (Zhou–Gao–Dai hybrid); ⟨Δx,Δg⟩ cancels near
            # convergence → dd under hp (solver.py semantics)
            dg = g1 + (x1hat - x_c) / tau
            if hp:
                dotprod = prec.dd_to_float(dd_dot(dx, dg))
            else:
                dotprod = jnp.sum(dx * dg)
            ndg2 = jnp.sum(dg * dg)
            tau_s = jnp.where(dotprod != 0.0, nd2 / dotprod, jnp.inf)
            tau_m = jnp.maximum(
                jnp.where(ndg2 > 0.0, dotprod / ndg2, 0.0), 0.0)
            tau_n = jnp.where(2.0 * tau_m > tau_s, tau_m,
                              tau_s - 0.5 * tau_m)
            bad = (tau_n <= 0.0) | jnp.isinf(tau_n) | jnp.isnan(tau_n)
            tau_n = jnp.where(bad, tau * 1.5, tau_n)

            halt = halt_code(stop, jnp.isfinite(res),
                             jnp.isfinite(tau_n),
                             jnp.isfinite(f_hi(f1)))
            out = (k + 1, halt, x1, g1, tau_n, fwin_n, fwlo_n, maxres,
                   trow_n, rrow_n)
            if record_fvals:
                out += (record_f(k, f_plain(f1), frow_c),)
            if record_bts:
                out += (record_bt(k, bt, btrow_c),)
            if record_objs:
                out += (record_obj(k, f_plain(f1) + gval(x1), orow_c),)
            if record_nres:
                out += (record_nr(k, nres, nrow_c),)
            if warm_sweep:
                # genuinely accepted only — see the accelerate body
                out += (jnp.where(bt < max_backtracks, tau, _tacc_c),)
            return out

        init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                x0, g0, tau0, fwin, fwin_lo,
                jnp.asarray(-jnp.inf, jnp.float32),
                jnp.zeros((1, 128), jnp.float32),
                jnp.zeros((1, 128), jnp.float32))
        if record_fvals:
            init += (jnp.zeros((1, 128), jnp.float32),)
        if record_bts:
            init += (jnp.zeros((1, 128), jnp.float32),)
        if record_objs:
            init += (jnp.zeros((1, 128), jnp.float32),)
        if record_nres:
            init += (jnp.zeros((1, 128), jnp.float32),)
        if warm_sweep:
            init += (jnp.zeros((), jnp.float32),)
        fin = jax.lax.while_loop(cond, body, init)
        (k, halt, x_f, _gf, _tauf, _fw, _fwlo, _mr, _tr,
         _rr) = fin[:10]

        x_ref[:] = x_f
        k_ref[0, 0] = k
        conv_ref[0, 0] = halt
        if record_its:
            flush_its(k)
        if warm_sweep:
            tau_acc = fin[-1]
            ok = halt != 2          # see the accelerate epilogue
            xprev_scr[:] = jnp.where(ok, x_f, x0_ref[:])
            tprev_scr[0, 0] = jnp.where(ok & (k > 0) & (tau_acc > 0.0),
                                        tau_acc, tau0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "window", "tol", "shrink_factor",
                     "max_backtracks", "interpret", "engine", "prox",
                     "hp", "accelerate", "restart", "restart_dd", "loss",
                     "stop_rule", "record_fvals", "record_bts",
                     "record_objs", "record_its", "record_nres"))
def microsolve_lasso(A, b, x0, tau0, mu, max_iters=1000, window=10,
                     tol=1e-3, shrink_factor=0.2, max_backtracks=20,
                     interpret=False, engine="vpu", prox="l1",
                     hp=False, accelerate=False, restart=True,
                     restart_dd=False, loss="lstsq",
                     stop_rule="hybrid_residual", record_fvals=False,
                     record_bts=False, record_objs=False,
                     record_its=False, record_nres=False):
    """Whole-solve kernel for  min f(Ax) + g(x)  with f selected by
    ``loss``: "lstsq" (½‖·−b‖²), "logistic" (Σlog(1+exp(·))−bᵀ·, labels
    b ∈ {0,1}) or "squared_hinge" (½Σmax(0,1−b⊙·)², labels b ∈ {±1});
    g selected by ``prox``: "l1" (μ‖·‖₁ — LASSO/BPDN/sparse logistic),
    "nonneg" (NNLS), "box" ([−1,1] indicator) or "ridge" ((μ/2)‖·‖² —
    SVM; μ carries λ).

    ``accelerate=True`` runs FISTA with O'Donoghue–Candès gradient
    restart instead of the BB stepsize; the extrapolated point's
    d = A·y rides the affine d₁ + β(d₁ − d₀) combination (A linear —
    oracle fasta_numpy.py accel branch), so each iteration costs one
    forward matvec per trial plus one adjoint.  ``hp=True`` runs the
    decision scalars in in-kernel double-word f32 (vectorized VPU
    reduction rows — no extra dispatches), matching the XLA solver's
    ``precision="auto"`` path; ``restart_dd=True`` additionally mirrors
    its dd restart dot.

    ``stop_rule`` selects among the XLA solver's five C4 rules
    (default "hybrid_residual" — oracle-identical formulas);
    ``record_fvals=True`` additionally records the per-iteration
    f-value (the XLA recorder's f_record semantics: the accepted
    trial's f in adaptive mode, f at the next search point under
    FISTA) and appends it to the return tuple; ``record_bts=True``
    records line-search trial counts per iteration (the recorder's
    backtracks field) and appends them after fvals;
    ``record_objs=True`` records the prox-point objective
    f(x₁) + g(x₁) per iteration (solver.py's record_objective formula
    — g analytic per prox family) and appends it after bts;
    ``record_its=True`` records the full ITERATE TRAJECTORY — each
    accepted x₁ is DMA'd from a VMEM staging row to an HBM
    (max_iters, n) buffer inside the loop (record_iterates analog;
    rows at indices ≥ the final iteration count are uninitialized —
    slice to [:k]) and appends it after objs.

    Returns (x, taus[max_iters], residuals[max_iters], iteration_count,
    status) — plus fvals[max_iters] when ``record_fvals``, plus
    bts[max_iters] (f32 counts) when ``record_bts``, plus
    objs[max_iters] when ``record_objs``, plus its[(max_iters, n)]
    when ``record_its``.  ``status`` is an
    int32 halt code, truthiness-compatible with the old converged bool:
    0 = max_iters exhausted, 1 = converged, 2 = NONFINITE abort (f/τ/
    residual went NaN/inf; see halt_code — without the in-kernel guard
    a poisoned solve silently burned max_iters with converged=False).
    """
    check_stop_rule(stop_rule)
    m, n = A.shape
    kpad = ((max_iters + 127) // 128) * 128
    kern = _make_kernel(m, n, max_iters, window, tol, shrink_factor,
                        max_backtracks, kpad, engine, prox, hp,
                        accelerate, restart, restart_dd, loss,
                        stop_rule, record_fvals, record_bts,
                        record_objs, record_its, record_nres)
    # τ₀ and μ ride the SMEM scalar vector: μ is a traced leaf (one
    # executable per option set serves every penalty weight; vmap over
    # it = in-kernel regularization path).  Shape (1,2) — see the
    # kernel comment on Mosaic's batched-SMEM block rule.
    ts = jnp.stack([jnp.asarray(tau0, jnp.float32),
                    jnp.asarray(mu, jnp.float32)]).reshape(1, 2)
    rows = jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_specs = [vspec, vspec, vspec, vspec, vspec, vspec, vspec]
    out_shape = [jax.ShapeDtypeStruct((1, n), jnp.float32),
                 rows, rows, rows, rows, rows, rows]
    scratch = []
    kitpad = max(((max_iters + 7) // 8) * 8, 8)
    if record_its:
        # iterate trajectory lives in HBM (compiler-placed ANY), filled
        # by 8-row-block DMAs from a VMEM staging buffer (Mosaic's DMA
        # sublane-tile alignment — see record_it); 8-row padded so the
        # epilogue's partial-block flush stays in bounds
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((kitpad, ((n + 127) // 128) * 128),
                                 jnp.float32))
        npad = ((n + 127) // 128) * 128
        scratch = [pltpu.VMEM((8, npad), jnp.float32),
                   pltpu.SemaphoreType.DMA(())]
    out_specs += [sspec, sspec]                 # k, status
    out_shape += [jax.ShapeDtypeStruct((1, 1), jnp.int32),
                  jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    res_all = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x0 (1,n)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b (1,m)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),      # A (m,n)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # A + loop-carried vectors + compiler temporaries; v5e VMEM
            # is 128 MB, leave headroom for the runtime
            vmem_limit_bytes=min(100 << 20, 4 * m * n * 4 + (48 << 20)),
        ),
        interpret=interpret,
    )(x0.reshape(1, n), b.reshape(1, m), ts, A)
    x, taus, res, fv, bts, objs, nrs = res_all[:7]
    its = res_all[7] if record_its else None
    k, conv = res_all[-2], res_all[-1]
    out = (x.reshape(n), taus.reshape(kpad)[:max_iters],
           res.reshape(kpad)[:max_iters], k[0, 0], conv[0, 0])
    if record_fvals:
        out += (fv.reshape(kpad)[:max_iters],)
    if record_bts:
        out += (bts.reshape(kpad)[:max_iters],)
    if record_objs:
        out += (objs.reshape(kpad)[:max_iters],)
    if record_its:
        out += (its[:max_iters, :n],)
    if record_nres:
        out += (nrs.reshape(kpad)[:max_iters],)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "window", "tol", "shrink_factor",
                     "max_backtracks", "interpret", "engine", "prox",
                     "hp", "accelerate", "restart", "restart_dd", "loss",
                     "stop_rule", "record_fvals", "record_bts",
                     "record_objs", "record_nres"))
def microsolve_lasso_path(A, b, x0, tau0, mus, max_iters=1000, window=10,
                          tol=1e-3, shrink_factor=0.2, max_backtracks=20,
                          interpret=False, engine="vpu", prox="l1",
                          hp=False, accelerate=False, restart=True,
                          restart_dd=False, loss="lstsq",
                          stop_rule="hybrid_residual",
                          record_fvals=False, record_bts=False,
                          record_objs=False, record_nres=False):
    """WARM-STARTED regularization path in ONE kernel launch: an
    explicit sequential grid over the B entries of ``mus`` (strongest
    penalty first, the classic continuation order) where path point i
    starts from point i-1's solution and last accepted stepsize —
    solve_path's homotopy recipe (solver.py, incl. its degenerate-tau
    guard) run entirely on-core, with A pinned in VMEM across ALL path
    points and iterations.  The carry rides grid-persistent VMEM/SMEM
    scratch (TPU grid steps execute back-to-back on one core).

    Contrast ``jax.vmap(microsolve_lasso)`` (microsolve_sweep): that is
    the embarrassingly-parallel COLD sweep; this trades independence
    for fewer total iterations when adjacent path solutions are close.
    Prefer ``stop_rule="residual"`` — the hybrid rule's max-residual
    normalization tightens under warm starts (solve_path note).

    Returns (xs: (B,n), taus: (B,max_iters), residuals: (B,max_iters),
    ks: (B,), status: (B,) int32 — see microsolve_lasso) — plus fvals
    (B,max_iters) when ``record_fvals``, plus bts when ``record_bts``,
    plus objs when ``record_objs``.
    A nonfinite abort (status 2) at path point i does NOT poison point
    i+1: the warm carry falls back to the caller's cold x0/tau0.
    """
    check_stop_rule(stop_rule)
    m, n = A.shape
    B = mus.shape[0]
    kpad = ((max_iters + 127) // 128) * 128
    kern = _make_kernel(m, n, max_iters, window, tol, shrink_factor,
                        max_backtracks, kpad, engine, prox, hp,
                        accelerate, restart, restart_dd, loss,
                        stop_rule, record_fvals, record_bts,
                        record_objs, record_nres=record_nres,
                        warm_sweep=True)
    ts = jnp.stack([jnp.broadcast_to(jnp.asarray(tau0, jnp.float32), (B,)),
                    jnp.asarray(mus, jnp.float32)],
                   axis=-1).reshape(B, 1, 2)
    # Per-path-point outputs are 3-D (B, ...) arrays whose LEADING dim
    # is None-squeezed out of the block: Mosaic requires the trailing
    # two block dims be (divisible by (8, 128) | equal to the array
    # dims) — a (1, n) block on a (B, n) array violates that on
    # hardware (interpret accepts it; found live 2026-08-20).  With the
    # squeeze the kernel refs keep the exact 2-D shapes of the
    # single-solve kernel, so one body serves both entry points.
    rows_spec = pl.BlockSpec((None, kpad // 128, 128),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    rows_shape = jax.ShapeDtypeStruct((B, kpad // 128, 128),
                                      jnp.float32)
    x, taus, res, fv, bts, objs, nrs, k, conv = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # x0 row
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # b row
            pl.BlockSpec((None, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),          # (tau0, mu)_i
            pl.BlockSpec((m, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # A (pinned)
        ],
        out_specs=[
            pl.BlockSpec((None, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # x_i
            rows_spec,                                      # taus_i
            rows_spec,                                      # res_i
            rows_spec,                                      # fvals_i
            rows_spec,                                      # bts_i
            rows_spec,                                      # objs_i
            rows_spec,                                      # nres_i
            pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),          # k_i
            pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),          # status_i
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
            rows_shape,
            rows_shape,
            rows_shape,
            rows_shape,
            rows_shape,
            rows_shape,
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),    # warm x carry
            pltpu.SMEM((1, 1), jnp.float32),    # warm tau carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 4 * m * n * 4 + (48 << 20)),
        ),
        interpret=interpret,
    )(x0.reshape(1, n), b.reshape(1, m), ts, A)
    out = (x.reshape(B, n), taus.reshape(B, kpad)[:, :max_iters],
           res.reshape(B, kpad)[:, :max_iters], k.reshape(B),
           conv.reshape(B))
    if record_fvals:
        out += (fv.reshape(B, kpad)[:, :max_iters],)
    if record_bts:
        out += (bts.reshape(B, kpad)[:, :max_iters],)
    if record_objs:
        out += (objs.reshape(B, kpad)[:, :max_iters],)
    if record_nres:
        out += (nrs.reshape(B, kpad)[:, :max_iters],)
    return out
