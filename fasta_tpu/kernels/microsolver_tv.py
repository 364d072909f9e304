"""On-chip TV microsolver: the whole TV-denoising dual solve in ONE
kernel launch.

The TV iteration is LAUNCH-bound (STATUS.md: the 512×512 state is ~5 MB,
VMEM-resident, but XLA dispatches ~20 small kernels per iteration and
gradmap-only fusion measured 1.00×).  Whole-solve fusion is the fix:
this kernel runs the complete FBS loop for

    min_p ½‖μ·div p − b‖²   s.t. ‖p‖∞ ≤ 1      (dual of TV denoising)

— forward divergence and adjoint gradient as sublane/lane rolls with
edge masks (bit-exact vs XLA, see kernels/tv_fused.py), box projection,
nonmonotone backtracking, hybrid stopping and diagnostics — with zero
per-iteration launches and zero HBM round trips.  Two modes: adaptive
(ZGD BB stepsize, default) and ``accelerate=True`` (FISTA + O'Donoghue–
Candès restart, affine-d extrapolation).  Dual field carried as two
(H, W) channel values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["microsolve_tv", "microsolve_tv_path"]

_WPAD = 128


def _make_kernel(h, w, max_iters, window, tol, shrink_factor,
                 max_backtracks, kpad, hp, accelerate=False, restart=True,
                 restart_dd=False, stop_rule="hybrid_residual",
                 record_fvals=False, record_bts=False, record_objs=False,
                 record_nres=False, warm_sweep=False):
    from .. import precision as prec
    from .ddreduce import dd_dot_rows2, dd_reduce
    from .microsolver import halt_code, stop_from_rule
    need_nres = (stop_rule in ("normalized_residual", "hybrid_residual")
                 or record_nres)
    # warm_sweep: explicit sequential grid over denoising strengths
    # (microsolve_tv_path) — step i>0 starts from step i-1's dual field
    # and last accepted stepsize via grid-persistent VMEM/SMEM scratch,
    # exactly the dense kernel's continuation recipe
    # (kernels/microsolver.py warm_sweep notes).

    def kernel(b_ref, ts_ref, pv_ref, ph_ref,
               xv_ref, xh_ref, taus_ref, res_ref, fv_ref, bt_ref,
               obj_ref, nres_ref, k_ref, conv_ref, *scr):
        if warm_sweep:
            pvprev_scr, phprev_scr, tprev_scr = scr
        b = b_ref[:]
        # the TV weight μ is a RUNTIME SMEM scalar (ts_ref[0,1]) — one
        # executable per option set serves every μ; vmap over it solves
        # a denoising-strength sweep in one launch.  ts is (1,2): a
        # vmapped (B,2) SMEM operand violates Mosaic's block rule
        # (see kernels/microsolver.py)
        mu = ts_ref[0, 1]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, _WPAD), 1)
        # O(1) per-iteration recording (see kernels/microsolver.py): a
        # (1,128) accumulator row flushed to the (kpad//128, 128) output
        # ref at dynamic sublane offset — carrying (1, kpad) arrays made
        # every iteration pay an O(kpad) rebuild.
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
            """Optional f-value row (C5 parity — see
            kernels/microsolver.py record_f)."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            frow_n = jnp.where(lane128 == lane, fv, frow_c)
            fv_ref[pl.ds(row, 1), :] = frow_n
            return frow_n

        def record_bt(k, bt, btrow_c):
            """Optional backtrack-count row (C5 parity — see
            kernels/microsolver.py record_bt)."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            btrow_n = jnp.where(lane128 == lane,
                                bt.astype(jnp.float32), btrow_c)
            bt_ref[pl.ds(row, 1), :] = btrow_n
            return btrow_n

        def record_obj(k, ov, orow_c):
            """Optional objective row.  The TV dual's g is the box
            indicator (0 at every prox point), so objectives[k] is the
            PROX-POINT f — distinct from the fvals ring, which records
            f at the NEXT search point under FISTA (window
            semantics)."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            orow_n = jnp.where(lane128 == lane, ov, orow_c)
            obj_ref[pl.ds(row, 1), :] = orow_n
            return orow_n

        def record_nr(k, nv, nrow_c):
            """Optional normalized-residual row (see
            kernels/microsolver.py record_nr)."""
            c128 = jnp.asarray(128, jnp.int32)
            lane = jax.lax.rem(k, c128)
            row = jax.lax.div(k, c128)
            nrow_n = jnp.where(lane128 == lane, nv, nrow_c)
            nres_ref[pl.ds(row, 1), :] = nrow_n
            return nrow_n

        def f_plain(f):
            return prec.dd_to_float(f) if hp else f
        ridx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        mrow = (ridx < h - 1).astype(jnp.float32)
        mcol = (cidx < w - 1).astype(jnp.float32)

        def dd_dot2(av, ah, bv, bh):
            """Re⟨(av,ah),(bv,bh)⟩ over both dual channels in dd — one
            fused Sum2 tree (kernels/ddreduce.dd_dot_rows2)."""
            return dd_dot_rows2(av, bv, ah, bh)

        def fwd(pv, ph):
            """d = μ·div p — the forward stencil (A application)."""
            q = pv * mrow
            s = ph * mcol
            return mu * ((pltpu.roll(q, 1, 0) - q)
                         + (pltpu.roll(s, 1, 1) - s))

        def fof(d):
            """f(d) = ½‖d − b‖² (dd under hp)."""
            r = d - b
            if hp:
                p_, e_ = prec.two_prod(r, r)
                return prec.dd_scale(dd_reduce(p_, e_), 0.5)
            return 0.5 * jnp.sum(r * r)

        def adj(d):
            """∇f̃ = Aᴴ(d − b) — the adjoint stencil pair."""
            r = d - b
            gv = mu * (pltpu.roll(r, h - 1, 0) - r) * mrow
            gh = mu * (pltpu.roll(r, w - 1, 1) - r) * mcol
            return gv, gh

        def gradmap(pv, ph):
            d = fwd(pv, ph)
            gv, gh = adj(d)
            return fof(d), gv, gh

        def f_hi(f):
            return f.hi if hp else f

        if warm_sweep:
            # step i>0 continues from step i-1's dual field (scratch
            # reads are garbage at step 0, fully masked by the selects).
            # tau continuation is mode-dependent (solve_path rule, see
            # kernels/microsolver.py): adaptive BB re-estimates from the
            # first secant so a warm carry is safe; FISTA's tau is
            # monotone non-increasing, so accelerate warm-starts the
            # field ONLY and resets tau to the caller's tau0.
            i = pl.program_id(0)
            pv0 = jnp.where(i > 0, pvprev_scr[:], pv_ref[:])
            ph0 = jnp.where(i > 0, phprev_scr[:], ph_ref[:])
            if accelerate:
                tau0 = ts_ref[0, 0]
            else:
                tprev = tprev_scr[0, 0]
                tau0 = jnp.where((i > 0) & (tprev > 0.0), tprev,
                                 ts_ref[0, 0])
        else:
            pv0 = pv_ref[:]
            ph0 = ph_ref[:]
            tau0 = ts_ref[0, 0]
        if accelerate:
            d0 = fwd(pv0, ph0)
            f0 = fof(d0)
            gv0, gh0 = adj(d0)
        else:
            f0, gv0, gh0 = gradmap(pv0, ph0)
        neg = jnp.full((1, _WPAD), -jnp.inf, jnp.float32)
        fwin = jnp.where(lane_w == 0, f_hi(f0), neg)
        # window lo channel (hp): the dd residue of each stored f-value;
        # the max tiebreak on it resolves sub-ulp f differences exactly
        # like the XLA hp path (solver.py / precision.dd_max)
        fwin_lo = jnp.where(lane_w == 0, f0.lo,
                            jnp.zeros((1, _WPAD), jnp.float32)) if hp \
            else None

        def clamp(z):
            return jnp.clip(z, -1.0, 1.0)

        def cond(c):
            # c[1] is the int32 halt status (microsolver.halt_code):
            # 0 running, 1 converged, 2 nonfinite abort
            return (c[0] < max_iters) & (c[1] == 0)

        # ---- shared solver-step machinery (both modes) ----------------
        # A mode's fb(tau) returns (zv, zh, xv, xh, dv, dh, f1, *rest):
        # the first seven slots are fixed so the backtracking loop can
        # read dv/dh/f1 positionally; *rest carries mode extras (adaptive:
        # the prox-point gradient for BB; accel: d1 for the affine
        # extrapolation).

        def window_max(fwin_c, fwlo_c):
            """Nonmonotone window max M.

            hp: max tiebreak on the lo channel resolves sub-ulp f
            differences like the XLA path's dd_max."""
            if hp:
                mhi = jnp.max(fwin_c)
                mlo = jnp.max(jnp.where(fwin_c == mhi, fwlo_c, -jnp.inf))
                return prec.DD(mhi, mlo)
            return jnp.max(fwin_c)

        def backtrack(fb, first, tau, gv_c, gh_c, M):
            """Zhang–Hager nonmonotone line search over fb trials."""
            def bt_cond(bc):
                tau_b = bc[0]
                dv_b, dh_b, f1_b = bc[5], bc[6], bc[7]
                cnt = bc[-1]
                nd2 = jnp.sum(dv_b * dv_b) + jnp.sum(dh_b * dh_b)
                if hp:
                    # slack from the CURRENT trial's f1 (solver.py
                    # bt_cond — f32 storage means the true f can exceed
                    # the window by O(eps32)·scale)
                    slack = 1e-12 + (64.0 * 1.1920929e-07) \
                        * (jnp.abs(M.hi)
                           + jnp.abs(prec.dd_to_float(f1_b)))
                    rdg = dd_dot2(dv_b, dh_b, gv_c, gh_c)
                    suff = prec.dd_add(M, prec.dd_add(
                        rdg, prec.dd(nd2 / (2.0 * tau_b))))
                    viol = prec.dd_to_float(
                        prec.dd_sub(f1_b, suff)) > slack
                else:
                    rdg = jnp.sum(dv_b * gv_c) + jnp.sum(dh_b * gh_c)
                    viol = f1_b - 1e-12 > M + rdg + nd2 / (2.0 * tau_b)
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
            # (see kernels/microsolver.py backtrack note)
            return out

        def resid_stop(tau, xv, xh, zv, zh, dv, dh, gv_c, gh_c,
                       maxres_c):
            """Gradient-map residual + selectable stopping (oracle C4)."""
            nd2 = jnp.sum(dv * dv) + jnp.sum(dh * dh)
            res = jnp.sqrt(nd2) / tau
            maxres = jnp.maximum(maxres_c, res)
            if need_nres:
                smv = xv - zv
                smh = xh - zh
                ng2 = jnp.sum(gv_c * gv_c) + jnp.sum(gh_c * gh_c)
                nsm2 = jnp.sum(smv * smv) + jnp.sum(smh * smh)
                normalizer = jnp.maximum(jnp.sqrt(ng2),
                                         jnp.sqrt(nsm2) / tau) + 1e-8
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
                (k, _halt, yv, yh, gv_c, gh_c, tau_c, fwin_c, fwlo_c,
                 maxres_c, trow_c, rrow_c, xav, xah, dacc, alpha_c) = c

                def fb(tau):
                    zv = yv - tau * gv_c
                    zh = yh - tau * gh_c
                    xv = clamp(zv)
                    xh = clamp(zh)
                    dv = xv - yv
                    dh = xh - yh
                    d1 = fwd(xv, xh)
                    # no adjoint during trials: accel needs ∇f̃ only at
                    # the extrapolated point, after acceptance
                    return zv, zh, xv, xh, dv, dh, fof(d1), d1

                tau = tau_c
                first = fb(tau)
                M = window_max(fwin_c, fwlo_c)
                (tau, zv, zh, xv, xh, dv, dh, f1, d1, bt) = backtrack(
                    fb, first, tau, gv_c, gh_c, M)

                _nd2, res, nres, maxres, stop = resid_stop(
                    tau, xv, xh, zv, zh, dv, dh, gv_c, gh_c, maxres_c)

                trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)

                # O'Donoghue–Candès gradient restart:
                # ⟨y − x₁, x₁ − x_accel0⟩ > 0 resets the momentum
                # (dd under hp+restart_dd, like the XLA solver's restart
                # dot; restart_dd=False keeps it a plain-f32 sign test —
                # only decisions within f32 noise of zero can differ)
                if hp and restart_dd:
                    rdot = prec.dd_to_float(
                        dd_dot2(yv - xv, yh - xh, xv - xav, xh - xah))
                else:
                    rdot = (jnp.sum((yv - xv) * (xv - xav))
                            + jnp.sum((yh - xh) * (xh - xah)))
                alpha0 = (jnp.where(rdot > 0.0, 1.0, alpha_c)
                          if restart else alpha_c)
                alpha1 = (1.0
                          + jnp.sqrt(1.0 + 4.0 * alpha0 * alpha0)) / 2.0
                beta = (alpha0 - 1.0) / alpha1
                yv_n = xv + beta * (xv - xav)
                yh_n = xh + beta * (xh - xah)
                d_n = d1 + beta * (d1 - dacc)       # A is linear
                gvn, ghn = adj(d_n)
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
                out = (k + 1, halt, yv_n, yh_n, gvn, ghn, tau, fwin_n,
                       fwlo_n, maxres, trow_n, rrow_n, xv, xh, d1,
                       alpha1)
                if record_fvals:
                    out += (record_f(k, f_plain(f_rec), frow_c),)
                if record_bts:
                    out += (record_bt(k, bt, btrow_c),)
                if record_objs:
                    # prox-point objective (g = box indicator = 0)
                    out += (record_obj(k, f_plain(f1), orow_c),)
                if record_nres:
                    out += (record_nr(k, nres, nrow_c),)
                if warm_sweep:
                    # genuinely ACCEPTED stepsize only (see the dense
                    # kernel's accelerate body note)
                    out += (jnp.where(bt < max_backtracks, tau,
                                      _tacc_c),)
                return out

            init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    pv0, ph0, gv0, gh0, tau0, fwin, fwin_lo,
                    jnp.asarray(-jnp.inf, jnp.float32),
                    jnp.zeros((1, 128), jnp.float32),
                    jnp.zeros((1, 128), jnp.float32),
                    pv0, ph0, d0, jnp.asarray(1.0, jnp.float32))
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
            (k, halt, yv_f, yh_f, _gv, _gh, _tau, _fw, _fwlo, _mr,
             _tr, _rr, xav_f, xah_f, _d, _a) = fin[:16]

            # a converged stop exits at the prox iterate; max-iters
            # exhaustion returns the extrapolated point (oracle break
            # semantics, solver.py solution select)
            solv = jnp.where(halt == 1, xav_f, yv_f)
            solh = jnp.where(halt == 1, xah_f, yh_f)
            xv_ref[:] = solv
            xh_ref[:] = solh
            k_ref[0, 0] = k
            conv_ref[0, 0] = halt
            if warm_sweep:
                # a nonfinite abort must not poison the NEXT path point
                # (see the dense kernel's warm epilogue)
                ok = halt != 2
                pvprev_scr[:] = jnp.where(ok, solv, pv_ref[:])
                phprev_scr[:] = jnp.where(ok, solh, ph_ref[:])
                if not accelerate:
                    # solve_path's degenerate guard: keep the caller tau
                    # when the solve died at 0 iterations / dead
                    # stepsize.  FISTA warm sweeps reset tau to the
                    # caller's tau0 (see the warm_sweep prologue), so
                    # the tau carry-over store exists only in adaptive
                    # mode.
                    tau_acc = fin[-1]
                    tprev_scr[0, 0] = jnp.where(
                        (k > 0) & (tau_acc > 0.0), tau_acc, tau0)
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
            (k, _halt, pv_c, ph_c, gv_c, gh_c, tau_c, fwin_c, fwlo_c,
             maxres_c, trow_c, rrow_c) = c

            def fb(tau):
                zv = pv_c - tau * gv_c
                zh = ph_c - tau * gh_c
                xv = clamp(zv)
                xh = clamp(zh)
                dv = xv - pv_c
                dh = xh - ph_c
                f1, gv1, gh1 = gradmap(xv, xh)
                return zv, zh, xv, xh, dv, dh, f1, gv1, gh1

            tau = tau_c
            first = fb(tau)
            M = window_max(fwin_c, fwlo_c)
            (tau, zv, zh, xv, xh, dv, dh, f1, gv1, gh1, bt) = backtrack(
                fb, first, tau, gv_c, gh_c, M)

            nd2, res, nres, maxres, stop = resid_stop(
                tau, xv, xh, zv, zh, dv, dh, gv_c, gh_c, maxres_c)

            trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)
            fwin_n = jnp.where(lane_w == (k + 1) % window, f_hi(f1),
                               fwin_c)
            fwlo_n = (jnp.where(lane_w == (k + 1) % window, f1.lo,
                                fwlo_c) if hp else None)

            dgv = gv1 + (zv - pv_c) / tau
            dgh = gh1 + (zh - ph_c) / tau
            if hp:
                dotprod = prec.dd_to_float(dd_dot2(dv, dh, dgv, dgh))
            else:
                dotprod = jnp.sum(dv * dgv) + jnp.sum(dh * dgh)
            ndg2 = jnp.sum(dgv * dgv) + jnp.sum(dgh * dgh)
            tau_s = jnp.where(dotprod != 0.0, nd2 / dotprod, jnp.inf)
            tau_m = jnp.maximum(
                jnp.where(ndg2 > 0.0, dotprod / ndg2, 0.0), 0.0)
            tau_n = jnp.where(2.0 * tau_m > tau_s, tau_m,
                              tau_s - 0.5 * tau_m)
            deg = (tau_n <= 0.0) | jnp.isinf(tau_n) | jnp.isnan(tau_n)
            tau_n = jnp.where(deg, tau * 1.5, tau_n)

            halt = halt_code(stop, jnp.isfinite(res),
                             jnp.isfinite(tau_n),
                             jnp.isfinite(f_hi(f1)))
            out = (k + 1, halt, xv, xh, gv1, gh1, tau_n, fwin_n,
                   fwlo_n, maxres, trow_n, rrow_n)
            if record_fvals:
                out += (record_f(k, f_plain(f1), frow_c),)
            if record_bts:
                out += (record_bt(k, bt, btrow_c),)
            if record_objs:
                out += (record_obj(k, f_plain(f1), orow_c),)
            if record_nres:
                out += (record_nr(k, nres, nrow_c),)
            if warm_sweep:
                # genuinely accepted only — see the accelerate body
                out += (jnp.where(bt < max_backtracks, tau, _tacc_c),)
            return out

        init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                pv0, ph0, gv0, gh0, tau0, fwin, fwin_lo,
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
        (k, halt, xv_f, xh_f, _gv, _gh, _tau, _fw, _fwlo, _mr, _tr,
         _rr) = fin[:12]

        xv_ref[:] = xv_f
        xh_ref[:] = xh_f
        k_ref[0, 0] = k
        conv_ref[0, 0] = halt
        if warm_sweep:
            tau_acc = fin[-1]
            ok = halt != 2          # see the accelerate epilogue
            pvprev_scr[:] = jnp.where(ok, xv_f, pv_ref[:])
            phprev_scr[:] = jnp.where(ok, xh_f, ph_ref[:])
            tprev_scr[0, 0] = jnp.where(ok & (k > 0) & (tau_acc > 0.0),
                                        tau_acc, tau0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "window", "tol", "shrink_factor",
                     "max_backtracks", "interpret", "hp", "accelerate",
                     "restart", "restart_dd", "stop_rule",
                     "record_fvals", "record_bts", "record_objs",
                     "record_nres"))
def microsolve_tv(b, p0, tau0, mu, max_iters=2000, window=10, tol=1e-5,
                  shrink_factor=0.2, max_backtracks=20, interpret=False,
                  hp=True, accelerate=False, restart=True,
                  restart_dd=False, stop_rule="hybrid_residual",
                  record_fvals=False, record_bts=False,
                  record_objs=False, record_nres=False):
    """Whole-solve kernel for the TV dual (adaptive BB or FISTA mode).

    b: (H,W) noisy image; p0: (2,H,W) dual init.  Returns
    (p: (2,H,W), taus, residuals, iteration_count, status) — plus
    fvals when ``record_fvals``, plus bts (per-iteration line-search
    trial counts, f32) when ``record_bts``, plus objs (prox-point
    objectives; the dual's g is the box indicator, so objs is the
    prox-point f — distinct from the fvals ring under FISTA) when
    ``record_objs``.  ``status`` is the int32
    halt code of kernels/microsolver.halt_code (0 max_iters /
    1 converged / 2 nonfinite abort; truthiness-compatible with the
    old converged bool).  ``stop_rule`` selects among the XLA
    solver's five C4 rules (kernels/microsolver.py STOP_RULES).

    ``accelerate=True`` runs FISTA with O'Donoghue–Candès gradient
    restart instead of the BB stepsize — fewer iterations on the TV
    dual (measured: 1,330 vs 2,210 at tol=1e-5 on 512×512, hp).  The
    extrapolated point's d = A·y rides the affine d₁ + β(d₁ − d₀)
    combination (A linear — oracle fasta_numpy.py accel branch), so the
    per-iteration stencil count matches the adaptive mode: one forward
    per trial, one adjoint per iteration.  ``restart_dd`` (default
    False) keeps the restart dot a plain-f32 SIGN test even under hp —
    the two dd trees it saves sit on the serialized tail of the loop
    body and cost ~25 µs/iter on hardware (measured 1.27× wall);
    decisions can differ from the XLA hp path only when the dot is
    within f32 noise of zero, where the restart choice is genuinely
    ambiguous (convergence regime unaffected; identical iteration
    counts measured on 64² and 512²).  Pass restart_dd=True for the
    same dd-level accuracy and sign semantics as solver.py's dd restart
    dot (the in-kernel dot rides the fused Sum2 tree of
    kernels/ddreduce.py, whose association differs from precision.py's
    full-dd fold, so the lo word — and in rare near-ties the hi word —
    can differ by O(eps²); not bit-for-bit).

    ``hp`` (default True) runs the decision scalars (f-values/window,
    backtracking dot, BB numerator) in double-word f32 inside the
    kernel — matching the XLA solver's ``precision="auto"`` path, so
    the microsolver keeps its ~4× iteration-rate advantage without
    regressing to the plain-f32 convergence stall (round 1: 15.7k
    iterations vs 1.9k at tol 1e-5 on TV 512×512).  In-kernel the dd
    reductions are pure vectorized VPU ops — no per-reduce kernel
    dispatch, unlike the XLA path; non-pow2 dims are zero-padded inside
    the reduction trees (exact).
    """
    from .microsolver import check_stop_rule
    check_stop_rule(stop_rule)
    h, w = b.shape
    kpad = ((max_iters + 127) // 128) * 128
    kern = _make_kernel(h, w, max_iters, window, tol, shrink_factor,
                        max_backtracks, kpad, hp, accelerate, restart,
                        restart_dd, stop_rule, record_fvals, record_bts,
                        record_objs, record_nres)
    ts = jnp.stack([jnp.asarray(tau0, jnp.float32),
                    jnp.asarray(mu, jnp.float32)]).reshape(1, 2)
    xv, xh, taus, res, fv, bts, objs, nrs, k, conv = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b
            pl.BlockSpec(memory_space=pltpu.SMEM),      # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),      # pv0
            pl.BlockSpec(memory_space=pltpu.VMEM),      # ph0
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 40 * h * w * 4 + (16 << 20)),
        ),
        interpret=interpret,
    )(b, ts, p0[0], p0[1])
    out = (jnp.stack([xv, xh]), taus.reshape(kpad)[:max_iters],
           res.reshape(kpad)[:max_iters], k[0, 0], conv[0, 0])
    if record_fvals:
        out += (fv.reshape(kpad)[:max_iters],)
    if record_bts:
        out += (bts.reshape(kpad)[:max_iters],)
    if record_objs:
        out += (objs.reshape(kpad)[:max_iters],)
    if record_nres:
        out += (nrs.reshape(kpad)[:max_iters],)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "window", "tol", "shrink_factor",
                     "max_backtracks", "interpret", "hp", "accelerate",
                     "restart", "restart_dd", "stop_rule",
                     "record_fvals", "record_bts", "record_objs",
                     "record_nres"))
def microsolve_tv_path(b, p0, tau0, mus, max_iters=2000, window=10,
                       tol=1e-5, shrink_factor=0.2, max_backtracks=20,
                       interpret=False, hp=True, accelerate=False,
                       restart=True, restart_dd=False,
                       stop_rule="hybrid_residual", record_fvals=False,
                       record_bts=False, record_objs=False,
                       record_nres=False):
    """WARM-STARTED denoising-strength path in ONE kernel launch: an
    explicit sequential grid over the B entries of ``mus`` where path
    point i starts from point i-1's dual field and last accepted
    stepsize — the TV analog of ``microsolve_lasso_path``
    (kernels/microsolver.py), with the noisy image b pinned in VMEM
    across ALL path points and iterations.  The carry rides
    grid-persistent VMEM/SMEM scratch (TPU grid steps execute
    back-to-back on one core).

    Contrast the cold sweep (``microsolve_sweep`` without
    ``warm_start``): that vmaps independent solves over μ.  MEASURED
    FINDING (2026-08-20): unlike the LASSO primal path (1.6× fewer
    total iterations), the TV DUAL has NO RELIABLE warm-continuation
    win — measurements scatter within ±10% of cold (32×32 tol=1e-5:
    coarse 3-point paths ~8% MORE iterations warm, 988 vs 918
    adaptive, FISTA and weak-first orderings similar, fine 6-point
    paths a wash 2632 vs 2646; 64×64 tol=1e-4 on chip: 2.7% FEWER,
    1411 vs 1450, hw_validate [12]), and the rescaled-dual carry
    clip(p·μ_{i-1}/μ_i) is worse still (1061 vs 918).  The dual field
    scales ~1/μ with a μ-dependent active set, and the default init
    is already near-optimal at weak μ.  The
    cold sweep (grid-parallel, bit-matching per-μ launches) remains
    the recommended TV path; this entry exists for API parity and for
    workloads whose x0 is far from the default.  Prefer
    ``stop_rule="residual"`` — the hybrid rule's max-residual
    normalization tightens under warm starts (solve_path note,
    solver.py).

    Returns (ps: (B,2,H,W), taus: (B,max_iters), residuals:
    (B,max_iters), ks: (B,), status: (B,) int32 — see microsolve_tv) —
    plus fvals (B,max_iters) when ``record_fvals``, plus bts when
    ``record_bts``, plus objs when ``record_objs``.  A nonfinite abort
    (status 2) at path point i does not poison point i+1 (cold
    fallback, as in microsolve_lasso_path).
    """
    from .microsolver import check_stop_rule
    check_stop_rule(stop_rule)
    h, w = b.shape
    B = mus.shape[0]
    kpad = ((max_iters + 127) // 128) * 128
    kern = _make_kernel(h, w, max_iters, window, tol, shrink_factor,
                        max_backtracks, kpad, hp, accelerate, restart,
                        restart_dd, stop_rule, record_fvals, record_bts,
                        record_objs, record_nres, warm_sweep=True)
    ts = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(tau0, jnp.float32), (B,)),
         jnp.asarray(mus, jnp.float32)], axis=-1).reshape(B, 1, 2)
    # leading path-point dims are None-squeezed out of every block so
    # the kernel refs keep the single-solve kernel's exact 2-D shapes
    # (Mosaic's trailing-block-divisibility rule — see
    # microsolve_lasso_path's spec note; found on hardware 2026-08-20)
    rows_spec = pl.BlockSpec((None, kpad // 128, 128),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    rows_shape = jax.ShapeDtypeStruct((B, kpad // 128, 128),
                                      jnp.float32)
    field_spec = pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    xv, xh, taus, res, fv, bts, objs, nrs, k, conv = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # b (pinned)
            pl.BlockSpec((None, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),       # (tau0, mu)_i
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # pv0
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # ph0
        ],
        out_specs=[
            field_spec,                                  # pv_i
            field_spec,                                  # ph_i
            rows_spec,                                   # taus_i
            rows_spec,                                   # res_i
            rows_spec,                                   # fvals_i
            rows_spec,                                   # bts_i
            rows_spec,                                   # objs_i
            rows_spec,                                   # nres_i
            scal_spec,                                   # k_i
            scal_spec,                                   # status_i
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h, w), jnp.float32),
            jax.ShapeDtypeStruct((B, h, w), jnp.float32),
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
            pltpu.VMEM((h, w), jnp.float32),    # warm pv carry
            pltpu.VMEM((h, w), jnp.float32),    # warm ph carry
            pltpu.SMEM((1, 1), jnp.float32),    # warm tau carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 48 * h * w * 4 + (16 << 20)),
        ),
        interpret=interpret,
    )(b, ts, p0[0], p0[1])
    ps = jnp.stack([xv, xh], axis=1)             # (B, 2, H, W)
    out = (ps, taus.reshape(B, kpad)[:, :max_iters],
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
