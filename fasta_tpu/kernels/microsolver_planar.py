"""On-chip PLANAR-complex microsolver: the whole PhaseMax solve in ONE
kernel launch.

The flagship phase-retrieval config (SURVEY.md §3.4: 16384×256 complex)
stores planar as Ar+Ai = 32 MB — comfortably VMEM-resident.  Same cure
as the dense and TV microsolvers: run the ENTIRE FBS loop on-core —
both channel matrices pinned in VMEM across all iterations, the planar
matvec pair, the PhaseMax hinge, the linear-anchor prox, nonmonotone
backtracking, the ZGD BB stepsize (or FISTA + O'Donoghue–Candès
restart), hybrid stopping and the diagnostics ring — with zero
per-iteration launches.

The matvecs work on TRANSPOSED (n, m) channel windows ("rowt",
2026-08-20): the round-3 (m, n) broadcast-reduce formulation paid a
lane<->sublane relayout per chunk per matvec (~64 transposes of
2048-element vectors per iteration — benchmarks/planar_matvec_probe.py
measured the bare pair at 75.5 µs = 889 GB/s implied, which was the
round-3 VERDICT's unexplained "7× per-byte gap" vs the dense kernel).
With transposed storage the pair runs 23 µs = 2.9 TB/s implied (3.3×)
and the flagship solve-to-tol dropped 5.3–5.8 ms -> 2.4 ms on chip.

Problem solved (PhaseMax penalized form, problems/phase_retrieval.py):

    min_x  ½ Σ max(|Ax| − b, 0)²  −  ⟨c, x⟩ ,      prox(z, τ) = z + τ·c

on planar x ∈ ℝ^{n×2}.  Iteration math mirrors solver.py / the oracle;
``hp=True`` runs the decision scalars in in-kernel double-word f32
(shared kernels/ddreduce.py folds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["microsolve_planar_phasemax", "supports_planar_microsolver"]

_WPAD = 128


def _row_chunk(m: int):
    """Measurement-axis chunk size for the chunked matvecs (lane chunks
    of the transposed (n, m) channel windows), or None when m > 2048
    has no 128-multiple divisor chunk — the unchunked fallback would
    recreate the register-spill VMEM OOM the chunking exists to fix
    (measured 2026-08-19: ~182 MB of spill slots at 16384×256), so
    such shapes are REJECTED by the support gate rather than compiled
    unchunked."""
    if m <= 2048:
        return m
    for cand in (2048, 1024, 512, 256, 128):
        if m % cand == 0:
            return cand
    return None


def supports_planar_microsolver(m: int, n: int) -> bool:
    """Both channel matrices + carry vectors must sit in VMEM, and the
    row count must admit a 128-multiple matvec chunk (see _row_chunk)."""
    return 2 * m * n * 4 <= (48 << 20) and _row_chunk(m) is not None


def _make_kernel(m, n, max_iters, window, tol, shrink_factor,
                 max_backtracks, kpad, hp, accelerate, restart,
                 restart_dd, engine, stop_rule="hybrid_residual",
                 record_fvals=False, record_bts=False,
                 record_objs=False, record_nres=False,
                 record_its=False):
    from .. import precision as prec
    from .ddreduce import dd_dot_rows2
    from .microsolver import halt_code, stop_from_rule
    need_nres = (stop_rule in ("normalized_residual", "hybrid_residual")
                 or record_nres)

    # The planar kernel is VPU-ONLY since the rowt rewrite (the dense
    # kernel keeps its selectable "mxu" engine): the HIGHEST
    # dot_general A/B variant measured 1.44x SLOWER than the VPU
    # formulation in round 3, and under transposed storage its 6-pass
    # matvec temporaries no longer fit scoped VMEM at the flagship
    # size (AOT OOM: 71.6 MB wanted at a 64 MB limit, growing to
    # 107 MB when given 80 — measured live 2026-08-20).  The VPU
    # formulation works on
    # TRANSPOSED (n, m) channel windows — see fwd/adj below and
    # benchmarks/planar_matvec_probe.py (2026-08-20): the original
    # (m, n) row-chunked broadcast-reduce paid a lane<->sublane
    # relayout per chunk per matvec (the (rc,) lane-reduce result is
    # column-natural, the adjoint input reshape row->column is a
    # transpose) — ~64 relayouts of 2048-element vectors per
    # iteration, 75.5 us/pair = 889 GB/s implied on the flagship.
    # With transposed storage the fwd is a sublane-reduce (row-natural
    # result, keeps the WHOLE residual side — hinge, b, dd folds — in
    # fast row layout) and the adj is a lane-reduce into an (n, 1)
    # column; only four n-element transposes remain per pair:
    # 23.0 us/pair = 2.9 TB/s implied, 3.3x.

    # Lane-chunked matvecs: materializing the full channel matrices as
    # VALUES forces Mosaic to keep them live in vregs — at the
    # 16384×256 flagship that compiled to ~182 MB of register spill
    # slots and a VMEM OOM (measured 2026-08-19).  Reading (n, rc)
    # tiles from the pinned input windows per (unrolled) chunk bounds
    # live temporaries to ~2 MB while the matrices stay resident in
    # VMEM once.
    rc = _row_chunk(m)
    if rc is None:
        raise ValueError(
            f"planar microsolver: m={m} > 2048 has no 128-multiple "
            f"divisor chunk; pad the measurement rows to a multiple of "
            f"128 (supports_planar_microsolver gates this)")
    nchunks = m // rc

    def kernel(x0_ref, b_ref, c_ref, ts_ref, Ar_ref, Ai_ref,
               x_ref, taus_ref, res_ref, fv_ref, bt_ref, obj_ref,
               nres_ref, *rest):
        rest = list(rest)
        # optional HBM iterate-trajectory output precedes the SMEM
        # scalars; its staging scratch + DMA semaphore trail the six
        # fixed matvec scratches
        its_ref = rest.pop(0) if record_its else None
        k_ref = rest.pop(0)
        conv_ref = rest.pop(0)
        dscr_r, dscr_i, yscr_r, yscr_i, pscr_r, pscr_i = rest[:6]
        if record_its:
            xstage, dma_sem = rest[6:]

        npad_it = ((n + 127) // 128) * 128

        def record_it(k, x1r, x1i):
            """record_iterates analog for the planar channels: both
            channel rows staged side-by-side at sublane k%8 of an
            (8, 2*npad) VMEM buffer (each half 128-lane aligned) and
            DMA'd to the HBM trajectory buffer as full 8-row blocks —
            the dense kernel's tile-alignment pattern
            (kernels/microsolver.py record_it)."""
            c8 = jnp.asarray(8, jnp.int32)
            lane8 = jax.lax.rem(k, c8)
            if npad_it != n:
                z = jnp.zeros((1, npad_it - n), jnp.float32)
                x1r = jnp.concatenate([x1r, z], axis=1)
                x1i = jnp.concatenate([x1i, z], axis=1)
            xstage[pl.ds(lane8, 1), 0:npad_it] = x1r
            xstage[pl.ds(lane8, 1), npad_it:2 * npad_it] = x1i

            @pl.when(lane8 == 7)
            def _flush_full():
                blk = jax.lax.div(k, c8) * 8   # provably 8-divisible
                cp = pltpu.make_async_copy(
                    xstage, its_ref.at[pl.ds(blk, 8), :], dma_sem)
                cp.start()
                cp.wait()

        def flush_its(k):
            """Epilogue flush of the final partial block (see the
            dense kernel's flush_its)."""
            c8 = jnp.asarray(8, jnp.int32)
            blk = jax.lax.div(jnp.maximum(k - 1, 0), c8) * 8
            cp = pltpu.make_async_copy(
                xstage, its_ref.at[pl.ds(blk, 8), :], dma_sem)
            cp.start()
            cp.wait()
        b = b_ref[:]                      # (1, m) magnitudes
        c = c_ref[:]                      # (2, n) anchor channels
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
            """Optional objective row: f(x₁) + g(x₁) at the prox point
            with g(x) = −⟨c, x⟩ (C5 parity — kernels/microsolver.py
            record_obj)."""
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

        def gval(x1r, x1i):
            """g(x) = −⟨c, x⟩ over both planar channels."""
            return -(jnp.sum(c[0:1] * x1r) + jnp.sum(c[1:2] * x1i))

        def f_plain(f):
            return prec.dd_to_float(f) if hp else f

        def dd_dot2(ur, ui, vr, vi):
            # one fused Sum2 tree over both channels (ddreduce)
            return dd_dot_rows2(ur, vr, ui, vi)

        # Chunk results are assembled through VMEM scratch rows (Mosaic
        # has no dynamic_update_slice lowering for values; ref stores
        # are the supported idiom).  Chunk loops are UNROLLED (static
        # slices): the fori_loop + pl.ds version measured ~4% slower
        # (planar_matvec_probe col vs colu, 2026-08-20).
        def fwd(xr, xi):
            """(dr, di) = planar A x on (1,n) channel rows → (1,m)
            rows: sublane-reduce over the transposed (n, rc) lane
            chunks — the (1, rc) results are ROW-natural."""
            xrc = xr.reshape(n, 1)         # n-element transposes
            xic = xi.reshape(n, 1)         # (cheap: n lanes -> col)
            for j in range(nchunks):
                Art = Ar_ref[:, j * rc:(j + 1) * rc]
                Ait = Ai_ref[:, j * rc:(j + 1) * rc]
                dscr_r[0:1, j * rc:(j + 1) * rc] = jnp.sum(
                    Art * xrc - Ait * xic, axis=0, keepdims=True)
                dscr_i[0:1, j * rc:(j + 1) * rc] = jnp.sum(
                    Art * xic + Ait * xrc, axis=0, keepdims=True)
            return dscr_r[:], dscr_i[:]

        def adj(yr, yi):
            """(gr, gi) = planar Aᴴ y → (1,n): lane-reduce over the
            transposed chunks into (n, 1) columns, one n-element
            transpose each at the end."""
            yscr_r[:] = yr
            yscr_i[:] = yi
            # Per-chunk partials go THROUGH the (nchunks, n)
            # scratch: lane-reduce -> reshape -> STORE is the one
            # relayout Mosaic lowers (the pre-rowt kernel's proven
            # pattern); accumulating the lane-reduced values with a
            # canonical zeros init instead poisons the layout
            # ("Invalid relayout: ... replicated in destination",
            # found live 2026-08-20 — passes interpret either way).
            # The final cross-chunk sum is a canonical sublane
            # reduce over the ref read.
            for j in range(nchunks):
                Art = Ar_ref[:, j * rc:(j + 1) * rc]
                Ait = Ai_ref[:, j * rc:(j + 1) * rc]
                yrc = yscr_r[0:1, j * rc:(j + 1) * rc]
                yic = yscr_i[0:1, j * rc:(j + 1) * rc]
                pscr_r[j:j + 1, :] = jnp.sum(
                    Art * yrc + Ait * yic, axis=1).reshape(1, n)
                pscr_i[j:j + 1, :] = jnp.sum(
                    Art * yic - Ait * yrc, axis=1).reshape(1, n)
            return (jnp.sum(pscr_r[:], axis=0, keepdims=True),
                    jnp.sum(pscr_i[:], axis=0, keepdims=True))
        def hinge(dr, di):
            """(f, ℓr, ℓi): PhaseMax hinge value + elementwise grad."""
            mag = jnp.sqrt(dr * dr + di * di)
            r = jnp.maximum(mag - b, 0.0)
            s = r / jnp.maximum(mag, 1e-30)
            if hp:
                p_, e_ = prec.two_prod(r, r)
                from .ddreduce import dd_reduce
                f = prec.dd_scale(dd_reduce(p_, e_), 0.5)
            else:
                f = 0.5 * jnp.sum(r * r)
            return f, s * dr, s * di

        def f_hi(f):
            return f.hi if hp else f

        def prox(zr, zi, tau):
            """prox of g(x) = −⟨c, x⟩:  z + τ·c."""
            return zr + tau * c[0:1], zi + tau * c[1:2]

        x0r = x0_ref[0:1]                 # (1, n) channels
        x0i = x0_ref[1:2]
        # ts is (1,1), NOT (1,): a vmapped (B,1) SMEM operand gets a
        # (1,) block that violates Mosaic's block rule (the dense
        # kernel's (1,2) lesson, 2026-08-19); (B,1,1) with a full (1,1)
        # trailing block lowers — per-instance tau0 batching needs it.
        tau0 = ts_ref[0, 0]
        d0r, d0i = fwd(x0r, x0i)
        f0, l0r, l0i = hinge(d0r, d0i)
        g0r, g0i = adj(l0r, l0i)
        neg = jnp.full((1, _WPAD), -jnp.inf, jnp.float32)
        fwin = jnp.where(lane_w == 0, f_hi(f0), neg)
        fwin_lo = (jnp.where(lane_w == 0, f0.lo,
                             jnp.zeros((1, _WPAD), jnp.float32)) if hp
                   else None)

        def cond(cy):
            # cy[1] is the int32 halt status (microsolver.halt_code):
            # 0 running, 1 converged, 2 nonfinite abort
            return (cy[0] < max_iters) & (cy[1] == 0)

        def window_max(fwin_c, fwlo_c):
            if hp:
                mhi = jnp.max(fwin_c)
                mlo = jnp.max(jnp.where(fwin_c == mhi, fwlo_c, -jnp.inf))
                return prec.DD(mhi, mlo)
            return jnp.max(fwin_c)

        def backtrack(fb, first, tau, gr_c, gi_c, M):
            """fb(tau) → (x1r, x1i, dxr, dxi, f1, *rest)."""
            def bt_cond(bc):
                tau_b = bc[0]
                dxr_b, dxi_b, f1_b = bc[3], bc[4], bc[5]
                cnt = bc[-1]
                nd2 = jnp.sum(dxr_b * dxr_b) + jnp.sum(dxi_b * dxi_b)
                if hp:
                    slack = 1e-12 + (64.0 * 1.1920929e-07) \
                        * (jnp.abs(M.hi)
                           + jnp.abs(prec.dd_to_float(f1_b)))
                    rdg = dd_dot2(dxr_b, dxi_b, gr_c, gi_c)
                    suff = prec.dd_add(M, prec.dd_add(
                        rdg, prec.dd(nd2 / (2.0 * tau_b))))
                    viol = prec.dd_to_float(
                        prec.dd_sub(f1_b, suff)) > slack
                else:
                    suff = (M + jnp.sum(dxr_b * gr_c)
                            + jnp.sum(dxi_b * gi_c)
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
            # the trial counter stays in the return for the optional
            # backtrack-count recording (record_bts)
            return out

        def resid_stop(tau, x1r, x1i, zr, zi, dxr, dxi, gr_c, gi_c,
                       maxres_c):
            nd2 = jnp.sum(dxr * dxr) + jnp.sum(dxi * dxi)
            res = jnp.sqrt(nd2) / tau
            maxres = jnp.maximum(maxres_c, res)
            if need_nres:
                smr = x1r - zr
                smi = x1i - zi
                ng2 = jnp.sum(gr_c * gr_c) + jnp.sum(gi_c * gi_c)
                nsm2 = jnp.sum(smr * smr) + jnp.sum(smi * smi)
                normalizer = jnp.maximum(jnp.sqrt(ng2),
                                         jnp.sqrt(nsm2) / tau) + 1e-8
                nres = res / normalizer
            else:
                nres = None
            stop = stop_from_rule(stop_rule, res, nres, maxres, tol)
            return nd2, res, nres, maxres, stop

        if accelerate:
            def body(cy):
                if record_nres:
                    *cy, nrow_c = cy
                if record_objs:
                    *cy, orow_c = cy
                if record_bts:
                    *cy, btrow_c = cy
                if record_fvals:
                    *cy, frow_c = cy
                else:
                    frow_c = None
                (k, _halt, yr, yi, gr_c, gi_c, tau_c, fwin_c, fwlo_c,
                 maxres_c, trow_c, rrow_c, xar, xai, dar, dai,
                 alpha_c) = cy

                def fb(tau):
                    zr = yr - tau * gr_c
                    zi = yi - tau * gi_c
                    x1r, x1i = prox(zr, zi, tau)
                    dxr = x1r - yr
                    dxi = x1i - yi
                    d1r, d1i = fwd(x1r, x1i)
                    f1, _lr, _li = hinge(d1r, d1i)
                    # trials need only f; the gradient is evaluated at
                    # the extrapolated point after acceptance
                    return x1r, x1i, dxr, dxi, f1, zr, zi, d1r, d1i

                tau = tau_c
                first = fb(tau)
                M = window_max(fwin_c, fwlo_c)
                (tau, x1r, x1i, dxr, dxi, f1, zr, zi,
                 d1r, d1i, bt) = backtrack(fb, first, tau, gr_c, gi_c, M)

                _nd2, res, nres, maxres, stop = resid_stop(
                    tau, x1r, x1i, zr, zi, dxr, dxi, gr_c, gi_c,
                    maxres_c)
                trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)
                if record_its:
                    record_it(k, x1r, x1i)

                if hp and restart_dd:
                    rdot = prec.dd_to_float(dd_dot2(
                        yr - x1r, yi - x1i, x1r - xar, x1i - xai))
                else:
                    rdot = (jnp.sum((yr - x1r) * (x1r - xar))
                            + jnp.sum((yi - x1i) * (x1i - xai)))
                alpha0 = (jnp.where(rdot > 0.0, 1.0, alpha_c)
                          if restart else alpha_c)
                alpha1 = (1.0
                          + jnp.sqrt(1.0 + 4.0 * alpha0 * alpha0)) / 2.0
                beta = (alpha0 - 1.0) / alpha1
                yr_n = x1r + beta * (x1r - xar)
                yi_n = x1i + beta * (x1i - xai)
                dr_n = d1r + beta * (d1r - dar)     # A linear
                di_n = d1i + beta * (d1i - dai)
                f_n, lr_n, li_n = hinge(dr_n, di_n)
                gr_n, gi_n = adj(lr_n, li_n)
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
                out = (k + 1, halt, yr_n, yi_n, gr_n, gi_n, tau,
                       fwin_n, fwlo_n, maxres, trow_n, rrow_n,
                       x1r, x1i, d1r, d1i, alpha1)
                if record_fvals:
                    out += (record_f(k, f_plain(f_rec), frow_c),)
                if record_bts:
                    out += (record_bt(k, bt, btrow_c),)
                if record_objs:
                    # prox-point objective, pre-extrapolation
                    out += (record_obj(k, f_plain(f1) + gval(x1r, x1i),
                                       orow_c),)
                if record_nres:
                    out += (record_nr(k, nres, nrow_c),)
                return out

            init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    x0r, x0i, g0r, g0i, tau0, fwin, fwin_lo,
                    jnp.asarray(-jnp.inf, jnp.float32),
                    jnp.zeros((1, 128), jnp.float32),
                    jnp.zeros((1, 128), jnp.float32),
                    x0r, x0i, d0r, d0i, jnp.asarray(1.0, jnp.float32))
            if record_fvals:
                init += (jnp.zeros((1, 128), jnp.float32),)
            if record_bts:
                init += (jnp.zeros((1, 128), jnp.float32),)
            if record_objs:
                init += (jnp.zeros((1, 128), jnp.float32),)
            if record_nres:
                init += (jnp.zeros((1, 128), jnp.float32),)
            (k, halt, yr_f, yi_f, _gr, _gi, _t, _fw, _fl, _mr, _tr,
             _rr, xar_f, xai_f, _dr, _di,
             _a) = jax.lax.while_loop(cond, body, init)[:17]
            xr_out = jnp.where(halt == 1, xar_f, yr_f)
            xi_out = jnp.where(halt == 1, xai_f, yi_f)
            x_ref[0:1] = xr_out
            x_ref[1:2] = xi_out
            k_ref[0, 0] = k
            conv_ref[0, 0] = halt
            if record_its:
                flush_its(k)
            return

        def body(cy):
            if record_nres:
                *cy, nrow_c = cy
            if record_objs:
                *cy, orow_c = cy
            if record_bts:
                *cy, btrow_c = cy
            if record_fvals:
                *cy, frow_c = cy
            else:
                frow_c = None
            (k, _halt, xr_c, xi_c, gr_c, gi_c, tau_c, fwin_c, fwlo_c,
             maxres_c, trow_c, rrow_c) = cy

            def fb(tau):
                zr = xr_c - tau * gr_c
                zi = xi_c - tau * gi_c
                x1r, x1i = prox(zr, zi, tau)
                dxr = x1r - xr_c
                dxi = x1i - xi_c
                d1r, d1i = fwd(x1r, x1i)
                f1, lr, li = hinge(d1r, d1i)
                g1r, g1i = adj(lr, li)
                return x1r, x1i, dxr, dxi, f1, zr, zi, g1r, g1i

            tau = tau_c
            first = fb(tau)
            M = window_max(fwin_c, fwlo_c)
            (tau, x1r, x1i, dxr, dxi, f1, zr, zi, g1r,
             g1i, bt) = backtrack(fb, first, tau, gr_c, gi_c, M)

            nd2, res, nres, maxres, stop = resid_stop(
                tau, x1r, x1i, zr, zi, dxr, dxi, gr_c, gi_c, maxres_c)
            trow_n, rrow_n = record(k, tau, res, trow_c, rrow_c)
            if record_its:
                record_it(k, x1r, x1i)
            fwin_n = jnp.where(lane_w == (k + 1) % window, f_hi(f1),
                               fwin_c)
            fwlo_n = (jnp.where(lane_w == (k + 1) % window, f1.lo,
                                fwlo_c) if hp else None)

            dgr = g1r + (zr - xr_c) / tau
            dgi = g1i + (zi - xi_c) / tau
            if hp:
                dotprod = prec.dd_to_float(dd_dot2(dxr, dxi, dgr, dgi))
            else:
                dotprod = jnp.sum(dxr * dgr) + jnp.sum(dxi * dgi)
            ndg2 = jnp.sum(dgr * dgr) + jnp.sum(dgi * dgi)
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
            out = (k + 1, halt, x1r, x1i, g1r, g1i, tau_n, fwin_n,
                   fwlo_n, maxres, trow_n, rrow_n)
            if record_fvals:
                out += (record_f(k, f_plain(f1), frow_c),)
            if record_bts:
                out += (record_bt(k, bt, btrow_c),)
            if record_objs:
                out += (record_obj(k, f_plain(f1) + gval(x1r, x1i),
                                   orow_c),)
            if record_nres:
                out += (record_nr(k, nres, nrow_c),)
            return out

        init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                x0r, x0i, g0r, g0i, tau0, fwin, fwin_lo,
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
        (k, halt, xr_f, xi_f, _gr, _gi, _t, _fw, _fl, _mr, _tr,
         _rr) = jax.lax.while_loop(cond, body, init)[:12]
        x_ref[0:1] = xr_f
        x_ref[1:2] = xi_f
        k_ref[0, 0] = k
        conv_ref[0, 0] = halt
        if record_its:
            flush_its(k)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "window", "tol", "shrink_factor",
                     "max_backtracks", "interpret", "hp", "accelerate",
                     "restart", "restart_dd", "engine", "stop_rule",
                     "record_fvals", "record_bts", "record_objs",
                     "record_nres", "record_its"))
def microsolve_planar_phasemax(Ar, Ai, b, c, x0, tau0, max_iters=1000,
                               window=10, tol=1e-3, shrink_factor=0.2,
                               max_backtracks=20, interpret=False,
                               hp=False, accelerate=False, restart=True,
                               restart_dd=False, engine="vpu",
                               stop_rule="hybrid_residual",
                               record_fvals=False, record_bts=False,
                               record_objs=False, record_nres=False,
                               record_its=False):
    """Whole-solve kernel for planar PhaseMax
    ``min ½Σ max(|Ax|−b,0)² − ⟨c,x⟩`` (adaptive BB or FISTA mode).

    Ar/Ai: (m,n) real channel matrices; b: (m,) magnitudes; c: (n,2)
    planar anchor; x0: (n,2) planar start.  Returns (x: (n,2), taus,
    residuals, iteration_count, status) — plus fvals when
    ``record_fvals``, plus bts when ``record_bts``, plus objs
    (prox-point f(x₁) − ⟨c, x₁⟩) when ``record_objs``.  ``status`` is the
    int32 halt code of kernels/microsolver.halt_code (0 max_iters /
    1 converged / 2 nonfinite abort; truthiness-compatible with the
    old converged bool).  Same option semantics as the dense microsolver
    (kernels/microsolver.py), including the five C4 ``stop_rule``s —
    except ``engine``: the planar kernel is VPU-only since the rowt
    rewrite (the MXU A/B variant measured 1.44x slower round-3 and its
    HIGHEST-precision matvec temporaries no longer fit scoped VMEM at
    the flagship size under transposed storage — AOT OOM measured live
    2026-08-20); ``engine="mxu"`` raises.
    """
    from .microsolver import check_stop_rule
    check_stop_rule(stop_rule)
    if engine != "vpu":
        raise ValueError(
            f"planar microsolver: engine={engine!r} is not supported — "
            f"the kernel is VPU-only since the rowt rewrite (the MXU "
            f"variant was measured slower AND exceeds scoped VMEM at "
            f"the flagship size; see _make_kernel's note)")
    m, n = Ar.shape
    kpad = ((max_iters + 127) // 128) * 128
    kern = _make_kernel(m, n, max_iters, window, tol, shrink_factor,
                        max_backtracks, kpad, hp, accelerate, restart,
                        restart_dd, engine, stop_rule, record_fvals,
                        record_bts, record_objs, record_nres,
                        record_its)
    ts = jnp.asarray(tau0, jnp.float32).reshape(1, 1)
    rows = jax.ShapeDtypeStruct((kpad // 128, 128), jnp.float32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_specs = [vspec, vspec, vspec, vspec, vspec, vspec, vspec]
    out_shape = [jax.ShapeDtypeStruct((2, n), jnp.float32),
                 rows, rows, rows, rows, rows, rows]
    npad_it = ((n + 127) // 128) * 128
    kitpad = max(((max_iters + 7) // 8) * 8, 8)
    its_scratch = []
    if record_its:
        # HBM iterate trajectory, both channels side-by-side (see the
        # kernel's record_it)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((kitpad, 2 * npad_it), jnp.float32))
        its_scratch = [pltpu.VMEM((8, 2 * npad_it), jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
    out_specs += [sspec, sspec]
    out_shape += [jax.ShapeDtypeStruct((1, 1), jnp.int32),
                  jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    res_all = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x0 (2,n)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b (1,m)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # c (2,n)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Arᵀ (n,m)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Aiᵀ (n,m)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),    # dr assembly row
            pltpu.VMEM((1, m), jnp.float32),    # di assembly row
            pltpu.VMEM((1, m), jnp.float32),    # adj yr staging row
            pltpu.VMEM((1, m), jnp.float32),    # adj yi staging row
            pltpu.VMEM((max(m // (_row_chunk(m) or m), 1), n),
                       jnp.float32),            # adj gr chunk partials
            pltpu.VMEM((max(m // (_row_chunk(m) or m), 1), n),
                       jnp.float32),            # adj gi chunk partials
        ] + its_scratch,
        compiler_params=pltpu.CompilerParams(
            # both channel windows pinned once + chunked-matvec
            # temporaries (~2 MB live) + headroom for modest spills.
            vmem_limit_bytes=min(100 << 20,
                                 2 * m * n * 4 + (32 << 20)),
        ),
        interpret=interpret,
        # the kernel consumes TRANSPOSED (n, m) channel windows (see
        # fwd/adj above); the one-time XLA transposes cost two HBM
        # passes per launch, amortized over the whole solve
    )(x0.T.reshape(2, n), b.reshape(1, m), c.T.reshape(2, n), ts,
      Ar.T, Ai.T)
    x, taus, res, fv, bts, objs, nrs = res_all[:7]
    its = res_all[7] if record_its else None
    k, conv = res_all[-2], res_all[-1]
    out = (x.T, taus.reshape(kpad)[:max_iters],
           res.reshape(kpad)[:max_iters], k[0, 0], conv[0, 0])
    if record_fvals:
        out += (fv.reshape(kpad)[:max_iters],)
    if record_bts:
        out += (bts.reshape(kpad)[:max_iters],)
    if record_objs:
        out += (objs.reshape(kpad)[:max_iters],)
    if record_its:
        # (kitpad, 2*npad) -> (max_iters, n, 2) matching the planar
        # solution convention
        out += (jnp.stack([its[:max_iters, :n],
                           its[:max_iters, npad_it:npad_it + n]],
                          axis=-1),)
    if record_nres:
        out += (nrs.reshape(kpad)[:max_iters],)
    return out
