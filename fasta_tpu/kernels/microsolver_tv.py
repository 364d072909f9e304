"""On-chip TV microsolver: the whole TV-denoising dual solve in ONE
kernel launch.

The TV iteration is LAUNCH-bound (STATUS.md: the 512×512 state is ~5 MB,
VMEM-resident, but XLA dispatches ~20 small kernels per iteration and
gradmap-only fusion measured 1.00×).  Whole-solve fusion is the fix:
this kernel runs the complete adaptive FBS loop for

    min_p ½‖μ·div p − b‖²   s.t. ‖p‖∞ ≤ 1      (dual of TV denoising)

— forward divergence and adjoint gradient as sublane/lane rolls with
edge masks (bit-exact vs XLA, see kernels/tv_fused.py), box projection,
nonmonotone backtracking, ZGD BB stepsize, hybrid stopping and
diagnostics — with zero per-iteration launches and zero HBM round trips.
Dual field carried as two (H, W) channel values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["microsolve_tv"]

_WPAD = 128


def _make_kernel(h, w, max_iters, window, tol, mu, shrink_factor,
                 max_backtracks, kpad):
    def kernel(b_ref, ts_ref, pv_ref, ph_ref,
               xv_ref, xh_ref, taus_ref, res_ref, k_ref, conv_ref):
        b = b_ref[:]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, _WPAD), 1)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, kpad), 1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        mrow = (ridx < h - 1).astype(jnp.float32)
        mcol = (cidx < w - 1).astype(jnp.float32)

        def gradmap(pv, ph):
            q = pv * mrow
            s = ph * mcol
            d = mu * ((pltpu.roll(q, 1, 0) - q)
                      + (pltpu.roll(s, 1, 1) - s))
            r = d - b
            f = 0.5 * jnp.sum(r * r)
            gv = mu * (pltpu.roll(r, h - 1, 0) - r) * mrow
            gh = mu * (pltpu.roll(r, w - 1, 1) - r) * mcol
            return f, gv, gh

        pv0 = pv_ref[:]
        ph0 = ph_ref[:]
        tau0 = ts_ref[0]
        f0, gv0, gh0 = gradmap(pv0, ph0)
        fwin = jnp.where(lane_w == 0, f0,
                         jnp.full((1, _WPAD), -jnp.inf, jnp.float32))

        def clamp(z):
            return jnp.clip(z, -1.0, 1.0)

        def cond(c):
            return (c[0] < max_iters) & (~c[1])

        def body(c):
            (k, _stop, pv_c, ph_c, gv_c, gh_c, tau_c, fwin_c, maxres_c,
             taus_c, res_c) = c

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
            zv, zh, xv, xh, dv, dh, f1, gv1, gh1 = fb(tau)
            M = jnp.max(fwin_c)

            def bt_cond(bc):
                (tau_b, _zv, _zh, _xv, _xh, dv_b, dh_b, f1_b, _gv,
                 _gh, cnt) = bc
                rdg = jnp.sum(dv_b * gv_c) + jnp.sum(dh_b * gh_c)
                nd2 = jnp.sum(dv_b * dv_b) + jnp.sum(dh_b * dh_b)
                return ((f1_b - 1e-12 > M + rdg + nd2 / (2.0 * tau_b))
                        & (cnt < max_backtracks))

            def bt_body(bc):
                tau_b, *_, cnt = bc
                tau_n = tau_b * shrink_factor
                return (tau_n,) + fb(tau_n) + (cnt + 1,)

            (tau, zv, zh, xv, xh, dv, dh, f1, gv1, gh1,
             _bt) = jax.lax.while_loop(
                bt_cond, bt_body,
                (tau, zv, zh, xv, xh, dv, dh, f1, gv1, gh1,
                 jnp.zeros((), jnp.int32)))

            nd2 = jnp.sum(dv * dv) + jnp.sum(dh * dh)
            res = jnp.sqrt(nd2) / tau
            maxres = jnp.maximum(maxres_c, res)
            smv = xv - zv
            smh = xh - zh
            ng2 = jnp.sum(gv_c * gv_c) + jnp.sum(gh_c * gh_c)
            nsm2 = jnp.sum(smv * smv) + jnp.sum(smh * smh)
            normalizer = jnp.maximum(jnp.sqrt(ng2),
                                     jnp.sqrt(nsm2) / tau) + 1e-8
            nres = res / normalizer
            stop = ((res / (maxres + 1e-8) < tol) | (nres < tol))

            taus_n = jnp.where(lane_k == k, tau, taus_c)
            res_n = jnp.where(lane_k == k, res, res_c)
            fwin_n = jnp.where(lane_w == (k + 1) % window, f1, fwin_c)

            dgv = gv1 + (zv - pv_c) / tau
            dgh = gh1 + (zh - ph_c) / tau
            dotprod = jnp.sum(dv * dgv) + jnp.sum(dh * dgh)
            ndg2 = jnp.sum(dgv * dgv) + jnp.sum(dgh * dgh)
            tau_s = jnp.where(dotprod != 0.0, nd2 / dotprod, jnp.inf)
            tau_m = jnp.maximum(
                jnp.where(ndg2 > 0.0, dotprod / ndg2, 0.0), 0.0)
            tau_n = jnp.where(2.0 * tau_m > tau_s, tau_m,
                              tau_s - 0.5 * tau_m)
            deg = (tau_n <= 0.0) | jnp.isinf(tau_n) | jnp.isnan(tau_n)
            tau_n = jnp.where(deg, tau * 1.5, tau_n)

            return (k + 1, stop, xv, xh, gv1, gh1, tau_n, fwin_n,
                    maxres, taus_n, res_n)

        init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
                pv0, ph0, gv0, gh0, tau0, fwin,
                jnp.asarray(-jnp.inf, jnp.float32),
                jnp.zeros((1, kpad), jnp.float32),
                jnp.zeros((1, kpad), jnp.float32))
        (k, stop, xv_f, xh_f, _gv, _gh, _tau, _fw, _mr, taus_f,
         res_f) = jax.lax.while_loop(cond, body, init)

        xv_ref[:] = xv_f
        xh_ref[:] = xh_f
        taus_ref[:] = taus_f
        res_ref[:] = res_f
        k_ref[0, 0] = k
        conv_ref[0, 0] = stop.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mu", "max_iters", "window", "tol", "shrink_factor",
                     "max_backtracks", "interpret"))
def microsolve_tv(b, p0, tau0, mu, max_iters=2000, window=10, tol=1e-5,
                  shrink_factor=0.2, max_backtracks=20, interpret=False):
    """Whole-solve kernel for the TV dual (adaptive mode).

    b: (H,W) noisy image; p0: (2,H,W) dual init.  Returns
    (p: (2,H,W), taus, residuals, iteration_count, converged).
    """
    h, w = b.shape
    kpad = ((max_iters + 127) // 128) * 128
    kern = _make_kernel(h, w, max_iters, window, tol, mu, shrink_factor,
                        max_backtracks, kpad)
    ts = jnp.stack([jnp.asarray(tau0, jnp.float32)])
    xv, xh, taus, res, k, conv = pl.pallas_call(
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((1, kpad), jnp.float32),
            jax.ShapeDtypeStruct((1, kpad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 40 * h * w * 4 + (16 << 20)),
        ),
        interpret=interpret,
    )(b, ts, p0[0], p0[1])
    return (jnp.stack([xv, xh]), taus.reshape(kpad)[:max_iters],
            res.reshape(kpad)[:max_iters], k[0, 0], conv[0, 0] > 0)
