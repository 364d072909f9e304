"""On-chip microsolver: the ENTIRE adaptive FASTA loop in ONE kernel.

For VMEM-resident problems (dense A up to ~tens of MB — which includes
the BASELINE 1000×2000 LASSO at 8 MB) the jitted XLA loop is bound by
per-iteration kernel-launch and loop overhead, not arithmetic: the chip
could run an iteration in ~10 µs of VMEM traffic but spends several
times that dispatching the ~20 small kernels of the loop body.

This kernel is the logical extreme of fusion: ONE ``pallas_call`` runs
the full solve — matrix pinned in VMEM across ALL iterations, the
while_loop, the L1 prox, the nonmonotone backtracking line search, the
Zhou–Gao–Dai BB stepsize, the hybrid stopping rule and the diagnostics
ring all execute on-core with zero HBM round trips and zero launches
per iteration.  Iteration math is the oracle's, bit-compatible with the
main solver at f32 (Precision.HIGHEST MXU matvecs).

Scope (v1): adaptive mode + soft-threshold prox (LASSO/BPDN family),
real f32, single chip.  The general solver remains the XLA while_loop;
this is the speed-of-light path for the headline workload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["microsolve_lasso", "supports_microsolver"]

_WPAD = 128          # nonmonotone window ring, padded to one lane row


def supports_microsolver(m: int, n: int, dtype) -> bool:
    import os
    vmem_ok = m * n * 4 <= (24 << 20)
    return (os.environ.get("FASTA_TPU_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and vmem_ok)


def _make_kernel(m, n, max_iters, window, tol, mu, shrink_factor,
                 max_backtracks, kpad, engine="mxu", prox="l1"):
    prec = jax.lax.Precision.HIGHEST

    def kernel(x0_ref, b_ref, ts_ref, A_ref,
               x_ref, taus_ref, res_ref, k_ref, conv_ref):
        A = A_ref[:]                       # (m, n) pinned in VMEM
        b = b_ref[:]                       # (1, m)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, _WPAD), 1)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, kpad), 1)

        def matvecs(x):
            # d = x Aᵀ : (1,n)·(m,n)ᵀ → (1,m);  g = r A : (1,m)·(m,n)
            if engine == "vpu":
                # GEMV wastes 127/128 MXU rows; the VPU broadcast+reduce
                # formulation avoids the multi-pass MXU latency.
                d = jnp.sum(A * x, axis=1).reshape(1, m)
                r = d - b
                f = 0.5 * jnp.sum(r * r)
                g = jnp.sum(A * r.reshape(m, 1), axis=0).reshape(1, n)
                return f, g
            d = jax.lax.dot_general(
                x, A, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            r = d - b
            f = 0.5 * jnp.sum(r * r)
            g = jax.lax.dot_general(
                r, A, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            return f, g

        x0 = x0_ref[:]                     # (1, n)
        tau0 = ts_ref[0]
        f0, g0 = matvecs(x0)
        fwin = jnp.where(lane_w == 0, f0,
                         jnp.full((1, _WPAD), -jnp.inf, jnp.float32))

        if prox == "l1":
            def shrink(z, t):
                mag = jnp.abs(z)
                return z * (jnp.maximum(mag - t, 0.0)
                            / jnp.maximum(mag, 1e-30))
        elif prox == "nonneg":
            def shrink(z, t):
                return jnp.maximum(z, 0.0)
        elif prox == "box":
            def shrink(z, t):
                return jnp.clip(z, -1.0, 1.0)
        else:                              # pragma: no cover
            raise ValueError(f"unknown prox {prox!r}")

        # carry: k, stop, x, gradf, tau, fwin, max_res, taus, res, bt_tot
        def cond(c):
            return (c[0] < max_iters) & (~c[1])

        def body(c):
            (k, _stop, x_c, g_c, tau_c, fwin_c, maxres_c, taus_c,
             res_c) = c

            def fb(tau):
                x1hat = x_c - tau * g_c
                x1 = shrink(x1hat, tau * mu)
                dx = x1 - x_c
                f1, g1 = matvecs(x1)
                return x1hat, x1, dx, f1, g1

            tau = tau_c
            x1hat, x1, dx, f1, g1 = fb(tau)
            M = jnp.max(fwin_c)

            def bt_cond(bc):
                tau_b, _x1hat, _x1, dx_b, f1_b, _g1, cnt = bc
                suff = (M + jnp.sum(dx_b * g_c)
                        + jnp.sum(dx_b * dx_b) / (2.0 * tau_b))
                return (f1_b - 1e-12 > suff) & (cnt < max_backtracks)

            def bt_body(bc):
                tau_b, *_, cnt = bc
                tau_n = tau_b * shrink_factor
                return (tau_n,) + fb(tau_n) + (cnt + 1,)

            tau, x1hat, x1, dx, f1, g1, _bt = jax.lax.while_loop(
                bt_cond, bt_body,
                (tau, x1hat, x1, dx, f1, g1, jnp.zeros((), jnp.int32)))

            ndx2 = jnp.sum(dx * dx)
            res = jnp.sqrt(ndx2) / tau
            maxres = jnp.maximum(maxres_c, res)
            sm = x1 - x1hat
            normalizer = jnp.maximum(
                jnp.sqrt(jnp.sum(g_c * g_c)),
                jnp.sqrt(jnp.sum(sm * sm)) / tau) + 1e-8
            nres = res / normalizer
            stop = ((res / (maxres + 1e-8) < tol) | (nres < tol))

            taus_n = jnp.where(lane_k == k, tau, taus_c)
            res_n = jnp.where(lane_k == k, res, res_c)
            fwin_n = jnp.where(lane_w == (k + 1) % window, f1, fwin_c)

            # BB (Zhou–Gao–Dai hybrid)
            dg = g1 + (x1hat - x_c) / tau
            dotprod = jnp.sum(dx * dg)
            ndg2 = jnp.sum(dg * dg)
            tau_s = jnp.where(dotprod != 0.0, ndx2 / dotprod, jnp.inf)
            tau_m = jnp.maximum(
                jnp.where(ndg2 > 0.0, dotprod / ndg2, 0.0), 0.0)
            tau_n = jnp.where(2.0 * tau_m > tau_s, tau_m,
                              tau_s - 0.5 * tau_m)
            bad = (tau_n <= 0.0) | jnp.isinf(tau_n) | jnp.isnan(tau_n)
            tau_n = jnp.where(bad, tau * 1.5, tau_n)

            return (k + 1, stop, x1, g1, tau_n, fwin_n, maxres,
                    taus_n, res_n)

        init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
                x0, g0, tau0, fwin,
                jnp.asarray(-jnp.inf, jnp.float32),
                jnp.zeros((1, kpad), jnp.float32),
                jnp.zeros((1, kpad), jnp.float32))
        (k, stop, x_f, _gf, _tauf, _fw, _mr, taus_f,
         res_f) = jax.lax.while_loop(cond, body, init)

        x_ref[:] = x_f
        taus_ref[:] = taus_f
        res_ref[:] = res_f
        k_ref[0, 0] = k
        conv_ref[0, 0] = stop.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mu", "max_iters", "window", "tol", "shrink_factor",
                     "max_backtracks", "interpret", "engine", "prox"))
def microsolve_lasso(A, b, x0, tau0, mu, max_iters=1000, window=10,
                     tol=1e-3, shrink_factor=0.2, max_backtracks=20,
                     interpret=False, engine="mxu", prox="l1"):
    """Whole-solve kernel for  min ½‖Ax−b‖² + g(x)  (adaptive mode) with
    g selected by ``prox``: "l1" (μ‖·‖₁ — LASSO/BPDN), "nonneg" (NNLS),
    or "box" ([−1,1] indicator).

    Returns (x, taus[max_iters], residuals[max_iters], iteration_count,
    converged).
    """
    m, n = A.shape
    kpad = ((max_iters + 127) // 128) * 128
    kern = _make_kernel(m, n, max_iters, window, tol, mu, shrink_factor,
                        max_backtracks, kpad, engine, prox)
    ts = jnp.stack([jnp.asarray(tau0, jnp.float32)])
    x, taus, res, k, conv = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x0 (1,n)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b (1,m)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),      # A (m,n)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x (1,n)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # taus (1,kpad)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # res (1,kpad)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # k (1,1)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # conv (1,1)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, kpad), jnp.float32),
            jax.ShapeDtypeStruct((1, kpad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # A + loop-carried vectors + compiler temporaries; v5e VMEM
            # is 128 MB, leave headroom for the runtime
            vmem_limit_bytes=min(100 << 20, 4 * m * n * 4 + (48 << 20)),
        ),
        interpret=interpret,
    )(x0.reshape(1, n), b.reshape(1, m), ts, A)
    return (x.reshape(n), taus.reshape(kpad)[:max_iters],
            res.reshape(kpad)[:max_iters], k[0, 0], conv[0, 0] > 0)
