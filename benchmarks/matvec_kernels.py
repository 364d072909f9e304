"""VMEM-resident GEMV formulation shootout (round-2 perf work).

The whole-solve microsolver's iteration cost is dominated by the two
matvecs over the VMEM-pinned operand.  This bench times each candidate
formulation in isolation: one pallas_call runs K dependent repetitions
inside a fori_loop (the result feeds the next input, so nothing can be
DCE'd or overlapped away), giving per-op cost free of launch overhead.

Measured 2026-08-17 (v5e, 1000×2048 f32, K=2000):

  fwd_mxu      13.74 us   dot_general HIGHEST (6 bf16 passes)
  fwd_vpu      12.57 us   jnp.sum(A*x, axis=1) — materializes (m,n)
  fwd_strip     see run   per-8-row strips, register accumulator
  adj_mxu/vpu   see run
  gradmap_fused see run   ONE pass over A producing (f, g): per strip
                          compute r, then immediately g_acc += A·r —
                          A is read once per ITERATION, accumulators
                          live in registers.

Run on the TPU:  python benchmarks/matvec_kernels.py [K]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PREC = jax.lax.Precision.HIGHEST


def _body_factory(variant, m, n, K):
    NB = n // 128

    def kernel(A_ref, x0_ref, b_ref, out_ref):
        A = A_ref[:]

        def fwd_mxu(x):
            return jax.lax.dot_general(
                x, A, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC)

        def fwd_vpu(x):
            return jnp.sum(A * x, axis=1).reshape(1, m)

        def adj_vpu(r):
            return jnp.sum(A * r.reshape(m, 1), axis=0).reshape(1, n)

        def adj_mxu(r):
            return jax.lax.dot_general(
                r, A, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC)

        def fwd_strip(x):
            """Row strips of 8; (8,128) register accumulator; scalar
            carry only (timing formulation — real use stores r).
            x is pre-broadcast to (8, n) once (Mosaic rejects the
            per-block (1,128)->(8,128) sublane broadcast)."""
            # jnp.zeros + x: the one sublane-broadcast formulation this
            # Mosaic version accepts (vector.broadcast from a
            # replicated-sublane layout is rejected)
            x8 = jnp.zeros((8, n), jnp.float32) + x
            def strip_step(ib, s):
                strip = A_ref[pl.ds(ib * 8, 8), :]
                acc = jnp.zeros((8, 128), jnp.float32)
                for jb in range(NB):
                    acc = acc + (strip[:, jb * 128:(jb + 1) * 128]
                                 * x8[:, jb * 128:(jb + 1) * 128])
                d8 = jnp.sum(acc, axis=1)            # (8,)
                return s + jnp.sum(d8)
            return jax.lax.fori_loop(0, m // 8, strip_step,
                                     jnp.zeros((), jnp.float32))

        def fwd_strip_auto(x):
            """Row strips; let Mosaic lower the strip-level
            multiply+lane-reduce itself."""
            def strip_step(ib, s):
                strip = A_ref[pl.ds(ib * 8, 8), :]
                d8 = jnp.sum(strip * x, axis=1)      # (8,)
                return s + jnp.sum(d8)
            return jax.lax.fori_loop(0, m // 8, strip_step,
                                     jnp.zeros((), jnp.float32))

        def gradmap_fused(x):
            """ONE pass over A: residual strip then gradient update —
            the FBS gradmap (f, g) with A read once.  b arrives as an
            (m, 1) column so strips slice the REF (Mosaic has no
            dynamic_slice on values)."""

            x8 = jnp.zeros((8, n), jnp.float32) + x

            def strip_step(ib, carry):
                g_acc, f_acc = carry
                strip = A_ref[pl.ds(ib * 8, 8), :]
                acc = jnp.zeros((8, 128), jnp.float32)
                for jb in range(NB):
                    acc = acc + (strip[:, jb * 128:(jb + 1) * 128]
                                 * x8[:, jb * 128:(jb + 1) * 128])
                b8 = b_ref[pl.ds(ib * 8, 8), :]
                r8 = jnp.sum(acc, axis=1, keepdims=True) - b8
                f_acc = f_acc + 0.5 * jnp.sum(r8 * r8)
                g_acc = g_acc + strip * r8           # (8,n)·(8,1)
                return g_acc, f_acc

            g_acc, f = jax.lax.fori_loop(
                0, m // 8, strip_step,
                (jnp.zeros((8, n), jnp.float32), jnp.zeros((), jnp.float32)))
            g = jnp.sum(g_acc, axis=0).reshape(1, n)
            return f, g

        x0 = x0_ref[:]

        if variant in ("fwd_mxu", "fwd_vpu"):
            fwd = {"fwd_mxu": fwd_mxu, "fwd_vpu": fwd_vpu}[variant]

            def step(_, x):
                d = fwd(x)
                return x + d[0, 0] * 1e-9
            out_ref[:] = jax.lax.fori_loop(0, K, step, x0)
        elif variant in ("fwd_strip", "fwd_strip_auto"):
            fss = {"fwd_strip": fwd_strip,
                   "fwd_strip_auto": fwd_strip_auto}[variant]

            def step(_, x):
                s = fss(x)
                return x + s * 1e-9
            out_ref[:] = jax.lax.fori_loop(0, K, step, x0)
        elif variant == "gradmap_fused":
            def step(_, x):
                f, g = gradmap_fused(x)
                return x + g * 1e-12 + f * 1e-12
            out_ref[:] = jax.lax.fori_loop(0, K, step, x0)
        else:
            adj = {"adj_vpu": adj_vpu, "adj_mxu": adj_mxu}[variant]

            def step(_, xn):
                r = jnp.broadcast_to(xn[0, 0], (1, m))
                g = adj(r)
                return xn + g * 1e-9
            out_ref[:] = jax.lax.fori_loop(0, K, step, x0)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "K"))
def run_variant(A, x0, b, variant, K):
    m, n = A.shape
    kern = _body_factory(variant, m, n, K)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 4 * m * n * 4 + (32 << 20)),
        ),
    )(A, x0, b)


def check_gradmap_correct(A, x, b):
    """Interpret-free correctness probe on the real backend: one fused
    gradmap against the XLA reference."""
    m, n = A.shape

    def kern(A_ref, x_ref, b_ref, f_ref, g_ref):
        NB = n // 128
        xv = x_ref[:]

        x8 = jnp.zeros((8, n), jnp.float32) + xv

        def strip_step(ib, carry):
            g_acc, f_acc = carry
            strip = A_ref[pl.ds(ib * 8, 8), :]
            acc = jnp.zeros((8, 128), jnp.float32)
            for jb in range(NB):
                acc = acc + (strip[:, jb * 128:(jb + 1) * 128]
                             * x8[:, jb * 128:(jb + 1) * 128])
            b8 = b_ref[pl.ds(ib * 8, 8), :]
            r8 = jnp.sum(acc, axis=1, keepdims=True) - b8
            f_acc = f_acc + 0.5 * jnp.sum(r8 * r8)
            g_acc = g_acc + strip * r8
            return g_acc, f_acc

        g_acc, f = jax.lax.fori_loop(
            0, m // 8, strip_step,
            (jnp.zeros((8, n), jnp.float32), jnp.zeros((), jnp.float32)))
        g_ref[:] = jnp.sum(g_acc, axis=0).reshape(1, n)
        f_ref[0, 0] = f

    f, g = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 4 * m * n * 4 + (32 << 20))),
    )(A, x, b)
    r = A @ x[0] - b[:, 0]
    f_ref = 0.5 * float(r @ r)
    g_ref = A.T @ r
    ferr = abs(float(f[0, 0]) - f_ref) / max(abs(f_ref), 1e-30)
    gerr = float(jnp.linalg.norm(g[0] - g_ref)
                 / jnp.maximum(jnp.linalg.norm(g_ref), 1e-30))
    print(f"gradmap_fused correctness: f rel {ferr:.2e}, g rel {gerr:.2e}",
          flush=True)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    m, n = 1000, 2048          # n padded to a lane multiple
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32) / 40)
    xn = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((m, 1)).astype(np.float32))

    try:
        check_gradmap_correct(A, xn, b)
    except Exception as e:
        print("gradmap correctness probe FAILED:",
              str(e).splitlines()[0][:200], flush=True)

    for variant in ("fwd_strip", "fwd_strip_auto", "gradmap_fused",
                    "adj_mxu", "adj_vpu", "fwd_mxu", "fwd_vpu"):
        try:
            t0 = time.time()
            out = run_variant(A, xn, b, variant, K)
            _ = float(jnp.sum(out))
            first = time.time() - t0
        except Exception as e:
            print(f"{variant:>13}: FAILED "
                  + str(e).splitlines()[0][:160], flush=True)
            continue
        best = 1e9
        for _i in range(3):
            t0 = time.time()
            out = run_variant(A, xn, b, variant, K)
            _ = float(jnp.sum(out))
            best = min(best, time.time() - t0)
        per = best / K * 1e6
        gbps = m * n * 4 / (best / K) / 1e9
        print(f"{variant:>13}: {per:8.2f} us/op   "
              f"({gbps:6.0f} GB/s A-read equiv; compile+first "
              f"{first:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
