"""VMEM-resident GEMV formulation shootout (round-2 perf work).

The whole-solve microsolver's iteration cost is dominated by the two
matvecs over the VMEM-pinned operand.  This bench times each candidate
formulation in isolation: one pallas_call runs K dependent repetitions
of the matvec inside a fori_loop (the result feeds the next input, so
nothing can be DCE'd or overlapped away), giving per-matvec cost free
of launch overhead.

Formulations:
  fwd_mxu      d = x Aᵀ via dot_general, Precision.HIGHEST (6 passes)
  fwd_vpu      d = Σ_j A*x over the LANE axis (naive jnp.sum(axis=1))
  fwd_strip    per-8-row strip: register accumulator over column
               blocks, one lane-reduce per strip (no (m,n) temporary)
  adj_vpu      g = Σ_i A*r over the SUBLANE axis (jnp.sum(axis=0))
  adj_mxu      g = r A via dot_general HIGHEST

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
    def kernel(A_ref, x0_ref, out_ref):
        A = A_ref[:]

        def fwd_mxu(x):
            return jax.lax.dot_general(
                x, A, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC)

        def fwd_vpu(x):
            return jnp.sum(A * x, axis=1).reshape(1, m)

        def fwd_strip(x):
            # per-8-row strips (fori over strips, static column
            # blocks): register-resident (8,128) accumulator, one
            # lane-reduce per strip, NO (m,n) temporary.  Output in
            # (m/8, 8) sublane-major layout (timing only).
            xb = x.reshape(n // 128, 128)   # static reshape

            def strip_step(ib, out):
                strip = jax.lax.dynamic_slice(A, (ib * 8, 0), (8, n))
                acc = jnp.zeros((8, 128), jnp.float32)
                for jb in range(n // 128):
                    acc = acc + (strip[:, jb * 128:(jb + 1) * 128]
                                 * xb[jb].reshape(1, 128))
                row = jnp.sum(acc, axis=1).reshape(1, 8)
                return jax.lax.dynamic_update_slice(out, row, (ib, 0))

            return jax.lax.fori_loop(0, m // 8, strip_step,
                                     jnp.zeros((m // 8, 8), jnp.float32))

        def adj_vpu(r):
            return jnp.sum(A * r.reshape(m, 1), axis=0).reshape(1, n)

        def adj_mxu(r):
            return jax.lax.dot_general(
                r, A, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC)

        fwd = {"fwd_mxu": fwd_mxu, "fwd_vpu": fwd_vpu,
               "fwd_strip": fwd_strip}.get(variant)
        adj = {"adj_vpu": adj_vpu, "adj_mxu": adj_mxu}.get(variant)

        if fwd is not None:
            def step(_, x):
                d = fwd(x)
                # cheap dependency back to an n-vector: broadcast one
                # lane of d into x's shape via a scalar
                s = d[0, 0] * 1e-9
                return x + s
            out_ref[:] = jax.lax.fori_loop(0, K, step, x0_ref[:])
        else:
            def step(_, xn):
                # xn is an n-vector carrier; build an m-vector, adjoint
                # it back — the adjoint dominates (the build is O(m))
                r = jnp.broadcast_to(xn[0, 0], (1, m))
                g = adj(r)
                return xn + g * 1e-9
            out_ref[:] = jax.lax.fori_loop(0, K, step, x0_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "K"))
def run_variant(A, x0, variant, K):
    m, n = A.shape
    kern = _body_factory(variant, m, n, K)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 << 20, 4 * m * n * 4 + (32 << 20)),
        ),
    )(A, x0)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    m, n = 1000, 2048          # n padded to a lane multiple
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    xn = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

    for variant in ("fwd_mxu", "fwd_vpu", "fwd_strip", "adj_mxu",
                    "adj_vpu"):
        t0 = time.time()
        out = run_variant(A, xn, variant, K)
        _ = float(jnp.sum(out))
        first = time.time() - t0
        best = 1e9
        for _i in range(3):
            t0 = time.time()
            out = run_variant(A, xn, variant, K)
            _ = float(jnp.sum(out))
            best = min(best, time.time() - t0)
        per = best / K * 1e6
        gbps = m * n * 4 / (best / K) / 1e9
        print(f"{variant:>10}: {per:8.2f} us/matvec   "
              f"({gbps:6.0f} GB/s A-traffic equiv; compile+first "
              f"{first:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
