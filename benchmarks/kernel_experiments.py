"""Hardware kernel experiments — run when a real TPU is available.

Measures, with host-readback timing (the tunneled backend's
block_until_ready returns at dispatch):

  1. bf16-storage solver (LowPrecDenseOp) vs f32 at the HBM-bound size —
     the mixed-precision fast path's actual speedup;
  2. fused MXU kernel at Precision.HIGH (bf16x3) vs HIGHEST — accuracy
     and in-loop speed (HIGH halves the MXU passes; if accuracy holds at
     ~f32 level and the kernel becomes DMA-bound, the one-pass design
     finally beats XLA's two passes).

Usage:  python benchmarks/kernel_experiments.py
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


def main():
    import os

    import problems
    import fasta_tpu as ft
    from fasta_tpu import FastaOptions, make_solver
    from fasta_tpu.kernels import lstsq_fused as K

    m, n = 8192, 16384
    prob = problems.build("lasso", m=m, n=n, k=400)

    def bench_solver(op, iters, env="0"):
        os.environ["FASTA_TPU_PALLAS"] = env
        opts = FastaOptions(max_iters=iters, stop_rule="iterations")
        solve = make_solver(opts)
        args = (op, prob.fterm, prob.gterm, jnp.asarray(prob.x0),
                jnp.asarray(0.05, jnp.float32))
        warm = solve(*args)
        float(jnp.sum(warm.taus))
        # subtract the readback-barrier round trip (docs/PERF.md)
        barrier = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(warm.taus))
            barrier = min(barrier, time.perf_counter() - t0)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(solve(*args).taus))
            best = min(best, time.perf_counter() - t0)
        return iters / max(best - barrier, 1e-9)

    # 1. bf16 storage vs f32
    r32 = bench_solver(prob.op, 50)
    print(f"f32 xla: {r32:.1f} it/s -> {2*m*n*4*r32/1e9:.0f} GB/s",
          flush=True)
    op16 = ft.LowPrecDenseOp.from_dense(prob.instance["A"])
    r16 = bench_solver(op16, 52)
    print(f"bf16 storage: {r16:.1f} it/s -> {2*m*n*2*r16/1e9:.0f} GB/s "
          f"({r16/r32:.2f}x vs f32)", flush=True)

    # 2. MXU kernel precision HIGH: accuracy + raw speed
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    An, xn, bn = (np.asarray(A, np.float64), np.asarray(x, np.float64),
                  np.asarray(b, np.float64))
    gt = An.T @ (An @ xn - bn)
    # NOTE: Mosaic supports only DEFAULT/HIGHEST dot precision; HIGH
    # (bf16x3) raises NotImplementedError — kept here as a probe for
    # future toolchains.
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH):
        try:
            d, f, g = K.fused_lstsq_gradmap(A, x, b, variant="mxu",
                                            precision=prec)
        except NotImplementedError as e:
            print(f"mxu {prec}: unsupported by Mosaic ({e})", flush=True)
            continue
        gerr = float(np.abs(np.asarray(g, np.float64) - gt).max()
                     / np.abs(gt).max())
        # in-loop timing: fixed-point iterate the kernel
        @jax.jit
        def loop(A, x, b, prec=prec):
            def body(i, x):
                d, f, g = K.fused_lstsq_gradmap(A, x, b, variant="mxu",
                                                precision=prec)
                return x - 1e-6 * g
            return jax.lax.fori_loop(0, 20, body, x)
        float(jnp.sum(loop(A, x, b)))
        t0 = time.perf_counter()
        float(jnp.sum(loop(A, x, b)))
        per = (time.perf_counter() - t0) / 20
        print(f"mxu {prec}: g rel {gerr:.2e}; {per*1e6:.0f} us/iter -> "
              f"{m*n*4/per/1e9:.0f} GB/s 1-pass", flush=True)


if __name__ == "__main__":
    main()
