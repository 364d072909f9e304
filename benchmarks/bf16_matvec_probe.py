"""Probe: is the VPU whole-solve matvec VMEM-READ-bound?  VERDICT: NO.

The dense microsolver's iteration is ~2 reads of A (fwd + adj) on the
broadcast-reduce VPU path.  If those reads were the bound, storing A
as bf16 (half the VMEM bytes, upcast in registers) should approach 2x.
This probe times K data-chained fwd+adj pass pairs inside ONE kernel
for f32 vs bf16 storage at the 1000x2000 baseline shape.

Measured live 2026-08-19 (K=40000, RTT-subtracted):
  f32   1.434 us/pass-pair  (11.2 TB/s implied VMEM reads)
  bf16  2.106 us/pass-pair  -> bf16 storage is 0.68x = SLOWER
The per-element bf16->f32 upcast on the VPU costs more than the
halved reads save — the f32 path is compute-issue-bound, not
read-bound.  Additionally the full solve spends only ~45% of its
3.2 us/iter in the matvec pair, so even a 2x matvec win would cap at
~1.3x end-to-end.  bf16 VMEM storage for the dense microsolver is
NOT a win; do not revisit without new hardware.  (bf16 remains a win
in the HBM-STREAMING regime — kernels/lstsq_fused.py — where the
bound really is bytes moved.)

Run on the live TPU:  python benchmarks/bf16_matvec_probe.py
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

M, N, K = 1000, 2000, 40000


def make(dtype):
    def kern(A_ref, x0_ref, o_ref):
        A = A_ref[:]                      # (M,N) f32 or bf16
        x0 = x0_ref[:]                    # (1,N) f32

        def body(i, x):
            d = jnp.sum(A * x, axis=1).reshape(1, M)          # fwd
            g = jnp.sum(A * d.reshape(M, 1), axis=0).reshape(1, N)
            return x0 + 0.0 * g           # data dep; not foldable

        o_ref[:] = jax.lax.fori_loop(0, K, body, x0)

    @jax.jit
    def run(A, x0):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )(A.astype(dtype), x0)

    return run


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)

    tiny = jax.jit(lambda i: jnp.sum(jnp.zeros(8) + i))
    float(tiny(0))
    rtt = 1e9
    for i in range(1, 4):
        t0 = time.perf_counter(); float(tiny(i))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"# rtt {rtt*1e3:.1f} ms; {K} fwd+adj pass pairs per readback")

    walls = {}
    for dt, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        run = make(dt)
        float(jnp.sum(run(A, x0)))        # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(A, x0)))
            best = min(best, time.perf_counter() - t0 - rtt)
        bytes_per_pair = 2 * M * N * (4 if dt == jnp.float32 else 2)
        gbps = bytes_per_pair * K / best / 1e9
        walls[label] = best
        print(f"{label}: {best/K*1e6:7.3f} us/pass-pair "
              f"({gbps:,.0f} GB/s VMEM-read implied)")
    print(f"bf16 speedup: {walls['f32']/walls['bf16']:.2f}x")


if __name__ == "__main__":
    main()
