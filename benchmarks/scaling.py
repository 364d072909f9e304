"""Sharded-solve scaling demonstration on virtual devices.

Real multi-chip hardware is not reachable from this environment (one
tunneled TPU chip), so wall-clock scaling numbers here would be
meaningless — virtual CPU devices share one core.  What IS meaningful
and measured here:

  * the compiled collective count stays O(1) per iteration as the mesh
    grows (one fused psum per gradmap evaluation);
  * per-device memory/FLOPs shrink as 1/N (per-device shard shapes);
  * the scalar decision sequence is identical at every mesh size.

On a real pod slice the same program's scaling efficiency is
communication-bound by one (n·dtype)-byte all-reduce per iteration over
ICI against m·n/N local matvec FLOPs — for the flagship 16384×256
complex config at N=16 that is a 4 KB psum against 268 MFLOP of local
work per iteration.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py
"""

from __future__ import annotations

import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # f32 at tol=1e-9 is noise-bound

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")


def main():
    import problems
    from fasta_tpu import FastaOptions, make_solver
    from fasta_tpu import sharding as sh

    n_dev = len(jax.devices())
    prob = problems.build("lasso", m=960, n=256, k=20, dtype=jnp.float64)
    opts = FastaOptions(max_iters=60, tol=1e-9)
    fn = make_solver(opts)

    base = None
    print(f"devices available: {n_dev}")
    print(f"{'mesh':>5} {'shard rows':>10} {'all-reduce':>10} "
          f"{'iters':>6} {'tau drift':>12}")
    for k in range(0, n_dev.bit_length()):
        size = 1 << k
        if size > n_dev or 960 % size:
            break
        mesh = sh.make_mesh(n_devices=size)
        sp = sh.shard_problem(prob, mesh)
        low = fn.lower(sp.op, sp.fterm, sp.gterm, jnp.asarray(sp.x0), 0.05)
        txt = low.compile().as_text()
        n_ar = len(re.findall(r" all-reduce\(", txt))
        out = fn(sp.op, sp.fterm, sp.gterm, jnp.asarray(sp.x0), 0.05)
        k = int(out.iteration_count)
        taus = np.asarray(out.taus)[:k]
        if base is None:
            base = taus
            drift = 0.0
        else:
            kk = min(base.size, taus.size)
            drift = float(np.max(np.abs(taus[:kk] - base[:kk])
                                 / np.abs(base[:kk])))
        print(f"{size:>5} {960 // size:>10} {n_ar:>10} "
              f"{k:>6} {drift:>12.2e}")


if __name__ == "__main__":
    main()
