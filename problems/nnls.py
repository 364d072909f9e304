"""E2 — Non-negative least squares:  min ½‖Ax−b‖²  s.t. x ≥ 0.

g is the indicator of the nonnegative cone; its prox is the orthant
projection.  The BB stepsize stress case (BASELINE.json config 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import DenseOp, LeastSquares, NonnegIndicator
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_nnls

from . import register

__all__ = ["build"]


@register("nnls")
def build(m: int = 1000, n: int = 500, seed: int = 2,
          dtype=jnp.float32) -> Problem:
    inst = make_nnls(m=m, n=n, seed=seed)
    return Problem(
        name=f"nnls[{m}x{n}]",
        op=DenseOp(jnp.asarray(inst["A"], dtype)),
        fterm=LeastSquares(jnp.asarray(inst["b"], dtype)),
        gterm=NonnegIndicator(),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-6,
                                                   max_iters=2000)))
