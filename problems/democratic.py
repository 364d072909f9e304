"""E6 — Democratic representations:  min ½‖Ax−b‖² + μ‖x‖∞.

Spreads signal energy evenly over a redundant frame; the L∞ prox is
evaluated via Moreau decomposition through the sort-based L1-ball
projection (SURVEY.md §2.2 E6).
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import DenseOp, LeastSquares, LinfNorm
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_democratic

from . import register

__all__ = ["build"]


@register("democratic")
def build(m: int = 256, n: int = 1024, mu: float = 3.0, seed: int = 6,
          dtype=jnp.float32) -> Problem:
    inst = make_democratic(m=m, n=n, mu=mu, seed=seed)
    return Problem(
        name=f"democratic[{m}x{n}]",
        op=DenseOp(jnp.asarray(inst["A"], dtype)),
        fterm=LeastSquares(jnp.asarray(inst["b"], dtype)),
        gterm=LinfNorm(mu),
        x0=jnp.asarray(inst["x0"], dtype),
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-6,
                                                   max_iters=2000)))
