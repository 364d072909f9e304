"""E9 — Max-norm regularization:  min ½‖X−B‖²_F  s.t. max_i ‖X_i,:‖ ≤ c.

The max-norm factorization constraint (bounded row norms of the stacked
factor); prox = rowwise L2-ball projection (SURVEY.md §2.2 E9).
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import IdentityOp, LeastSquares, MaxRowNormBall
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_max_norm

from . import register

__all__ = ["build"]


@register("max_norm")
def build(d1: int = 300, d2: int = 60, radius: float = 1.0, seed: int = 9,
          dtype=jnp.float32) -> Problem:
    inst = make_max_norm(d1=d1, d2=d2, radius=radius, seed=seed)
    return Problem(
        name=f"max_norm[{d1}x{d2}]",
        op=IdentityOp(),
        fterm=LeastSquares(jnp.asarray(inst["b"], dtype)),
        gterm=MaxRowNormBall(radius),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-6,
                                                   max_iters=500)))
