"""E7 — Multiple-measurement vector:  min ½‖AX−B‖²_F + μ‖X‖_{2,1}.

Joint row-sparse recovery of multiple signals sharing a support; the
group L2,1 prox shrinks whole rows (SURVEY.md §2.2 E7).  The solver is
shape-agnostic (all reductions flatten), so the matrix variable needs no
special handling.
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import DenseOp, L21Norm, LeastSquares
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_mmv

from . import register

__all__ = ["build"]


@register("mmv")
def build(m: int = 400, n: int = 800, l: int = 10, k: int = 40,
          mu: float = 0.2, seed: int = 7, dtype=jnp.float32) -> Problem:
    inst = make_mmv(m=m, n=n, l=l, k=k, mu=mu, seed=seed)
    return Problem(
        name=f"mmv[{m}x{n}x{l}]",
        op=DenseOp(jnp.asarray(inst["A"], dtype)),
        fterm=LeastSquares(jnp.asarray(inst["b"], dtype)),
        gterm=L21Norm(mu),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-6,
                                                   max_iters=2000)))
