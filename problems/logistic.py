"""E3 — Sparse logistic regression:  min Σ log(1+exp(Ax)) − bᵀAx + μ‖x‖₁.

Non-quadratic smooth term — the problem that exercises the nonmonotone
backtracking line search (BASELINE.json config 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import DenseOp, L1Norm, Logistic
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_logistic

from . import register

__all__ = ["build"]


@register("logistic")
def build(m: int = 1000, n: int = 500, k: int = 20, mu: float = 0.02,
          seed: int = 3, dtype=jnp.float32) -> Problem:
    inst = make_logistic(m=m, n=n, k=k, mu=mu, seed=seed)
    return Problem(
        name=f"logistic[{m}x{n}]",
        op=DenseOp(jnp.asarray(inst["A"], dtype)),
        fterm=Logistic(jnp.asarray(inst["b"], dtype)),
        gterm=L1Norm(mu),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-6,
                                                   max_iters=2000)))
