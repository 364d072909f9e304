"""E10 — Linear SVM (squared hinge):
min ½ Σ max(0, 1 − y·(Ax))² + λ/2‖x‖².

One of the FBS applications in the FASTA papers' example discussion
(SURVEY.md §2.2) — a non-quadratic piecewise-smooth f with a trivially
proxable ridge term.
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import DenseOp, L2Norm2, SquaredHinge
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_svm

from . import register

__all__ = ["build"]


@register("svm")
def build(m: int = 800, n: int = 100, lam: float = 0.01, seed: int = 11,
          dtype=jnp.float32) -> Problem:
    inst = make_svm(m=m, n=n, lam=lam, seed=seed)
    return Problem(
        name=f"svm[{m}x{n}]",
        op=DenseOp(jnp.asarray(inst["A"], dtype)),
        fterm=SquaredHinge(jnp.asarray(inst["b"], dtype)),
        gterm=L2Norm2(lam),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-6,
                                                   max_iters=1000)))
