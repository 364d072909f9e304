"""E11 — Non-negative matrix factorization:
min ½‖Y − W Hᵀ‖²_F  s.t. W ≥ 0, H ≥ 0.

The [P1] paper's remaining FBS application (SURVEY.md §2.2 note — the
reference discusses SVM and NMF; SVM shipped in round 1, this completes
the pair).  Solved JOINTLY over the stacked factor X = [W; H] with the
identity operator: f is smooth (nonconvex), g the nonnegative-cone
indicator.  Oracle counterpart: reference_oracle/generators.py make_nmf
(identical data, identical f/∇f formulas → trajectory parity).

The recovery metric compares the reconstruction W Hᵀ against the clean
planted product (the factors themselves are only identifiable up to
permutation/scaling).
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import IdentityOp, NMFLoss, NonnegIndicator
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_nmf

from . import register

__all__ = ["build"]


@register("nmf")
def build(d1: int = 80, d2: int = 60, rank: int = 5, sigma: float = 0.01,
          seed: int = 13, dtype=jnp.float32) -> Problem:
    inst = make_nmf(d1=d1, d2=d2, r=rank, sigma=sigma, seed=seed)
    Y = jnp.asarray(inst["b"], dtype)
    return Problem(
        name=f"nmf[{d1}x{d2},r{rank}]",
        op=IdentityOp(),
        fterm=NMFLoss(Y),
        gterm=NonnegIndicator(),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],                 # the clean product Y*
        instance=inst,
        recover=lambda X: X[:d1] @ X[d1:].T,   # reconstruction W Hᵀ
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-7,
                                                   max_iters=2000)))
