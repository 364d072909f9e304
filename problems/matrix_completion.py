"""E8 — 1-bit (logistic) matrix completion:
min Σ_Ω log(1+exp(X)) − Y⊙X + μ‖X‖_*.

Recovers a low-rank logit matrix from observed binary outcomes; the
nuclear-norm prox is singular-value thresholding (XLA SVD + fused shrink
on σ; SURVEY.md §2.2 E8 / §2.4).  A is the identity — the smooth term
acts directly on the matrix variable.
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import IdentityOp, MaskedLogistic, NuclearNorm
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_matrix_completion

from . import register

__all__ = ["build"]


@register("matrix_completion")
def build(d1: int = 200, d2: int = 200, rank: int = 5,
          obs_frac: float = 0.3, mu: float = 2.0, seed: int = 8,
          dtype=jnp.float32) -> Problem:
    inst = make_matrix_completion(d1=d1, d2=d2, rank=rank,
                                  obs_frac=obs_frac, mu=mu, seed=seed)
    return Problem(
        name=f"matrix_completion[{d1}x{d2}]",
        op=IdentityOp(),
        fterm=MaskedLogistic(jnp.asarray(inst["b"], dtype),
                             jnp.asarray(inst["mask"], dtype)),
        gterm=NuclearNorm(mu),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-5,
                                                   max_iters=500)))
