"""E5b — Coded-diffraction phase retrieval:  b = |F(m_k ⊙ x)|.

The structured-operator variant of E5: K random unit-modulation masks,
each measured through a unitary FFT — no dense matrix exists.  The
operator is ``StackedOp([MaskedFourierOp-style compositions])`` built
from ``DiagonalOp`` (modulation) composed with the FFT; the adjoint is
exact (conj-modulated IFFT).  Exercises the FFT operator path of the
framework and shards over the mask axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from fasta_tpu import (ComposeOp, DiagonalOp, LinearAnchor,
                       MaskedFourierOp, PhaseHinge, StackedOp)
from fasta_tpu.problem import Problem
from reference_oracle.generators import make_phase_retrieval_cdp

from . import register

__all__ = ["build"]


@register("phase_retrieval_cdp")
def build(n: int = 256, K: int = 8, delta: float = 0.1, seed: int = 10,
          dtype=jnp.complex64) -> Problem:
    import numpy as np
    inst = make_phase_retrieval_cdp(n=n, K=K, delta=delta, seed=seed)
    rdt = np.zeros((), dtype).real.dtype
    ones = jnp.ones((n,), dtype)
    op = StackedOp([
        ComposeOp(MaskedFourierOp(ones),          # unitary FFT
                  DiagonalOp(jnp.asarray(m, dtype)))
        for m in inst["masks"]
    ])
    return Problem(
        name=f"phase_retrieval_cdp[{K}x{n}]",
        op=op,
        fterm=PhaseHinge(jnp.asarray(inst["b"], rdt)),
        gterm=LinearAnchor(delta * jnp.asarray(inst["x0_hat"], dtype)),
        x0=jnp.asarray(inst["x0"], dtype),
        x_true=inst["x_true"],
        instance=inst,
    )


if __name__ == "__main__":
    from fasta_tpu.harness import compare_modes, format_comparison
    problem = build()
    print(format_comparison(problem, compare_modes(problem, tol=1e-6,
                                                   max_iters=500)))
