"""Regression: a degenerate BB step on the stopping iteration (Dx = 0 ⇒
tau_s = ∞) must not pollute the nonfinite flag or the converged status.
(The BB-fallback guard boolean used to shadow the sanitizer flag.)"""

import jax.numpy as jnp
import numpy as np

import fasta_tpu as ft


def test_start_at_optimum_converges_cleanly():
    """x0 already optimal: first iteration has Dx = 0 exactly, residual
    0 → stop fires AND the BB update is degenerate.  Must report
    converged=True, nonfinite=False in both guard modes."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((24, 12)), jnp.float64)
    x_star = jnp.asarray(rng.standard_normal(12), jnp.float64)
    b = A @ x_star
    for guard in (False, True):
        out = ft.solve(ft.DenseOp(A), ft.LeastSquares(b), ft.ZeroTerm(),
                       x_star, 0.05,
                       ft.FastaOptions(tol=1e-8, max_iters=50,
                                       adaptive=True,
                                       guard_nonfinite=guard))
        assert bool(out.converged), f"guard={guard}"
        assert not bool(out.nonfinite), f"guard={guard}"
        assert int(out.iteration_count) == 1
        np.testing.assert_allclose(out.solution, x_star, atol=1e-12)
