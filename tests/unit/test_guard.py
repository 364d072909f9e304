"""Sanitizer (guard_nonfinite) tests: the loop must halt on NaN/Inf and
flag it rather than iterating on garbage."""

import jax.numpy as jnp
import numpy as np

import fasta_tpu as ft


def _divergent_problem():
    """Plain FBS with a huge fixed stepsize and no backtracking diverges
    geometrically -> f overflows to inf in fp32."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(32), jnp.float32)
    return (ft.DenseOp(A), ft.LeastSquares(b), ft.ZeroTerm(),
            jnp.ones(16, jnp.float32))


def test_guard_halts_on_nonfinite():
    op, fterm, gterm, x0 = _divergent_problem()
    opts = ft.FastaOptions(max_iters=200, stop_rule="iterations",
                           adaptive=False, backtrack=False,
                           guard_nonfinite=True)
    out = ft.solve(op, fterm, gterm, x0, 1e6, opts)
    assert bool(out.nonfinite)
    assert not bool(out.converged)
    assert int(out.iteration_count) < 200


def test_no_guard_runs_to_completion():
    op, fterm, gterm, x0 = _divergent_problem()
    opts = ft.FastaOptions(max_iters=50, stop_rule="iterations",
                           adaptive=False, backtrack=False,
                           guard_nonfinite=False)
    out = ft.solve(op, fterm, gterm, x0, 1e6, opts)
    assert int(out.iteration_count) == 50
    assert not bool(out.nonfinite)


def test_guard_does_not_disturb_healthy_solve():
    import problems
    prob = problems.build("lasso", m=64, n=96, k=8, dtype=jnp.float64)
    prob.tau0 = 0.05
    r_on = prob.solve(tol=1e-8, max_iters=60, guard_nonfinite=True)
    r_off = prob.solve(tol=1e-8, max_iters=60, guard_nonfinite=False)
    assert r_on.iteration_count == r_off.iteration_count
    assert not r_on.nonfinite
    np.testing.assert_allclose(r_on.solution, r_off.solution, atol=1e-12)
