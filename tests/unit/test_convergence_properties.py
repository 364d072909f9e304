"""Randomized convergence properties: across random instances the
solver must converge, satisfy the L1 optimality conditions at the
solution, and never increase the best objective."""

import jax.numpy as jnp
import numpy as np
import pytest

import fasta_tpu as ft

SEEDS = [11, 22, 33, 44, 55]


@pytest.mark.parametrize("seed", SEEDS)
def test_lasso_kkt_at_solution(seed):
    rng = np.random.default_rng(seed)
    m, n, mu = 80, 50, 0.1
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(m))
    b = jnp.asarray(rng.standard_normal(m))
    L = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    out = ft.solve(ft.DenseOp(A), ft.LeastSquares(b), ft.L1Norm(mu),
                   jnp.zeros(n), 2.0 / L / 10.0,
                   ft.FastaOptions(tol=1e-10, max_iters=5000))
    assert bool(out.converged)
    x = np.asarray(out.solution)
    g = np.asarray(A).T @ (np.asarray(A) @ x - np.asarray(b))
    # KKT: |g_i| <= mu on the zero set; g_i = -mu*sign(x_i) on support
    zero = np.abs(x) < 1e-9
    assert np.all(np.abs(g[zero]) <= mu + 1e-5)
    supp = ~zero
    np.testing.assert_allclose(g[supp], -mu * np.sign(x[supp]), atol=1e-5)


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_objective_monotone_in_best_iterate(seed):
    rng = np.random.default_rng(seed)
    m, n = 60, 40
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(m))
    b = jnp.asarray(rng.standard_normal(m))
    out = ft.solve(ft.DenseOp(A), ft.LeastSquares(b), ft.L1Norm(0.05),
                   jnp.zeros(n), 0.1,
                   ft.FastaOptions(tol=1e-10, max_iters=200,
                                   record_objective=True))
    k = int(out.iteration_count)
    objs = np.asarray(out.objectives)[:k]
    # running minimum is non-increasing and the best iterate achieves it
    best = np.minimum.accumulate(objs)
    assert np.all(best[1:] <= best[:-1] + 1e-12)
    x_best = np.asarray(out.best_iterate)
    obj_best = (0.5 * np.linalg.norm(np.asarray(A) @ x_best
                                     - np.asarray(b)) ** 2
                + 0.05 * np.abs(x_best).sum())
    assert obj_best <= objs.min() + 1e-9
