"""Batch (vmap) solver: a μ-sweep in one executable must reproduce the
per-instance solves element for element (batched while_loop freezes
converged instances)."""

import jax
import jax.numpy as jnp
import numpy as np

import fasta_tpu as ft
import problems


def test_mu_sweep_matches_individual_solves():
    prob = problems.build("lasso", m=64, n=96, k=8, dtype=jnp.float64)
    opts = ft.FastaOptions(tol=1e-8, max_iters=100)
    mus = jnp.asarray([0.02, 0.05, 0.1, 0.3])

    batch = ft.make_batch_solver(
        opts, in_axes=(None, None, ft.L1Norm(0), None, None))
    out = batch(prob.op, prob.fterm, ft.L1Norm(mus),
                jnp.asarray(prob.x0), 0.05)

    for i, mu in enumerate(np.asarray(mus)):
        single = ft.solve(prob.op, prob.fterm, ft.L1Norm(float(mu)),
                          jnp.asarray(prob.x0), 0.05, opts)
        assert int(out.iteration_count[i]) == int(single.iteration_count)
        k = int(single.iteration_count)
        # batched fusion reorders fp ops slightly (~1e-8 on BB ratios)
        np.testing.assert_allclose(out.taus[i][:k], single.taus[:k],
                                   rtol=1e-6)
        np.testing.assert_allclose(out.solution[i], single.solution,
                                   atol=1e-8)


def test_batched_rhs():
    """Many right-hand sides b solved at once (LeastSquares batched)."""
    prob = problems.build("nnls", m=48, n=24, dtype=jnp.float64)
    opts = ft.FastaOptions(tol=1e-8, max_iters=80)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((3, 48)))

    batch = ft.make_batch_solver(
        opts, in_axes=(None, ft.LeastSquares(0), None, None, None))
    out = batch(prob.op, ft.LeastSquares(B), prob.gterm,
                jnp.asarray(prob.x0), 0.08)
    assert out.solution.shape == (3, 24)
    for i in range(3):
        single = ft.solve(prob.op, ft.LeastSquares(B[i]), prob.gterm,
                          jnp.asarray(prob.x0), 0.08, opts)
        np.testing.assert_allclose(out.solution[i], single.solution,
                                   atol=1e-10)
