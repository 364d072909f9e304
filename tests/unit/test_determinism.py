"""Determinism: repeated solves of the same instance must be BITWISE
identical (the cross-host determinism requirement reduces to this plus
collective determinism, which tests/sharded/ covers)."""

import jax.numpy as jnp
import numpy as np

import problems


def test_repeated_solves_bitwise_identical():
    prob = problems.build("lasso", m=96, n=160, k=10, dtype=jnp.float64)
    prob.tau0 = 0.05
    r1 = prob.solve(tol=1e-9, max_iters=100)
    r2 = prob.solve(tol=1e-9, max_iters=100)
    assert r1.iteration_count == r2.iteration_count
    np.testing.assert_array_equal(r1.solution, r2.solution)
    np.testing.assert_array_equal(r1.taus, r2.taus)
    np.testing.assert_array_equal(r1.residuals, r2.residuals)


def test_rebuilt_instance_bitwise_identical():
    """Generators are seeded: rebuilding the problem reproduces the
    exact same arrays and hence the exact same trajectory."""
    a = problems.build("nnls", m=64, n=32, dtype=jnp.float64)
    b = problems.build("nnls", m=64, n=32, dtype=jnp.float64)
    np.testing.assert_array_equal(a.instance["A"], b.instance["A"])
    a.tau0 = b.tau0 = 0.08
    ra = a.solve(tol=1e-9, max_iters=80)
    rb = b.solve(tol=1e-9, max_iters=80)
    np.testing.assert_array_equal(ra.solution, rb.solution)
