"""Tests for the fused gradmap path (Pallas on TPU, exact-graph XLA
fallback elsewhere) and the affine FISTA gradient extrapolation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fasta_tpu as ft
import problems


def _lasso(tau0=0.05):
    prob = problems.build("lasso", m=96, n=192, k=10, dtype=jnp.float64)
    prob.tau0 = tau0
    return prob


def test_fused_kernel_interpret_matches_reference():
    from fasta_tpu.kernels import (fused_lstsq_gradmap,
                                   lstsq_gradmap_reference)
    rng = np.random.default_rng(0)
    m, n = 64, 256
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    d, f, g = fused_lstsq_gradmap(A, x, b, interpret=True)
    d0, f0, g0 = lstsq_gradmap_reference(A, x, b)
    # fp32 MXU accumulation order differs from the XLA GEMV
    np.testing.assert_allclose(d, d0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(f), float(f0), rtol=1e-5)
    np.testing.assert_allclose(g, g0, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("mode_kw", [
    dict(adaptive=True, accelerate=False),
    dict(adaptive=False, accelerate=False),
])
def test_fuse_flag_is_trajectory_invariant(mode_kw):
    """fuse=True uses the XLA fallback on CPU — identical graph, so the
    trajectory must match fuse=False to machine precision."""
    prob = _lasso()
    r_on = prob.solve(tol=1e-10, max_iters=80, fuse=True, **mode_kw)
    r_off = prob.solve(tol=1e-10, max_iters=80, fuse=False, **mode_kw)
    assert r_on.iteration_count == r_off.iteration_count
    k = r_on.iteration_count
    np.testing.assert_allclose(r_on.taus[:k], r_off.taus[:k], rtol=1e-12)
    np.testing.assert_allclose(r_on.solution, r_off.solution, atol=1e-12)


def test_affine_accel_matches_direct_gradient():
    """Accelerated mode with the affine gradient extrapolation (zero
    extra matvecs) must agree with the direct Aᵀ(d_next−b) evaluation to
    fp-accumulation tolerance."""
    prob = _lasso()
    r_on = prob.solve(tol=1e-10, max_iters=100, fuse=True,
                      adaptive=False, accelerate=True)
    r_off = prob.solve(tol=1e-10, max_iters=100, fuse=False,
                       adaptive=False, accelerate=True)
    assert abs(r_on.iteration_count - r_off.iteration_count) <= 2
    k = min(r_on.iteration_count, r_off.iteration_count)
    np.testing.assert_allclose(r_on.residuals[:k], r_off.residuals[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_on.solution, r_off.solution, atol=1e-8)


def test_fused_gradmap_only_for_dense_real():
    b = jnp.zeros(8)
    term = ft.LeastSquares(b)
    assert term.fused_gradmap(ft.IdentityOp()) is None
    A_c = jnp.zeros((8, 4), jnp.complex128)
    assert term.fused_gradmap(ft.DenseOp(A_c)) is None
    A_r = jnp.zeros((8, 4))
    assert term.fused_gradmap(ft.DenseOp(A_r)) is not None


def test_nonquadratic_terms_do_not_fuse():
    assert ft.Logistic(jnp.zeros(8)).fused_gradmap(
        ft.DenseOp(jnp.zeros((8, 4)))) is None
    assert not ft.Logistic(jnp.zeros(8)).grad_affine
    assert ft.LeastSquares(jnp.zeros(8)).grad_affine
