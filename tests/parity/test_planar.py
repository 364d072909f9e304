"""Planar-complex formulation parity: the all-real planar solve must
reproduce the complex oracle trajectory exactly — Re⟨·,·⟩ on ℂ equals
the plain real dot on planar vectors, so the identical solver math runs
bit-for-bit (SURVEY.md §7 hard part 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu import operators as ops
from reference_oracle.fasta_numpy import fasta as fasta_np


def test_planar_dense_adjoint():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((24, 10)) + 1j * rng.standard_normal((24, 10))
    op = ops.PlanarDenseOp.from_complex(A, jnp.float64)
    ops.check_adjoint(op, jnp.zeros((10, 2)), jax.random.PRNGKey(0),
                      rtol=1e-10)


def test_planar_matches_complex_matvec():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((16, 8)) + 1j * rng.standard_normal((16, 8))
    x = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    op = ops.PlanarDenseOp.from_complex(A, jnp.float64)
    xp = jnp.asarray(np.stack([x.real, x.imag], axis=-1))
    d = np.asarray(op(xp))
    expect = A @ x
    np.testing.assert_allclose(d[:, 0] + 1j * d[:, 1], expect, atol=1e-12)
    y = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    yp = jnp.asarray(np.stack([y.real, y.imag], axis=-1))
    g = np.asarray(op.rmatvec(yp))
    np.testing.assert_allclose(g[:, 0] + 1j * g[:, 1], A.conj().T @ y,
                               atol=1e-12)


@pytest.mark.parametrize("mode_kw", [
    dict(adaptive=True, accelerate=False),
    dict(adaptive=False, accelerate=True),
])
def test_planar_phase_retrieval_matches_oracle(mode_kw):
    prob = problems.build("phase_retrieval", m=256, n=16,
                          dtype=jnp.float64, planar=True)
    inst = prob.instance
    r_np = fasta_np(inst["op"], None, inst["f"], inst["gradf"], inst["g"],
                    inst["proxg"], inst["x0"], tau0=1.0, tol=1e-8,
                    max_iters=150, **mode_kw)
    prob.tau0 = 1.0
    r_j = prob.solve(tol=1e-8, max_iters=150, **mode_kw)
    assert r_j.iteration_count == r_np.iteration_count
    k = r_np.iteration_count
    np.testing.assert_allclose(r_j.residuals[:k], r_np.residuals[:k],
                               rtol=1e-4, atol=1e-11)
    # planar matmul accumulation order differs from the complex matvec
    np.testing.assert_allclose(r_j.taus[:k], r_np.taus[:k], rtol=1e-4)
    # planar solution == complex solution
    sol_c = np.asarray(r_j.solution)[:, 0] + 1j * np.asarray(
        r_j.solution)[:, 1]
    np.testing.assert_allclose(sol_c, r_np.solution, atol=1e-8)
    assert prob.recovery_error(r_j.solution) < 0.1
