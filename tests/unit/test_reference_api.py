"""The reference-compatible entry surface: ``fasta(A, At, f, gradf, g,
proxg, x0, **opts)`` with raw callables and every accepted operator form
(matrix / callable pair / None), matching the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import fasta_tpu as ft
from reference_oracle import generators as G
from reference_oracle.fasta_numpy import fasta as fasta_np


def _inst():
    return G.make_lasso(m=80, n=120, k=8, seed=21)


def _callables(inst):
    b = jnp.asarray(inst["b"])
    mu = inst["mu"]
    f = lambda d: 0.5 * jnp.vdot(d - b, d - b).real
    gradf = lambda d: d - b
    g = lambda x: mu * jnp.sum(jnp.abs(x))
    proxg = lambda z, t: ft.prox.shrink(z, t * mu)
    return f, gradf, g, proxg


def test_matrix_operator_matches_oracle():
    inst = _inst()
    f, gradf, g, proxg = _callables(inst)
    r = ft.fasta(jnp.asarray(inst["A"]), None, f, gradf, g, proxg,
                 jnp.asarray(inst["x0"]), tau0=0.05, tol=1e-9,
                 max_iters=120, record_objective=True)
    r_np = fasta_np(inst["op"], None, inst["f"], inst["gradf"], inst["g"],
                    inst["proxg"], inst["x0"], tau0=0.05, tol=1e-9,
                    max_iters=120, record_objective=True)
    assert r.iteration_count == r_np.iteration_count
    np.testing.assert_allclose(r.objectives[-1], r_np.objectives[-1],
                               rtol=1e-9)


def test_callable_pair_operator():
    inst = _inst()
    A = jnp.asarray(inst["A"])
    f, gradf, g, proxg = _callables(inst)
    r = ft.fasta(lambda x: A @ x, lambda y: A.T @ y, f, gradf, g, proxg,
                 jnp.asarray(inst["x0"]), tau0=0.05, tol=1e-9,
                 max_iters=120)
    r_mat = ft.fasta(A, None, f, gradf, g, proxg, jnp.asarray(inst["x0"]),
                     tau0=0.05, tol=1e-9, max_iters=120, fuse=False)
    assert r.iteration_count == r_mat.iteration_count
    np.testing.assert_allclose(r.solution, r_mat.solution, atol=1e-9)


def test_identity_operator_denoising():
    """A=None → identity (denoising-style problem)."""
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(64))
    mu = 0.4
    r = ft.fasta(None, None,
                 lambda d: 0.5 * jnp.vdot(d - b, d - b).real,
                 lambda d: d - b,
                 lambda x: mu * jnp.sum(jnp.abs(x)),
                 lambda z, t: ft.prox.shrink(z, t * mu),
                 jnp.zeros(64), tau0=0.5, tol=1e-10, max_iters=200)
    # closed form: soft-threshold of b at mu
    np.testing.assert_allclose(r.solution,
                               np.asarray(ft.prox.shrink(b, mu)),
                               atol=1e-6)


def test_adjoint_check_flag():
    inst = _inst()
    A = jnp.asarray(inst["A"])
    f, gradf, g, proxg = _callables(inst)
    # correct adjoint passes
    ft.fasta(lambda x: A @ x, lambda y: A.T @ y, f, gradf, g, proxg,
             jnp.asarray(inst["x0"]), tau0=0.05, max_iters=3,
             check_adjoint_first=True)
    # wrong adjoint raises
    with pytest.raises(ValueError):
        ft.fasta(lambda x: A @ x, lambda y: A.T @ (2.0 * y), f, gradf, g,
                 proxg, jnp.asarray(inst["x0"]), tau0=0.05, max_iters=3,
                 check_adjoint_first=True)


def test_tau0_estimation_runs():
    """No tau0/L given → estimator produces a working stepsize."""
    inst = _inst()
    f, gradf, g, proxg = _callables(inst)
    r = ft.fasta(jnp.asarray(inst["A"]), None, f, gradf, g, proxg,
                 jnp.asarray(inst["x0"]), tol=1e-7, max_iters=500)
    assert r.L_estimate is not None and r.L_estimate > 0
    assert r.initial_tau == pytest.approx(2.0 / r.L_estimate / 10.0)
    assert r.converged


def test_explicit_L():
    inst = _inst()
    f, gradf, g, proxg = _callables(inst)
    L = float(np.linalg.norm(inst["A"], 2) ** 2)
    r = ft.fasta(jnp.asarray(inst["A"]), None, f, gradf, g, proxg,
                 jnp.asarray(inst["x0"]), L=L, tol=1e-7, max_iters=500)
    assert r.initial_tau == pytest.approx(2.0 / L / 10.0)
    assert r.converged
