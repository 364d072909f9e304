"""Autodiff-derived gradients (gradf=None) and the custom stopping hook."""

import jax.numpy as jnp
import numpy as np

import fasta_tpu as ft
from reference_oracle import generators as G


def test_autodiff_gradient_matches_explicit():
    inst = G.make_lasso(m=80, n=120, k=8, seed=31)
    b = jnp.asarray(inst["b"])
    mu = inst["mu"]
    f = lambda d: 0.5 * jnp.vdot(d - b, d - b).real
    proxg = lambda z, t: ft.prox.shrink(z, t * mu)
    g = lambda x: mu * jnp.sum(jnp.abs(x))

    r_auto = ft.fasta(jnp.asarray(inst["A"]), None, f, None, g, proxg,
                      jnp.asarray(inst["x0"]), tau0=0.05, tol=1e-9,
                      max_iters=100)
    r_expl = ft.fasta(jnp.asarray(inst["A"]), None, f, lambda d: d - b,
                      g, proxg, jnp.asarray(inst["x0"]), tau0=0.05,
                      tol=1e-9, max_iters=100)
    assert r_auto.iteration_count == r_expl.iteration_count
    np.testing.assert_allclose(r_auto.solution, r_expl.solution,
                               atol=1e-10)


def test_autodiff_gradient_complex():
    """Wirtinger convention: autodiff of the complex hinge must match
    the hand-written gradient."""
    inst = G.make_phase_retrieval(m=128, n=8, seed=32)
    b = jnp.asarray(inst["b"])
    term_auto = ft.FunctionSmooth(
        lambda d: 0.5 * jnp.sum(jnp.maximum(jnp.abs(d) - b, 0.0) ** 2))
    term_hand = ft.PhaseHinge(b)
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal(128)
                    + 1j * rng.standard_normal(128))
    ga = np.asarray(term_auto.grad(d))
    gh = np.asarray(term_hand.grad(d))
    np.testing.assert_allclose(ga, gh, atol=1e-10)


def test_custom_stop_fn():
    inst = G.make_lasso(m=80, n=120, k=8, seed=33)

    def stop_after_7(k, res, nres, max_res, f1):
        return k >= 6          # fires on the 7th iteration (k is 0-based)

    prob_args = (jnp.asarray(inst["A"]), None)
    b = jnp.asarray(inst["b"])
    mu = inst["mu"]
    r = ft.fasta(*prob_args,
                 lambda d: 0.5 * jnp.vdot(d - b, d - b).real,
                 lambda d: d - b,
                 lambda x: mu * jnp.sum(jnp.abs(x)),
                 lambda z, t: ft.prox.shrink(z, t * mu),
                 jnp.asarray(inst["x0"]), tau0=0.05, tol=1e-12,
                 max_iters=100, stop_fn=stop_after_7)
    assert r.iteration_count == 7
    assert r.converged
