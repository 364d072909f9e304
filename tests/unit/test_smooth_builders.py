"""Legacy closure-style smooth builders (fasta_tpu.smooth) remain a
supported surface — spot-check against the term classes."""

import jax.numpy as jnp
import numpy as np

from fasta_tpu import smooth, terms

RNG = np.random.default_rng(2)


def test_least_squares_builder():
    b = jnp.asarray(RNG.standard_normal(32))
    f, gradf = smooth.least_squares(b)
    d = jnp.asarray(RNG.standard_normal(32))
    t = terms.LeastSquares(b)
    np.testing.assert_allclose(float(f(d)), float(t.value(d)), rtol=1e-12)
    np.testing.assert_allclose(gradf(d), t.grad(d), atol=1e-12)


def test_logistic_builder():
    b = jnp.asarray((RNG.random(24) < 0.5).astype(np.float64))
    f, gradf = smooth.logistic(b)
    d = jnp.asarray(RNG.standard_normal(24))
    t = terms.Logistic(b)
    np.testing.assert_allclose(float(f(d)), float(t.value(d)), rtol=1e-12)
    np.testing.assert_allclose(gradf(d), t.grad(d), atol=1e-12)


def test_phase_hinge_builder():
    b = jnp.abs(jnp.asarray(RNG.standard_normal(16)))
    f, gradf = smooth.phase_hinge(b)
    d = jnp.asarray(RNG.standard_normal(16)
                    + 1j * RNG.standard_normal(16))
    t = terms.PhaseHinge(b)
    np.testing.assert_allclose(float(f(d)), float(t.value(d)), rtol=1e-12)
    np.testing.assert_allclose(gradf(d), t.grad(d), atol=1e-12)


def test_objective_l1_builder():
    g = smooth.objective_l1(0.3)
    x = jnp.asarray(RNG.standard_normal(10))
    np.testing.assert_allclose(float(g(x)),
                               0.3 * float(jnp.abs(x).sum()), rtol=1e-12)
