"""Smooth-term library: (f, gradf) pairs for the canonical problems.

The solver consumes ``f(d) -> scalar`` and ``gradf(d) -> array`` evaluated
at ``d = A x`` (the measurement-space point).  These are the f's the
reference's example suite uses (SURVEY.md §2.2): quadratic least squares,
stable logistic loss, and the smooth hinge of PhaseMax-style phase
retrieval.  All are complex-safe where meaningful and reduce with
``jnp.sum`` so under a row-sharded mesh XLA turns the reduction into a
``psum`` automatically.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "least_squares", "logistic", "phase_hinge", "objective_l1",
]


def least_squares(b):
    """f(d) = ½‖d − b‖²  (complex-safe: ‖·‖ is the Hermitian norm)."""
    def f(d):
        r = d - b
        return 0.5 * jnp.real(jnp.vdot(r, r))

    def gradf(d):
        return d - b

    return f, gradf


def logistic(b):
    """Logistic loss  f(d) = Σ log(1+exp(d_i)) − bᵀd,  labels b ∈ {0,1}.

    Stable evaluation  log(1+exp(d)) = max(d,0) + log1p(exp(−|d|))
    matches the oracle (reference_oracle/generators.py make_logistic)."""
    def f(d):
        return jnp.sum(jnp.maximum(d, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(d)))
                       - b * d)

    def gradf(d):
        return 1.0 / (1.0 + jnp.exp(-d)) - b

    return f, gradf


def phase_hinge(b):
    """Smooth circular hinge for PhaseMax-style phase retrieval:
    f(d) = ½ Σ max(|d|−b, 0)²  with Wirtinger gradient
    ∇f(d) = max(|d|−b,0) · d/|d|  (oracle: make_phase_retrieval)."""
    def f(d):
        r = jnp.maximum(jnp.abs(d) - b, 0.0)
        return 0.5 * jnp.sum(r * r)

    def gradf(d):
        mag = jnp.abs(d)
        r = jnp.maximum(mag - b, 0.0)
        return (r / jnp.maximum(mag, 1e-30)) * d

    return f, gradf


def objective_l1(mu):
    """g(x) = μ‖x‖₁ — the nonsmooth objective value (for recording)."""
    def g(x):
        return mu * jnp.sum(jnp.abs(x))
    return g
