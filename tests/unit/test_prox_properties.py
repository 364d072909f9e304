"""Property-based prox tests (hypothesis): every proximal operator must
be firmly nonexpansive (‖prox a − prox b‖ ≤ ‖a − b‖), projections must
be idempotent, and Moreau identities must hold — the mathematical
contracts that make the FBS iteration converge."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from fasta_tpu import prox, terms

_settings = settings(max_examples=25, deadline=None)


def _vec(seed, n=40, scale=3.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(n) * scale)


PROXES = {
    "l1": lambda z, t: prox.shrink(z, t * 0.7),
    "nonneg": lambda z, t: prox.project_nonneg(z),
    "box": lambda z, t: prox.project_box(z, -0.4, 0.9),
    "linf_ball": lambda z, t: prox.project_linf_ball(z, 0.8),
    "l1_ball": lambda z, t: prox.project_l1_ball(z, 2.0),
    "linf": lambda z, t: prox.prox_linf(z, t * 0.5),
    "ridge": lambda z, t: terms.L2Norm2(0.3).prox(z, t),
}


@given(sa=st.integers(0, 10 ** 6), sb=st.integers(0, 10 ** 6),
       t=st.floats(0.01, 5.0), name=st.sampled_from(sorted(PROXES)))
@_settings
def test_nonexpansive(sa, sb, t, name):
    a, b = _vec(sa), _vec(sb)
    p = PROXES[name]
    pa, pb = np.asarray(p(a, t)), np.asarray(p(b, t))
    lhs = np.linalg.norm(pa - pb)
    rhs = np.linalg.norm(np.asarray(a) - np.asarray(b))
    assert lhs <= rhs * (1 + 1e-10) + 1e-12, name


@given(s=st.integers(0, 10 ** 6),
       name=st.sampled_from(["nonneg", "box", "linf_ball", "l1_ball"]))
@_settings
def test_projection_idempotent(s, name):
    z = _vec(s)
    p = PROXES[name]
    once = p(z, 1.0)
    twice = p(once, 1.0)
    np.testing.assert_allclose(twice, once, atol=1e-10)


@given(s=st.integers(0, 10 ** 6), t=st.floats(0.05, 4.0))
@_settings
def test_moreau_linf(s, t):
    """prox_{t‖·‖∞}(z) + t·P_{‖·‖₁≤1}(z/t) = z."""
    z = _vec(s)
    lhs = np.asarray(prox.prox_linf(z, t)) \
        + t * np.asarray(prox.project_l1_ball(z / t, 1.0))
    np.testing.assert_allclose(lhs, np.asarray(z), atol=1e-9)


@given(s=st.integers(0, 10 ** 6), t=st.floats(0.01, 3.0))
@_settings
def test_shrink_optimality(s, t):
    """x = shrink(z,t) satisfies the subgradient optimality of
    min_x ½‖x−z‖² + t‖x‖₁:  z − x ∈ t·∂‖x‖₁."""
    z = _vec(s)
    x = np.asarray(prox.shrink(z, t))
    r = np.asarray(z) - x
    nz = np.abs(x) > 1e-12
    np.testing.assert_allclose(r[nz], t * np.sign(x[nz]), atol=1e-9)
    assert np.all(np.abs(r[~nz]) <= t + 1e-9)
