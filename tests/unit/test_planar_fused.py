"""Planar-complex one-pass streaming kernel (kernels/planar_fused.py)
vs the exact two-pass XLA graphs — interpret mode (round-2 VERDICT
missing #2: the flagship 16k-measurement layout gets a single-chip
Pallas path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fasta_tpu.kernels.planar_fused import (
    fused_planar_hinge_gradmap, fused_planar_lstsq_gradmap,
    planar_hinge_gradmap_reference, planar_lstsq_gradmap_reference)

RNG = np.random.default_rng(3)


def _planar(m, n):
    Ar = jnp.asarray(RNG.standard_normal((m, n)), jnp.float32)
    Ai = jnp.asarray(RNG.standard_normal((m, n)), jnp.float32)
    x = jnp.asarray(RNG.standard_normal((n, 2)), jnp.float32)
    return Ar, Ai, x


@pytest.mark.parametrize("m,n", [(64, 256), (130, 256)])  # pow2 + padded
def test_planar_lstsq_interpret_matches_reference(m, n):
    Ar, Ai, x = _planar(m, n)
    b = jnp.asarray(RNG.standard_normal((m, 2)), jnp.float32)
    d, f, g = fused_planar_lstsq_gradmap(Ar, Ai, x, b, interpret=True)
    d0, f0, g0 = planar_lstsq_gradmap_reference(Ar, Ai, x, b)
    np.testing.assert_allclose(d, d0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(f), float(f0), rtol=1e-5)
    np.testing.assert_allclose(g, g0, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("m,n", [(64, 256), (130, 256)])
def test_planar_hinge_interpret_matches_reference(m, n):
    Ar, Ai, x = _planar(m, n)
    b = jnp.abs(jnp.asarray(RNG.standard_normal(m), jnp.float32)) + 0.1
    d, f, g = fused_planar_hinge_gradmap(Ar, Ai, x, b, interpret=True)
    d0, f0, g0 = planar_hinge_gradmap_reference(Ar, Ai, x, b)
    np.testing.assert_allclose(d, d0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(f), float(f0), rtol=1e-5)
    np.testing.assert_allclose(g, g0, rtol=2e-4, atol=1e-4)


def test_planar_reference_matches_complex_formulation():
    """The planar two-pass reference must equal the native-complex
    gradmap — the planar layout is the same math (operators.py
    PlanarDenseOp docstring)."""
    m, n = 48, 32
    Ar, Ai, x = _planar(m, n)
    b = jnp.asarray(RNG.standard_normal((m, 2)), jnp.float32)
    d, f, g = planar_lstsq_gradmap_reference(Ar, Ai, x, b)
    Ac = np.asarray(Ar) + 1j * np.asarray(Ai)
    xc = np.asarray(x[:, 0]) + 1j * np.asarray(x[:, 1])
    bc = np.asarray(b[:, 0]) + 1j * np.asarray(b[:, 1])
    dc = Ac @ xc
    rc = dc - bc
    fc = 0.5 * float(np.real(np.vdot(rc, rc)))
    gc = Ac.conj().T @ rc
    np.testing.assert_allclose(np.asarray(d[:, 0]) + 1j * np.asarray(d[:, 1]),
                               dc, rtol=1e-5)
    assert float(f) == pytest.approx(fc, rel=1e-5)
    np.testing.assert_allclose(np.asarray(g[:, 0]) + 1j * np.asarray(g[:, 1]),
                               gc, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("loss", ["lstsq", "hinge"])
def test_planar_gradmaps_match_autodiff(loss):
    """The hand-written planar gradients equal jax.grad of the scalar
    objective — an oracle-independent correctness check of the
    conjugate-adjoint channel algebra."""
    import jax

    m, n = 48, 32
    Ar, Ai, x = _planar(m, n)
    if loss == "lstsq":
        b = jnp.asarray(RNG.standard_normal((m, 2)), jnp.float32)

        def f(x):
            p = Ar @ x
            q = Ai @ x
            d = jnp.stack([p[:, 0] - q[:, 1], p[:, 1] + q[:, 0]],
                          axis=-1)
            r = d - b
            return 0.5 * jnp.sum(r * r)
        _, fv, g = planar_lstsq_gradmap_reference(Ar, Ai, x, b)
    else:
        b = jnp.abs(jnp.asarray(RNG.standard_normal(m), jnp.float32)) + 0.5

        def f(x):
            p = Ar @ x
            q = Ai @ x
            d = jnp.stack([p[:, 0] - q[:, 1], p[:, 1] + q[:, 0]],
                          axis=-1)
            mag = jnp.sqrt(jnp.sum(d * d, axis=-1))
            r = jnp.maximum(mag - b, 0.0)
            return 0.5 * jnp.sum(r * r)
        _, fv, g = planar_hinge_gradmap_reference(Ar, Ai, x, b)
    assert float(fv) == pytest.approx(float(f(x)), rel=1e-5)
    g_ad = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                               rtol=1e-4, atol=1e-5)


def test_planar_fusion_dispatch_gating():
    """supports_planar_fusion counts BOTH channel matrices toward the
    streaming threshold and never fires off-TPU."""
    import jax

    from fasta_tpu.kernels.planar_fused import supports_planar_fusion
    assert jax.default_backend() == "cpu"
    assert not supports_planar_fusion(8192, 16384, jnp.float32)

    # wiring: on CPU the term must return None (XLA path), never a
    # kernel closure
    from fasta_tpu.operators import PlanarDenseOp
    from fasta_tpu.terms import LeastSquares, PlanarPhaseHinge
    Ar, Ai, x = _planar(32, 16)
    op = PlanarDenseOp(Ar, Ai)
    assert LeastSquares(jnp.zeros((32, 2), jnp.float32)).fused_gradmap(op) \
        is None
    assert PlanarPhaseHinge(jnp.ones((32,), jnp.float32)).fused_gradmap(op) \
        is None
