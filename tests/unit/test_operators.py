"""Unit tests: adjoint property ⟨Ax,y⟩=⟨x,Aᴴy⟩ for every operator, and
stencil parity vs the oracle (SURVEY.md §4: the adjoint check is the
reference's built-in fixture)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fasta_tpu import operators as ops
from reference_oracle import generators as G

RNG = np.random.default_rng(7)


def _adjoint_err(op, x_shape, x_dtype=jnp.float64):
    x_like = jnp.zeros(x_shape, x_dtype)
    return ops.check_adjoint(op, x_like, jax.random.PRNGKey(0), rtol=1e-10)


def test_dense_real_adjoint():
    A = jnp.asarray(RNG.standard_normal((20, 15)))
    _adjoint_err(ops.DenseOp(A), (15,))


def test_dense_complex_adjoint():
    A = jnp.asarray(RNG.standard_normal((16, 12))
                    + 1j * RNG.standard_normal((16, 12)))
    _adjoint_err(ops.DenseOp(A), (12,), jnp.complex128)


def test_tv_stencil_adjoint():
    _adjoint_err(ops.TVGrad2D(), (17, 23))
    # TVDiv2D maps (2,H,W) -> (H,W)
    _adjoint_err(ops.TVDiv2D(), (2, 9, 11))


def test_tv_matches_oracle_stencil():
    x = RNG.standard_normal((13, 19))
    np.testing.assert_allclose(ops.TVGrad2D()(jnp.asarray(x)),
                               G.tv_grad_2d(x), atol=1e-14)
    p = RNG.standard_normal((2, 13, 19))
    np.testing.assert_allclose(ops.TVDiv2D()(jnp.asarray(p)),
                               G.tv_div_2d(p), atol=1e-14)


def test_masked_fourier_adjoint():
    mask = jnp.asarray((RNG.random(32) < 0.5).astype(np.complex128))
    _adjoint_err(ops.MaskedFourierOp(mask), (32,), jnp.complex128)


def test_scaled_compose_stacked_diagonal_adjoint():
    A = jnp.asarray(RNG.standard_normal((10, 8)))
    B = jnp.asarray(RNG.standard_normal((10, 8)))
    d = jnp.asarray(RNG.standard_normal(8))
    _adjoint_err(ops.ScaledOp(2.5, ops.DenseOp(A)), (8,))
    _adjoint_err(ops.ComposeOp(ops.DenseOp(A), ops.DiagonalOp(d)), (8,))
    _adjoint_err(ops.StackedOp([ops.DenseOp(A), ops.DenseOp(B)]), (8,))
    _adjoint_err(ops.DiagonalOp(d), (8,))


def test_identity_and_function_op():
    x = jnp.asarray(RNG.standard_normal(9))
    assert np.allclose(ops.IdentityOp()(x), x)
    A = RNG.standard_normal((6, 9))
    fop = ops.FunctionOp(lambda v: jnp.asarray(A) @ v,
                         lambda y: jnp.asarray(A).T @ y)
    _adjoint_err(fop, (9,))


def test_as_linear_op_dispatch():
    A = RNG.standard_normal((4, 3))
    assert isinstance(ops.as_linear_op(None), ops.IdentityOp)
    assert isinstance(ops.as_linear_op(A), ops.DenseOp)
    assert isinstance(ops.as_linear_op(jnp.asarray(A)), ops.DenseOp)
    fop = ops.as_linear_op(lambda x: x, lambda y: y)
    assert isinstance(fop, ops.FunctionOp)
    with pytest.raises(ValueError):
        ops.as_linear_op(lambda x: x, None)
    with pytest.raises(TypeError):
        ops.as_linear_op(3.0)


def test_adjoint_check_catches_wrong_adjoint():
    A = jnp.asarray(RNG.standard_normal((8, 8)))
    bad = ops.FunctionOp(lambda x: A @ x, lambda y: A @ y)  # not adjoint
    with pytest.raises(ValueError):
        ops.check_adjoint(bad, jnp.zeros(8), jax.random.PRNGKey(1),
                          rtol=1e-10)


def test_ops_are_pytrees():
    A = jnp.asarray(RNG.standard_normal((5, 4)))
    op = ops.ScaledOp(0.5, ops.DenseOp(A))
    leaves, treedef = jax.tree_util.tree_flatten(op)
    assert len(leaves) == 1
    op2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = jnp.asarray(RNG.standard_normal(4))
    np.testing.assert_allclose(op(x), op2(x))


def test_scipy_linear_operator_accepted():
    """scipy.sparse.linalg.LinearOperator inputs (SURVEY.md L1) run
    through jax.pure_callback — the jitted solver works unchanged,
    paying one host round trip per matvec (compat path)."""
    import scipy.sparse.linalg as spla

    A = np.asarray(RNG.standard_normal((24, 16)))
    op = ops.as_linear_op(spla.aslinearoperator(A))
    x = jnp.asarray(RNG.standard_normal(16))
    y = jnp.asarray(RNG.standard_normal(24))
    np.testing.assert_allclose(np.asarray(op(x)), A @ np.asarray(x),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)),
                               A.T @ np.asarray(y), rtol=1e-10)
    # and under jit (the solver path)
    out = jax.jit(lambda v: op.rmatvec(op(v)))(x)
    np.testing.assert_allclose(np.asarray(out),
                               A.T @ (A @ np.asarray(x)), rtol=1e-10)
