"""Distributed-correctness suite on 8 virtual CPU devices
(SURVEY.md §4): THE test is that the row-sharded solve reproduces the
single-device scalar sequence (tau_k, residuals, stop decisions)
identically — every stepsize/stopping decision is a deterministic
collective, so sharded vs unsharded must agree to reduction-order
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import fasta_tpu as ft
from fasta_tpu import sharding as sh
import problems

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _lasso(m=240, n=96):
    prob = problems.build("lasso", m=m, n=n, k=10, dtype=jnp.float64)
    prob.tau0 = 0.05
    return prob


def _solve(prob, **kw):
    kw.setdefault("tol", 1e-9)
    kw.setdefault("max_iters", 120)
    return prob.solve(**kw)


def test_mesh_construction():
    mesh = sh.make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("rows",)


@pytest.mark.parametrize("explicit", [False, True])
def test_sharded_matches_single_device(explicit):
    prob = _lasso()
    r_single = _solve(prob)

    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh, explicit=explicit)
    r_shard = _solve(sprob)

    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    # psum partial-reduction order differs from the single-device sum;
    # the BB stepsize ratio amplifies that to ~1e-8 relative by late
    # iterations — tolerance reflects reduction reordering only.
    np.testing.assert_allclose(r_shard.taus[:k], r_single.taus[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-6,
                               atol=1e-12)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-8)


def test_sharded_complex_phase_retrieval():
    prob = problems.build("phase_retrieval", m=512, n=16,
                          dtype=jnp.complex128)
    prob.tau0 = 1.0
    r_single = _solve(prob, accelerate=True, adaptive=False)

    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    r_shard = _solve(sprob, accelerate=True, adaptive=False)

    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-5,
                               atol=1e-12)


def test_sharded_planar_phase_retrieval():
    """Flagship sharded layout: planar complex, explicit shard_map with
    the fused hinge gradmap — must match the single-device planar run."""
    prob = problems.build("phase_retrieval", m=512, n=16,
                          dtype=jnp.float64, planar=True)
    prob.tau0 = 1.0
    r_single = _solve(prob, accelerate=True, adaptive=False)

    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    assert isinstance(sprob.op, sh.RowShardedPlanarDenseOp)
    r_shard = _solve(sprob, accelerate=True, adaptive=False)

    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-5,
                               atol=1e-12)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-8)


@pytest.mark.parametrize("explicit", [False, True])
def test_sharded_tv_stencil(explicit):
    """Structured (matrix-free) operator under sharding: the TV dual
    solve with b row-sharded must match the single-device run.
    explicit=False → GSPMD-inferred collectives (dual replicated);
    explicit=True → halo-exchange path (dual sharded, ppermute halos;
    full coverage in test_sharded_breadth)."""
    prob = problems.build("tv", h=64, w=64, dtype=jnp.float64)
    prob.tau0 = 2.0
    r_single = _solve(prob, tol=1e-6, max_iters=60)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh, explicit=explicit)
    if explicit:
        assert isinstance(sprob.op, sh.RowShardedTVDivOp)
    r_shard = _solve(sprob, tol=1e-6, max_iters=60)
    assert r_shard.iteration_count == r_single.iteration_count
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-9)


def test_sharded_mmv_matrix_variable():
    """Matrix-valued signal (MMV): the fused sharded lstsq gradmap must
    handle B ∈ ℝ^{m×l} (PartitionSpec pads trailing dims)."""
    prob = problems.build("mmv", m=160, n=64, l=4, k=8, dtype=jnp.float64)
    prob.tau0 = 0.08
    r_single = _solve(prob)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    r_shard = _solve(sprob)
    assert r_shard.iteration_count == r_single.iteration_count
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-8)


def test_sharded_logistic_fused_pointwise():
    """Logistic through the generic pointwise fused sharded gradmap
    must match the single-device run."""
    prob = problems.build("logistic", m=240, n=64, dtype=jnp.float64)
    prob.tau0 = 1.0
    r_single = _solve(prob)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    r_shard = _solve(sprob)
    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-5,
                               atol=1e-12)


def test_sharded_svm_fused_pointwise():
    prob = problems.build("svm", m=240, n=48, dtype=jnp.float64)
    prob.tau0 = 0.3
    r_single = _solve(prob)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    r_shard = _solve(sprob)
    assert r_shard.iteration_count == r_single.iteration_count
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-6)


def test_row_sharded_op_adjoint():
    """Explicit shard_map operator satisfies ⟨Ax,y⟩=⟨x,Aᴴy⟩."""
    mesh = sh.make_mesh()
    rng = np.random.default_rng(0)
    A = sh.shard_rows(jnp.asarray(rng.standard_normal((64, 24))), mesh)
    op = sh.RowShardedDenseOp(A, mesh)
    ft.check_adjoint(op, jnp.zeros(24), jax.random.PRNGKey(0), rtol=1e-10)


def test_row_sharded_op_matches_dense():
    mesh = sh.make_mesh()
    rng = np.random.default_rng(1)
    A_np = rng.standard_normal((64, 24))
    x_np = rng.standard_normal(24)
    y_np = rng.standard_normal(64)
    A = sh.shard_rows(jnp.asarray(A_np), mesh)
    op = sh.RowShardedDenseOp(A, mesh)
    np.testing.assert_allclose(op(jnp.asarray(x_np)), A_np @ x_np,
                               atol=1e-12)
    np.testing.assert_allclose(op.rmatvec(jnp.asarray(y_np)),
                               A_np.T @ y_np, atol=1e-12)


def test_placement_specs():
    """Matrix and measurement vector land row-sharded; signal-space data
    replicated."""
    prob = _lasso()
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    a_spec = sprob.op.A.sharding.spec
    assert a_spec[0] == "rows"
    b_spec = sprob.fterm.b.sharding.spec
    assert b_spec[0] == "rows"
    assert jnp.asarray(sprob.x0).sharding.is_fully_replicated


def test_indivisible_mesh_raises():
    prob = problems.build("lasso", m=100, n=40, k=5, dtype=jnp.float64)
    mesh = sh.make_mesh()   # 8 devices; 100 % 8 != 0
    with pytest.raises(ValueError):
        sh.shard_problem(prob, mesh)
