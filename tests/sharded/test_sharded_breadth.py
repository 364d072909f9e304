"""Sharded-path breadth (VERDICT r1 items 4-5): coded-diffraction
(mask-axis FFT stack), sparse operators (per-device BCOO blocks) and the
2-D rows×cols mesh for wide problems — each must reproduce the
single-device scalar sequence.
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


def _solve(prob, **kw):
    kw.setdefault("tol", 1e-9)
    kw.setdefault("max_iters", 120)
    return prob.solve(**kw)


# ---------------------------------------------------------------- CDP --

def test_sharded_cdp_op_matches_stacked():
    """ShardedCDPOp ≡ StackedOp(Compose(FFT, Diag)) on fwd and adjoint."""
    prob = problems.build("phase_retrieval_cdp", n=64, K=8,
                          dtype=jnp.complex128)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    assert isinstance(sprob.op, sh.ShardedCDPOp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(64) + 1j * rng.standard_normal(64))
    y = jnp.asarray(rng.standard_normal((8, 64))
                    + 1j * rng.standard_normal((8, 64)))
    np.testing.assert_allclose(np.asarray(sprob.op(x)),
                               np.asarray(prob.op(x)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sprob.op.rmatvec(y)),
                               np.asarray(prob.op.rmatvec(y)), atol=1e-12)
    ft.check_adjoint(sprob.op, x, jax.random.PRNGKey(1), rtol=1e-10)


def test_sharded_cdp_scalar_sequence_identity():
    prob = problems.build("phase_retrieval_cdp", n=64, K=8,
                          dtype=jnp.complex128)
    prob.tau0 = 1.0
    r_single = _solve(prob, accelerate=True, adaptive=False)

    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    r_shard = _solve(sprob, accelerate=True, adaptive=False)

    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.taus[:k], r_single.taus[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-6,
                               atol=1e-12)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-8)


def test_sharded_cdp_adaptive_mode():
    # 60-iteration window: BB amplifies psum-reorder noise ~10×/10 iters
    # on this nonconvex hinge (same cap rationale as the 2-D democratic
    # case below).
    prob = problems.build("phase_retrieval_cdp", n=64, K=8,
                          dtype=jnp.complex128)
    prob.tau0 = 1.0
    r_single = _solve(prob, max_iters=60)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    r_shard = _solve(sprob, max_iters=60)
    assert r_shard.iteration_count == r_single.iteration_count
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-6)


# ------------------------------------------------------------- sparse --

def test_sharded_sparse_op_matches_bcoo():
    prob = problems.build("sparse_lasso", m=320, n=160, density=0.05,
                          k=10, dtype=jnp.float64)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    assert isinstance(sprob.op, sh.RowShardedSparseOp)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(160))
    y = jnp.asarray(rng.standard_normal(320))
    A = prob.instance["A_sparse"].toarray()
    np.testing.assert_allclose(np.asarray(sprob.op(x)), A @ x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sprob.op.rmatvec(y)), A.T @ y,
                               atol=1e-12)


def test_sharded_sparse_scalar_sequence_identity():
    prob = problems.build("sparse_lasso", m=320, n=160, density=0.05,
                          k=10, dtype=jnp.float64)
    prob.tau0 = 0.05
    r_single = _solve(prob)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    r_shard = _solve(sprob)
    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.taus[:k], r_single.taus[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-8)


def test_sparse_2d_mesh_op_matches_bcoo():
    """GridShardedSparseOp matvec pair == the dense materialization on
    the 2x4 wide-problem mesh."""
    prob = problems.build("sparse_lasso", m=320, n=160, density=0.05,
                          k=10, dtype=jnp.float64)
    mesh = sh.make_mesh_2d(2, 4)
    sprob = sh.shard_problem_2d(prob, mesh)
    assert isinstance(sprob.op, sh.GridShardedSparseOp)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(160))
    y = jnp.asarray(rng.standard_normal(320))
    A = prob.instance["A_sparse"].toarray()
    np.testing.assert_allclose(np.asarray(sprob.op(x)), A @ x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sprob.op.rmatvec(y)), A.T @ y,
                               atol=1e-12)


def test_sparse_2d_mesh_scalar_sequence_identity():
    """Sparse wide-problem layout: full solve on the 2x4 grid matches
    the single-device trajectory (same iteration count, taus to
    reduction-order noise)."""
    prob = problems.build("sparse_lasso", m=320, n=160, density=0.05,
                          k=10, dtype=jnp.float64)
    prob.tau0 = 0.05
    r_single = _solve(prob)
    mesh = sh.make_mesh_2d(2, 4)
    sprob = sh.shard_problem_2d(prob, mesh)
    r_shard = _solve(sprob)
    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.taus[:k], r_single.taus[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-8)


# ------------------------------------------------- TV halo exchange --

@pytest.mark.parametrize("hw", [(64, 32), (80, 24), (8, 200)])
def test_row_sharded_tv_op_bitmatch(hw):
    """Halo-exchange stencil ≡ the unsharded ScaledOp(TVDiv2D) bit-for-
    bit on both legs (the halo rows are the exact neighbor values and
    ppermute zero-fill IS the Neumann boundary term).  (8, 200) gives
    every device exactly ONE image row — all vertical differences cross
    device boundaries."""
    from fasta_tpu.operators import ScaledOp, TVDiv2D
    mesh = sh.make_mesh()
    rng = np.random.default_rng(5)
    mu = 0.1
    p = jnp.asarray(rng.standard_normal((2,) + hw))
    y = jnp.asarray(rng.standard_normal(hw))
    ref = ScaledOp(mu, TVDiv2D())
    op = sh.RowShardedTVDivOp(mu, mesh)
    np.testing.assert_array_equal(np.asarray(op(p)), np.asarray(ref(p)))
    np.testing.assert_array_equal(np.asarray(op.rmatvec(y)),
                                  np.asarray(ref.rmatvec(y)))
    ft.check_adjoint(op, p, jax.random.PRNGKey(6), rtol=1e-10)


def test_sharded_tv_fused_gradmap_matches_lazy():
    from fasta_tpu.operators import ScaledOp, TVDiv2D
    mesh = sh.make_mesh()
    rng = np.random.default_rng(7)
    mu = 0.1
    p = jnp.asarray(rng.standard_normal((2, 64, 32)))
    b = jnp.asarray(rng.standard_normal((64, 32)))
    ref = ScaledOp(mu, TVDiv2D())
    op = sh.RowShardedTVDivOp(mu, mesh)
    d, f, g = sh.sharded_tv_lstsq_gradmap(op, sh.shard_rows(b, mesh))(p)
    d0 = ref(p)
    r0 = d0 - b
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d0))
    np.testing.assert_allclose(float(f), 0.5 * float(jnp.vdot(r0, r0)),
                               rtol=1e-12)   # psum reduction order only
    np.testing.assert_array_equal(np.asarray(g),
                                  np.asarray(ref.rmatvec(r0)))


@pytest.mark.parametrize("modes", [{}, dict(adaptive=False,
                                            accelerate=True)])
def test_sharded_tv_dual_scalar_sequence_identity(modes):
    """Structured-operator parallelism: the DUAL FIELD itself is sharded
    over image rows (memory scales 1/D) and the stencil legs halo-
    exchange one row via ppermute — trajectory must replay the
    single-device run."""
    prob = problems.build("tv", h=64, w=64, dtype=jnp.float64)
    prob.tau0 = 2.0
    r_single = _solve(prob, tol=1e-6, max_iters=60, **modes)
    mesh = sh.make_mesh()
    sprob = sh.shard_problem(prob, mesh)
    assert isinstance(sprob.op, sh.RowShardedTVDivOp)
    assert jnp.asarray(sprob.x0).sharding.spec == P(None, "rows", None)
    r_shard = _solve(sprob, tol=1e-6, max_iters=60, **modes)
    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.taus[:k], r_single.taus[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-6,
                               atol=1e-12)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-9)


def test_sharded_tv_indivisible_raises():
    prob = problems.build("tv", h=36, w=36, dtype=jnp.float64)
    mesh = sh.make_mesh()          # 36 % 8 != 0
    with pytest.raises(ValueError):
        sh.shard_problem(prob, mesh)


# ------------------------------------------------------------ 2-D mesh --

def test_mesh2d_construction():
    mesh = sh.make_mesh_2d(2, 4)
    assert dict(mesh.shape) == {"rows": 2, "cols": 4}


def test_grid_sharded_op_matches_dense():
    mesh = sh.make_mesh_2d(2, 4)
    rng = np.random.default_rng(3)
    A_np = rng.standard_normal((64, 32))
    A = jax.device_put(jnp.asarray(A_np),
                       jax.sharding.NamedSharding(mesh, P("rows", "cols")))
    op = sh.GridShardedDenseOp(A, mesh)
    x = jnp.asarray(rng.standard_normal(32))
    y = jnp.asarray(rng.standard_normal(64))
    np.testing.assert_allclose(np.asarray(op(x)), A_np @ x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)), A_np.T @ y,
                               atol=1e-12)
    ft.check_adjoint(op, x, jax.random.PRNGKey(4), rtol=1e-10)


@pytest.mark.parametrize("name,kwargs,tau0,iters", [
    ("lasso", dict(m=160, n=64, k=8), 0.05, 120),
    # democratic runs BB on an ill-conditioned frame: psum reordering
    # noise (1e-16) amplifies ~10×/10 iters, so the identity window is
    # capped where the drift is still ≤1e-8 (measured: 1e-9 at iter 60).
    ("democratic", dict(m=64, n=256), 0.05, 60),
])
def test_2d_mesh_scalar_sequence_identity(name, kwargs, tau0, iters):
    """Wide-problem layout: x column-sharded on a 2×4 mesh must replay
    the single-device trajectory (democratic = the SURVEY.md:126 case:
    n ≫ m, the L∞ prox's global sort runs over the col-sharded x)."""
    prob = problems.build(name, dtype=jnp.float64, **kwargs)
    prob.tau0 = tau0
    r_single = _solve(prob, max_iters=iters)

    mesh = sh.make_mesh_2d(2, 4)
    sprob = sh.shard_problem_2d(prob, mesh)
    assert isinstance(sprob.op, sh.GridShardedDenseOp)
    r_shard = _solve(sprob, max_iters=iters)

    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.taus[:k], r_single.taus[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-6,
                               atol=1e-12)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-8)


def test_grid_sharded_planar_op_matches_dense():
    mesh = sh.make_mesh_2d(2, 4)
    rng = np.random.default_rng(7)
    Ar = rng.standard_normal((64, 32))
    Ai = rng.standard_normal((64, 32))
    spec = jax.sharding.NamedSharding(mesh, P("rows", "cols"))
    op = sh.GridShardedPlanarDenseOp(
        jax.device_put(jnp.asarray(Ar), spec),
        jax.device_put(jnp.asarray(Ai), spec), mesh)
    dense = ft.PlanarDenseOp(jnp.asarray(Ar), jnp.asarray(Ai))
    x = jnp.asarray(rng.standard_normal((32, 2)))
    y = jnp.asarray(rng.standard_normal((64, 2)))
    np.testing.assert_allclose(np.asarray(op(x)), np.asarray(dense(x)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)),
                               np.asarray(dense.rmatvec(y)), atol=1e-12)
    ft.check_adjoint(op, x, jax.random.PRNGKey(4), rtol=1e-10)


def test_2d_mesh_planar_scalar_sequence_identity():
    """The flagship planar-complex layout on the wide-problem 2-D mesh
    (round-2 VERDICT missing #5): x (n,2) sharded on its signal axis
    over cols, (Ar, Ai) grid-sharded — trajectory must replay the
    single-device run."""
    prob = problems.build("phase_retrieval", m=64, n=64, planar=True,
                          dtype=jnp.float64)
    prob.tau0 = 1.0
    # the hinge's max() branches amplify psum-reordering noise ~10x per
    # 5 BB iterations (measured: 1.6e-15 at iter 10, 2.8e-8 at 40) —
    # cap the identity window where the drift is still well under the
    # tolerance, like the democratic 2-D case above.
    iters = 40
    r_single = _solve(prob, max_iters=iters)

    mesh = sh.make_mesh_2d(2, 4)
    sprob = sh.shard_problem_2d(prob, mesh)
    assert isinstance(sprob.op, sh.GridShardedPlanarDenseOp)
    r_shard = _solve(sprob, max_iters=iters)

    assert r_shard.iteration_count == r_single.iteration_count
    k = r_single.iteration_count
    np.testing.assert_allclose(r_shard.taus[:k], r_single.taus[:k],
                               rtol=1e-6)
    np.testing.assert_allclose(r_shard.residuals[:k],
                               r_single.residuals[:k], rtol=1e-6,
                               atol=1e-12)
    np.testing.assert_allclose(r_shard.solution, r_single.solution,
                               atol=1e-7)


def test_2d_planar_placement_specs():
    prob = problems.build("phase_retrieval", m=64, n=64, planar=True,
                          dtype=jnp.float64)
    mesh = sh.make_mesh_2d(2, 4)
    sprob = sh.shard_problem_2d(prob, mesh)
    assert sprob.op.Ar.sharding.spec == P("rows", "cols")
    assert sprob.op.Ai.sharding.spec == P("rows", "cols")
    assert sprob.fterm.b.sharding.spec[0] == "rows"
    # planar signal vectors shard the SIGNAL axis, not the channel axis
    assert jnp.asarray(sprob.x0).sharding.spec[0] == "cols"
    assert sprob.gterm.c.sharding.spec[0] == "cols"


def test_2d_placement_specs():
    prob = problems.build("democratic", m=64, n=256, dtype=jnp.float64)
    mesh = sh.make_mesh_2d(2, 4)
    sprob = sh.shard_problem_2d(prob, mesh)
    assert sprob.op.A.sharding.spec == P("rows", "cols")
    assert sprob.fterm.b.sharding.spec[0] == "rows"
    assert jnp.asarray(sprob.x0).sharding.spec[-1] == "cols"


def test_2d_mesh_indivisible_raises():
    prob = problems.build("lasso", m=100, n=30, k=5, dtype=jnp.float64)
    mesh = sh.make_mesh_2d(2, 4)   # n=30 not divisible by 4 cols
    with pytest.raises(ValueError):
        sh.shard_problem_2d(prob, mesh)
