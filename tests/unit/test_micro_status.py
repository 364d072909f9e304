"""Round-5 microsolver result-contract features (round-4 VERDICT items
4 and 5): the in-kernel NONFINITE guard + halt status code, and the C5
backtrack-count / best-iterate fields.

Nonfinite guard: a NaN-poisoned solve (e.g. a NaN τ₀) makes every
stop-rule comparison False, so before the guard the kernels silently
burned max_iters and returned converged=False with no cause.  Now
``isfinite(f) & isfinite(τ) & isfinite(res)`` folds into the loop halt
(kernels/microsolver.halt_code) and the status surfaces as
MicroResult.status = "nonfinite" after an EARLY exit.

C5 fields: per-iteration backtrack counts (record_bts), prox-point
objectives (record_objs, g analytic per kernel family), normalized
residuals (record_nres), the full iterate trajectory (record_iterates,
dense + planar — in-loop 8-row-block HBM DMA), and best_index (the
XLA/oracle best-iterate rule).  With these the dense and planar
kernels export the COMPLETE FastaResult contract; the TV kernel lacks
only record_iterates (a 512² dual trajectory is ~4 GB).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu.kernels.microsolver import microsolve_lasso
from fasta_tpu.kernels.microsolver_planar import microsolve_planar_phasemax
from fasta_tpu.kernels.microsolver_tv import microsolve_tv
from fasta_tpu.micro import microsolve, microsolve_batch


def _lasso(m=200, n=400, k=20):
    return problems.build("lasso", m=m, n=n, k=k, dtype=jnp.float32)


# ---------------------------------------------------------------- status


@pytest.mark.parametrize("accelerate", [False, True])
def test_dense_nonfinite_tau0_aborts_early(accelerate):
    prob = _lasso()
    inst = prob.instance
    out = microsolve_lasso(
        jnp.asarray(inst["A"], jnp.float32),
        jnp.asarray(inst["b"], jnp.float32),
        jnp.asarray(inst["x0"], jnp.float32),
        math.nan, inst["mu"], max_iters=500, tol=1e-6, interpret=True,
        hp=True, accelerate=accelerate)
    k, status = int(out[3]), int(out[4])
    assert status == 2, (k, status)
    assert k <= 3, f"nonfinite abort should exit immediately, ran {k}"


def test_tv_nonfinite_tau0_aborts_early():
    ti = problems.build("tv", h=24, w=24, dtype=jnp.float32).instance
    b = jnp.asarray(ti["b"], jnp.float32)
    p0 = jnp.zeros((2,) + b.shape, jnp.float32)
    out = microsolve_tv(b, p0, math.nan, ti["mu"], max_iters=500,
                        tol=1e-5, interpret=True)
    k, status = int(out[3]), int(out[4])
    assert status == 2 and k <= 3, (k, status)


def test_planar_nonfinite_tau0_aborts_early():
    pr = problems.build("phase_retrieval", m=256, n=64, planar=True,
                        dtype=jnp.float32)
    out = microsolve_planar_phasemax(
        jnp.asarray(pr.op.Ar), jnp.asarray(pr.op.Ai),
        jnp.asarray(pr.fterm.b), jnp.asarray(pr.gterm.c),
        jnp.asarray(pr.x0),
        math.nan, max_iters=500, tol=1e-6, interpret=True)
    k, status = int(out[3]), int(out[4])
    assert status == 2 and k <= 3, (k, status)


def test_microsolve_status_names():
    prob = _lasso()
    # healthy convergence
    r = prob.microsolve(tau0=0.05, max_iters=300, tol=1e-6,
                        interpret=True)
    assert r.status == "converged" and r.converged
    # iteration exhaustion
    r = prob.microsolve(tau0=0.05, max_iters=5, tol=1e-6,
                        stop_rule="iterations", interpret=True)
    assert r.status == "max_iters" and not r.converged
    # nonfinite abort — converged must be False even though the status
    # code (2) is truthy
    r = prob.microsolve(tau0=math.nan, max_iters=300, tol=1e-6,
                        interpret=True)
    assert r.status == "nonfinite" and not r.converged
    assert r.iteration_count <= 3


def test_batch_statuses_mixed():
    """Per-instance τ₀ lets one batch mix healthy and poisoned solves;
    the poisoned instance must not affect its neighbors."""
    prob = _lasso(m=120, n=200, k=10)
    inst = prob.instance
    b = jnp.asarray(inst["b"], jnp.float32)
    bs = jnp.stack([b, b, b])
    r = microsolve_batch(prob, bs, tau0=jnp.asarray(
        [0.05, math.nan, 0.05], jnp.float32),
        max_iters=300, tol=1e-6, interpret=True)
    assert list(r.statuses) == ["converged", "nonfinite", "converged"]
    assert list(r.converged) == [True, False, True]
    assert r.iteration_counts[1] <= 3
    assert r.iteration_counts[0] == r.iteration_counts[2] > 3


# ----------------------------------------------------- backtracks / best


def test_backtracks_match_xla_recorder():
    """record_bts counts == the XLA solver's per-iteration backtracks
    on a matching trajectory (standard precision; the configuration of
    test_microsolver_matches_xla_solver, which pins identical iteration
    counts)."""
    prob = _lasso()
    prob.tau0 = 0.5          # big tau0 forces real line-search activity
    rm = prob.microsolve(max_iters=100, tol=1e-6, interpret=True,
                         hp=False)
    rx = prob.solve(tol=1e-6, max_iters=100, fuse=False,
                    precision="standard")
    assert rm.iteration_count == rx.iteration_count
    assert rm.backtracks is not None
    assert rm.backtracks.sum() > 0, "tau0=0.5 must trigger backtracking"
    np.testing.assert_array_equal(rm.backtracks,
                                  rx.backtracks[:rm.iteration_count])
    assert rm.total_backtracks == int(
        rx.backtracks[:rm.iteration_count].sum())


def test_best_index_is_argmin_residual():
    prob = _lasso()
    r = prob.microsolve(tau0=0.05, max_iters=100, tol=1e-6,
                        interpret=True)
    assert r.best_index == int(np.argmin(r.residuals))


def test_record_bts_off_gives_none():
    prob = _lasso()
    r = prob.microsolve(tau0=0.05, max_iters=50, tol=1e-6,
                        interpret=True, record_bts=False)
    assert r.backtracks is None and r.total_backtracks is None
    # best_index derives from residuals and survives record_bts=False
    assert r.best_index is not None


def test_objectives_match_xla_recorder():
    """record_objs series == the XLA solver's record_objective series
    on a matching trajectory (standard precision), for the l1 prox;
    best_index switches to the argmin-objective rule."""
    prob = _lasso()
    prob.tau0 = 0.05
    rm = prob.microsolve(max_iters=100, tol=1e-6, interpret=True,
                         hp=False, record_objs=True)
    rx = prob.solve(tol=1e-6, max_iters=100, fuse=False,
                    precision="standard", record_objective=True)
    assert rm.iteration_count == rx.iteration_count
    k = rm.iteration_count
    np.testing.assert_allclose(rm.objectives,
                               np.asarray(rx.objectives)[:k],
                               rtol=1e-5, atol=1e-6)
    # best_index follows the argmin-objective rule.  Near convergence
    # the objective tail is flat to f32 eps, so the micro and XLA
    # argmins may land on different near-tied iterates — assert
    # internal consistency plus value-level agreement instead of index
    # equality.
    assert rm.best_index == int(np.argmin(rm.objectives))
    xbest = float(np.min(np.asarray(rx.objectives)[:k]))
    mbest = float(rm.objectives[rm.best_index])
    assert abs(mbest - xbest) <= 1e-5 * (1.0 + abs(xbest))


def test_objectives_ridge_gval():
    """The ridge prox's analytic g — (lambda/2)||x||^2 with mu carrying
    lambda — via the svm problem (squared-hinge + ridge); fixed-prefix
    comparison (hw_validate [9] pins the trajectory parity)."""
    prob = problems.build("svm", m=120, n=40, dtype=jnp.float32)
    prob.tau0 = 0.1
    K = 15
    rm = prob.microsolve(max_iters=K, tol=0.0, stop_rule="iterations",
                         interpret=True, hp=False, record_objs=True)
    rx = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                    stop_rule="iterations", precision="standard",
                    record_objective=True)
    np.testing.assert_allclose(rm.objectives[:K],
                               np.asarray(rx.objectives)[:K],
                               rtol=1e-4, atol=1e-5)


def test_objectives_tv_prefix():
    """TV dual objs = prox-point f (g is the box indicator): prefix
    match vs the XLA hp record_objective series."""
    tvp = problems.build("tv", h=32, w=32, dtype=jnp.float32)
    tvp.tau0 = 2.0
    K = 15
    rm = tvp.microsolve(max_iters=K, tol=0.0, stop_rule="iterations",
                        interpret=True, record_objs=True)
    rx = tvp.solve(tol=1e-12, max_iters=K, fuse=False,
                   stop_rule="iterations", precision="auto",
                   record_objective=True)
    np.testing.assert_allclose(rm.objectives[:K],
                               np.asarray(rx.objectives)[:K],
                               rtol=1e-4)


def test_objectives_planar_prefix():
    """Planar PhaseMax objs = f(x1) - <c, x1>: prefix match vs the XLA
    record_objective series."""
    pr = problems.build("phase_retrieval", m=256, n=32, planar=True,
                        dtype=jnp.float32)
    pr.tau0 = 1.0
    K = 10
    rm = pr.microsolve(max_iters=K, tol=0.0, stop_rule="iterations",
                       interpret=True, record_objs=True)
    rx = pr.solve(tol=1e-12, max_iters=K, fuse=False,
                  stop_rule="iterations", precision="standard",
                  record_objective=True)
    np.testing.assert_allclose(rm.objectives[:K],
                               np.asarray(rx.objectives)[:K],
                               rtol=2e-3, atol=1e-4)


def test_norm_residuals_match_xla():
    """record_nres series == the XLA recorder's norm_residuals on a
    matching trajectory — closing the LAST FastaResult series; with it
    the dense kernel exports the complete contract."""
    prob = _lasso()
    prob.tau0 = 0.05
    rm = prob.microsolve(max_iters=100, tol=1e-6, interpret=True,
                         hp=False, record_nres=True)
    rx = prob.solve(tol=1e-6, max_iters=100, fuse=False,
                    precision="standard")
    assert rm.iteration_count == rx.iteration_count
    k = rm.iteration_count
    # atol covers the near-converged tail, where nres ~1e-5 and the
    # in-kernel vs XLA reduction orders differ at f32 eps level
    np.testing.assert_allclose(rm.norm_residuals,
                               np.asarray(rx.norm_residuals)[:k],
                               rtol=1e-3, atol=1e-6)


def test_norm_residuals_tv_planar_prefix():
    """TV and planar kernels record the same series (fixed-prefix
    comparison vs the XLA recorder)."""
    tvp = problems.build("tv", h=32, w=32, dtype=jnp.float32)
    tvp.tau0 = 2.0
    K = 15
    rm = tvp.microsolve(max_iters=K, tol=0.0, stop_rule="iterations",
                        interpret=True, record_nres=True)
    rx = tvp.solve(tol=1e-12, max_iters=K, fuse=False,
                   stop_rule="iterations", precision="auto")
    np.testing.assert_allclose(rm.norm_residuals[:K],
                               np.asarray(rx.norm_residuals)[:K],
                               rtol=1e-3)
    pr = problems.build("phase_retrieval", m=256, n=32, planar=True,
                        dtype=jnp.float32)
    pr.tau0 = 1.0
    K = 10
    rm = pr.microsolve(max_iters=K, tol=0.0, stop_rule="iterations",
                       interpret=True, record_nres=True)
    rx = pr.solve(tol=1e-12, max_iters=K, fuse=False,
                  stop_rule="iterations", precision="standard")
    np.testing.assert_allclose(rm.norm_residuals[:K],
                               np.asarray(rx.norm_residuals)[:K],
                               rtol=5e-3)


def test_nres_with_non_nres_stop_rule():
    """record_nres forces the normalizer computation even under a stop
    rule that does not read it (residual)."""
    prob = _lasso()
    r = prob.microsolve(tau0=0.05, max_iters=100, tol=1e-6,
                        stop_rule="residual", interpret=True,
                        record_nres=True)
    assert r.norm_residuals is not None
    assert r.norm_residuals.shape == (r.iteration_count,)
    assert np.all(r.norm_residuals > 0)


def test_record_iterates_matches_xla():
    """Dense-kernel record_iterates (in-loop 8-row-block HBM DMA) ==
    the XLA recorder's iterate trajectory on a matching trajectory;
    the final iteration count is deliberately NOT a multiple of 8 so
    the epilogue's partial-block flush is exercised."""
    prob = _lasso()
    prob.tau0 = 0.05
    rm = prob.microsolve(max_iters=100, tol=1e-6, interpret=True,
                         hp=False, record_iterates=True)
    rx = prob.solve(tol=1e-6, max_iters=100, fuse=False,
                    precision="standard", record_iterates=True)
    k = rm.iteration_count
    assert k == rx.iteration_count and k % 8 != 0
    assert rm.iterates.shape == (k, 400)
    np.testing.assert_allclose(rm.iterates,
                               np.asarray(rx.iterates)[:k], atol=2e-5)
    # the last recorded iterate IS the returned solution
    np.testing.assert_array_equal(rm.iterates[-1],
                                  np.asarray(rm.solution))


def test_record_iterates_rejected_for_tv():
    tvp = problems.build("tv", h=24, w=24, dtype=jnp.float32)
    with pytest.raises(ValueError, match="dense and planar"):
        tvp.microsolve(tau0=2.0, record_iterates=True, interpret=True)


def test_record_iterates_planar_matches_xla():
    """Planar-kernel record_iterates (both channels staged
    side-by-side, 8-row-block HBM DMA) == the XLA recorder."""
    pr = problems.build("phase_retrieval", m=256, n=32, planar=True,
                        dtype=jnp.float32)
    pr.tau0 = 1.0
    K = 12
    rm = pr.microsolve(max_iters=K, tol=0.0, stop_rule="iterations",
                       interpret=True, record_iterates=True)
    rx = pr.solve(tol=1e-12, max_iters=K, fuse=False,
                  stop_rule="iterations", precision="standard",
                  record_iterates=True)
    assert rm.iterates.shape == (K, 32, 2)
    np.testing.assert_allclose(rm.iterates,
                               np.asarray(rx.iterates)[:K], atol=5e-4)


def test_all_recording_flags_together():
    """Every optional recording flag at once — pins the optional-output
    append/parse order (fvals, bts, objs, iterates, nres) across the
    kernel wrappers and micro.py's closures."""
    prob = _lasso()
    r = prob.microsolve(tau0=0.05, max_iters=100, tol=1e-6,
                        interpret=True, record_fvals=True,
                        record_bts=True, record_objs=True,
                        record_iterates=True, record_nres=True)
    k = r.iteration_count
    assert r.fvals.shape == (k,) and r.backtracks.shape == (k,)
    assert r.objectives.shape == (k,) and r.norm_residuals.shape == (k,)
    assert r.iterates.shape == (k, 400)
    np.testing.assert_array_equal(r.iterates[-1], np.asarray(r.solution))
    pr = problems.build("phase_retrieval", m=256, n=32, planar=True,
                        dtype=jnp.float32)
    r2 = pr.microsolve(tau0=1.0, max_iters=50, tol=1e-5, interpret=True,
                       record_fvals=True, record_bts=True,
                       record_objs=True, record_iterates=True,
                       record_nres=True)
    k2 = r2.iteration_count
    assert r2.iterates.shape == (k2, 32, 2)
    assert r2.norm_residuals.shape == (k2,)


def test_batch_backtracks_match_singles():
    prob = _lasso(m=120, n=200, k=10)
    inst = prob.instance
    b = jnp.asarray(inst["b"], jnp.float32)
    rng = np.random.default_rng(0)
    b2 = b + jnp.asarray(rng.standard_normal(b.shape) * 0.01,
                         jnp.float32)
    rb = microsolve_batch(prob, jnp.stack([b, b2]), tau0=0.05,
                          max_iters=200, tol=1e-6, interpret=True)
    for i, bi in enumerate([b, b2]):
        # compare against the single-solve kernel path directly
        out = microsolve_lasso(
            jnp.asarray(inst["A"], jnp.float32), bi,
            jnp.asarray(inst["x0"], jnp.float32),
            0.05, inst["mu"], max_iters=200, tol=1e-6, interpret=True,
            record_bts=True)
        k = int(out[3])
        assert rb.iteration_counts[i] == k
        np.testing.assert_array_equal(rb.backtracks[i],
                                      np.asarray(out[5][:k], np.int64))
        assert rb.total_backtracks[i] == rb.backtracks[i].sum()
    assert rb.best_indices is not None
