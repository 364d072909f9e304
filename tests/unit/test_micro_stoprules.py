"""Microsolver C4/C5 parity (round-4 VERDICT item 6): the whole-solve
kernels' selectable stopping rules and optional f-value recording must
match the XLA solver's rule-for-rule behavior (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu import microsolve, microsolve_sweep

RULES = ("residual", "normalized_residual", "ratio_residual",
         "hybrid_residual", "iterations")


@pytest.mark.parametrize("rule", RULES)
def test_dense_stop_rule_matches_xla(rule):
    """Same iteration count and trajectory as the XLA solver under each
    rule (plain f32, matched precision)."""
    prob = problems.build("lasso", m=200, n=400, k=20, dtype=jnp.float32)
    tol = 1e-5
    r = microsolve(prob, tau0=0.05, max_iters=100, tol=tol,
                   stop_rule=rule)
    prob.tau0 = 0.05
    rx = prob.solve(tol=tol, max_iters=100, fuse=False,
                    precision="standard", stop_rule=rule)
    assert r.iteration_count == rx.iteration_count
    assert r.converged == rx.converged
    np.testing.assert_allclose(r.taus[:10], rx.taus[:10], rtol=1e-5)


@pytest.mark.parametrize("rule", ("residual", "iterations"))
def test_tv_stop_rule_matches_xla(rule):
    prob = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    prob.tau0 = 2.0
    r = microsolve(prob, tau0=2.0, max_iters=300, tol=1e-3,
                   stop_rule=rule, hp=True)
    rx = prob.solve(tol=1e-3, max_iters=300, fuse=False,
                    precision="auto", stop_rule=rule)
    assert r.iteration_count == rx.iteration_count
    assert r.converged == rx.converged


def test_planar_stop_rule_residual():
    pr = problems.build("phase_retrieval", m=128, n=16, planar=True,
                        dtype=jnp.float32)
    r = microsolve(pr, tau0=0.02, max_iters=300, tol=1e-4,
                   stop_rule="residual")
    pr.tau0 = 0.02
    rx = pr.solve(tol=1e-4, max_iters=300, fuse=False,
                  precision="standard", stop_rule="residual")
    assert r.iteration_count == rx.iteration_count
    assert r.converged == rx.converged


def test_unknown_stop_rule_raises():
    prob = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    with pytest.raises(ValueError, match="stop_rule"):
        microsolve(prob, tau0=0.05, max_iters=10, stop_rule="bogus")


def test_dense_fvals_match_xla_recorder():
    """record_fvals exports the recorder's f_record: the accepted
    trial's f in adaptive mode — identical to the XLA fvals array."""
    prob = problems.build("lasso", m=200, n=400, k=20, dtype=jnp.float32)
    r = microsolve(prob, tau0=0.05, max_iters=100, tol=1e-6,
                   record_fvals=True)
    assert r.fvals is not None and len(r.fvals) == r.iteration_count
    prob.tau0 = 0.05
    rx = prob.solve(tol=1e-6, max_iters=100, fuse=False,
                    precision="standard")
    # plain-f32 kernel reduction order differs from XLA's at the ulp
    # level (convention of tests/unit/test_micro_dispatch.py)
    np.testing.assert_allclose(r.fvals, rx.fvals[:r.iteration_count],
                               rtol=1e-4)
    # default solves don't pay for (or return) the record
    r0 = microsolve(prob, tau0=0.05, max_iters=20, tol=1e-6)
    assert r0.fvals is None


def test_dense_fvals_accel_records_next_search_point():
    """FISTA mode: fvals[k] = f at the NEXT search point (extrapolated
    y), matching the XLA recorder's window semantics."""
    prob = problems.build("lasso", m=200, n=400, k=20, dtype=jnp.float32)
    K = 30
    r = microsolve(prob, tau0=0.05, max_iters=K, tol=0.0,
                   accelerate=True, record_fvals=True)
    prob.tau0 = 0.05
    rx = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                    precision="standard", adaptive=False,
                    accelerate=True, stop_rule="iterations")
    np.testing.assert_allclose(r.fvals[:K], rx.fvals[:K], rtol=1e-5)


def test_tv_fvals_hp_match_xla():
    prob = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    K = 12
    r = microsolve(prob, tau0=2.0, max_iters=K, tol=0.0, hp=True,
                   record_fvals=True, stop_rule="iterations")
    prob.tau0 = 2.0
    rx = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                    precision="auto", stop_rule="iterations")
    np.testing.assert_allclose(r.fvals[:K], rx.fvals[:K], rtol=1e-6)


def test_planar_fvals_recorded():
    pr = problems.build("phase_retrieval", m=128, n=16, planar=True,
                        dtype=jnp.float32)
    K = 10
    r = microsolve(pr, tau0=0.02, max_iters=K, tol=0.0,
                   record_fvals=True, stop_rule="iterations")
    pr.tau0 = 0.02
    rx = pr.solve(tol=1e-12, max_iters=K, fuse=False,
                  precision="standard", stop_rule="iterations")
    # plain-f32 trajectories: the transposed-storage matvecs (rowt,
    # 2026-08-20) associate the channel sums differently from the XLA
    # path, and BB feedback amplifies the ulps over iterations
    np.testing.assert_allclose(r.fvals[:K], rx.fvals[:K], rtol=2e-3)


def test_sweep_with_residual_rule_and_fvals():
    """The documented recommendation for paths (stop_rule='residual',
    solver.py solve_path note) now runs on the in-kernel sweep, with
    per-mu f-values — VERDICT round-3 missing #2's acceptance case."""
    prob = problems.build("lasso", m=100, n=200, k=10, dtype=jnp.float32)
    mus = jnp.asarray([0.05, 0.1, 0.2], jnp.float32)
    sw = microsolve_sweep(prob, mus, tau0=0.05, max_iters=200, tol=1e-5,
                          stop_rule="residual", record_fvals=True)
    assert sw.fvals is not None and len(sw.fvals) == 3
    # per-mu bit-identity vs single launches (the sweep contract)
    from fasta_tpu import L1Norm
    for i, mu in enumerate(np.asarray(mus)):
        prob_i = problems.build("lasso", m=100, n=200, k=10,
                                dtype=jnp.float32)
        prob_i.gterm = L1Norm(jnp.asarray(float(mu), jnp.float32))
        ri = microsolve(prob_i, tau0=0.05, max_iters=200, tol=1e-5,
                        stop_rule="residual", record_fvals=True)
        assert sw.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(sw.fvals[i], ri.fvals)
        np.testing.assert_array_equal(sw.taus[i], ri.taus)
