"""Unit tests for solver mechanics: BB stepsize formulas, backtracking
trigger paths, restart, stopping rules, the nonmonotone window, and the
Lipschitz initializer — each compared against the float64 oracle on small
scripted instances (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fasta_tpu as ft
from reference_oracle.fasta_numpy import fasta as fasta_np
from reference_oracle import generators as G


def _small_lasso(m=60, n=90, seed=11):
    return G.make_lasso(m=m, n=n, k=10, seed=seed)


def _solve_both(inst, tau0, **kw):
    r_np = fasta_np(inst["op"], inst.get("op_t"), inst["f"], inst["gradf"],
                    inst["g"], inst["proxg"], inst["x0"], tau0=tau0, **kw)
    prob = _to_problem(inst)
    r_j = ft.fasta(prob["op"], None, prob["fterm"], None, prob["gterm"],
                   None, prob["x0"], tau0=tau0, **kw)
    return r_np, r_j


def _to_problem(inst):
    A = jnp.asarray(inst["A"])
    name = inst["name"]
    if name in ("lasso",):
        return dict(op=ft.DenseOp(A),
                    fterm=ft.LeastSquares(jnp.asarray(inst["b"])),
                    gterm=ft.L1Norm(inst["mu"]),
                    x0=jnp.asarray(inst["x0"]))
    if name == "logistic":
        return dict(op=ft.DenseOp(A),
                    fterm=ft.Logistic(jnp.asarray(inst["b"])),
                    gterm=ft.L1Norm(inst["mu"]),
                    x0=jnp.asarray(inst["x0"]))
    raise KeyError(name)


def test_bb_stepsize_sequence_matches_oracle():
    """The Zhou–Gao–Dai hybrid BB rule must reproduce the oracle's tau_k
    sequence exactly (f64)."""
    inst = _small_lasso()
    r_np, r_j = _solve_both(inst, tau0=0.1, tol=1e-12, max_iters=40,
                            adaptive=True)
    k = min(r_np.iteration_count, r_j.iteration_count)
    np.testing.assert_allclose(r_j.taus[:k], r_np.taus[:k], rtol=1e-8)


def test_backtracking_trigger_path():
    """A deliberately huge tau0 must trigger backtracking identically."""
    inst = _small_lasso(seed=12)
    r_np, r_j = _solve_both(inst, tau0=50.0, tol=1e-10, max_iters=30,
                            adaptive=True)
    assert r_np.total_backtracks > 0
    assert r_j.total_backtracks == r_np.total_backtracks
    np.testing.assert_array_equal(r_j.backtracks[:5], r_np.backtracks[:5])


def test_no_backtracking_when_disabled():
    inst = _small_lasso(seed=13)
    _, r_j = _solve_both(inst, tau0=50.0, tol=1e-10, max_iters=10,
                         adaptive=True, backtrack=False)
    assert r_j.total_backtracks == 0


def test_restart_changes_trajectory():
    """Adaptive restart must alter the FISTA path (and match oracle in
    both settings)."""
    inst = _small_lasso(seed=14)
    for restart in (True, False):
        r_np, r_j = _solve_both(inst, tau0=0.1, tol=1e-12, max_iters=60,
                                adaptive=False, accelerate=True,
                                restart=restart)
        k = min(r_np.iteration_count, r_j.iteration_count)
        np.testing.assert_allclose(r_j.residuals[:k], r_np.residuals[:k],
                                   rtol=1e-6)


@pytest.mark.parametrize("rule", ["residual", "normalized_residual",
                                  "ratio_residual", "hybrid_residual",
                                  "iterations"])
def test_stopping_rules_match_oracle(rule):
    inst = _small_lasso(seed=15)
    r_np, r_j = _solve_both(inst, tau0=0.1, tol=1e-4, max_iters=80,
                            adaptive=True, stop_rule=rule)
    assert r_j.iteration_count == r_np.iteration_count
    assert r_j.converged == r_np.converged


def test_nonmonotone_window_size_matters():
    """window=1 (monotone) vs window=10 must match the oracle's behavior
    for each setting."""
    inst = G.make_logistic(m=80, n=40, seed=16)
    for w in (1, 3, 10):
        r_np, r_j = _solve_both(inst, tau0=2.0, tol=1e-10, max_iters=50,
                                window=w)
        k = min(r_np.iteration_count, r_j.iteration_count, 25)
        np.testing.assert_allclose(r_j.taus[:k], r_np.taus[:k], rtol=1e-6)


def test_record_objective_and_iterates():
    inst = _small_lasso(seed=17)
    prob = _to_problem(inst)
    r = ft.fasta(prob["op"], None, prob["fterm"], None, prob["gterm"], None,
                 prob["x0"], tau0=0.1, tol=1e-12, max_iters=15,
                 record_objective=True, record_iterates=True)
    assert r.objectives is not None and len(r.objectives) == r.iteration_count
    assert r.iterates is not None
    assert r.iterates.shape == (r.iteration_count,) + np.shape(inst["x0"])
    # objective = f + g at each iterate
    i = r.iteration_count - 1
    f_check = inst["f"](inst["A"] @ r.iterates[i])
    g_check = inst["g"](r.iterates[i])
    np.testing.assert_allclose(r.objectives[i], f_check + g_check, rtol=1e-9)


def test_estimate_stepsize_formula():
    """tau0 must equal (2/L)/10 for the estimated L."""
    inst = _small_lasso(seed=18)
    op = ft.DenseOp(jnp.asarray(inst["A"]))
    fterm = ft.LeastSquares(jnp.asarray(inst["b"]))
    tau0, L = ft.estimate_stepsize(op, fterm, jnp.asarray(inst["x0"]),
                                   jax.random.PRNGKey(0))
    assert float(tau0) == pytest.approx(2.0 / float(L) / 10.0)
    # for least squares, L estimate is bounded by the true ||A||^2
    L_true = np.linalg.norm(inst["A"], 2) ** 2
    assert float(L) <= L_true * 1.01


def test_best_iterate_tracking():
    inst = _small_lasso(seed=19)
    prob = _to_problem(inst)
    r = ft.fasta(prob["op"], None, prob["fterm"], None, prob["gterm"], None,
                 prob["x0"], tau0=0.1, tol=1e-12, max_iters=30,
                 record_objective=True)
    best_obj = inst["f"](inst["A"] @ r.best_iterate) + inst["g"](r.best_iterate)
    assert best_obj <= r.objectives.min() + 1e-9


def test_options_validation():
    with pytest.raises(ValueError):
        ft.FastaOptions(stop_rule="nope")
    with pytest.raises(ValueError):
        ft.FastaOptions(window=0)
    assert ft.FastaOptions(adaptive=True).shrink_factor == 0.2
    assert ft.FastaOptions(adaptive=False).shrink_factor == 0.5
    assert ft.FastaOptions(stepsize_shrink=0.3).shrink_factor == 0.3
    assert ft.FastaOptions(accelerate=True).effective_mode == "accelerated"


def test_solver_cache_reuse():
    """Same options + same structure => same compiled callable."""
    opts = ft.FastaOptions(max_iters=5)
    assert ft.make_solver(opts) is ft.make_solver(opts)


def test_lean_mode_trajectory_invariant():
    """record_diagnostics=False must not change the math: identical
    iteration count, solution and backtrack total; diagnostic arrays
    come back None (the loop body just drops ~6 update-slice kernels)."""
    import problems as _problems
    prob = _problems.build("lasso", m=64, n=96, k=8, dtype=jnp.float64)
    prob.tau0 = 0.05
    for kw in (dict(), dict(adaptive=False, accelerate=True)):
        r_full = prob.solve(tol=1e-8, max_iters=120, **kw)
        r_lean = prob.solve(tol=1e-8, max_iters=120,
                            record_diagnostics=False, **kw)
        assert r_lean.iteration_count == r_full.iteration_count
        assert r_lean.total_backtracks == r_full.total_backtracks
        np.testing.assert_array_equal(r_lean.solution, r_full.solution)
        assert r_lean.taus is None and r_lean.residuals is None
        assert r_lean.fvals is None and r_lean.backtracks is None


def test_lean_mode_option_validation():
    with pytest.raises(ValueError, match="record_diagnostics"):
        ft.FastaOptions(record_diagnostics=False, record_objective=True)
    with pytest.raises(ValueError, match="record_diagnostics"):
        from fasta_tpu import solve_path
        import problems as _problems
        prob = _problems.build("lasso", m=32, n=48, k=4,
                               dtype=jnp.float64)
        solve_path(prob.op, prob.fterm,
                   ft.L1Norm(jnp.asarray([0.3, 0.1])),
                   jnp.asarray(prob.x0), 0.05,
                   ft.FastaOptions(record_diagnostics=False))


def test_solver_cache_bounded():
    """Cycling more option sets than the LRU capacity must not grow the
    executable cache without bound (round-2 VERDICT weak #5) — and the
    most recent entries must survive the eviction sweep."""
    from fasta_tpu import solver as _solver

    cap = _solver._SOLVER_CACHE.capacity
    for i in range(cap + 10):
        ft.make_solver(ft.FastaOptions(max_iters=1000 + i))
    assert len(_solver._SOLVER_CACHE) == cap
    # the most recent key is still cached (LRU evicts oldest first)
    last = ft.FastaOptions(max_iters=1000 + cap + 9)
    assert ft.make_solver(last) is ft.make_solver(last)
