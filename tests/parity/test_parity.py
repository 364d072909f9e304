"""Parity suite: per-iteration trajectory match (tau_k, residual_k, f_k)
and final objective vs the float64 NumPy oracle on all thirteen problems
(the five BASELINE configs at reduced size + the optional ones) —
SURVEY.md §4 / §7 hard part 4.

Comparison discipline: float64 on both sides, identical instance data
(shared generators), explicit tau0 (no RNG in the loop).  Trajectories
are compared over the first K iterations with a tolerance band; the final
objective must agree tightly.  Knife-edge backtracking problems
(logistic) may diverge late — the band + objective check covers them.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import fasta_tpu as ft
from fasta_tpu.problem import Problem
import problems as P
from reference_oracle.fasta_numpy import fasta as fasta_np

# name -> (builder kwargs, tau0, solver kwargs)
CASES = {
    "lasso": (dict(m=150, n=300, k=15), 0.05, dict(tol=1e-9, max_iters=200)),
    "nnls": (dict(m=120, n=60), 0.08, dict(tol=1e-9, max_iters=200)),
    "logistic": (dict(m=150, n=80), 1.0, dict(tol=1e-8, max_iters=150)),
    "tv": (dict(h=32, w=32), 2.0, dict(tol=1e-8, max_iters=120)),
    "phase_retrieval": (dict(m=256, n=16), 1.0,
                        dict(tol=1e-8, max_iters=150)),
    "phase_retrieval_cdp": (dict(n=32, K=4), 1.0,
                            dict(tol=1e-8, max_iters=120)),
    "democratic": (dict(m=64, n=256), 0.05, dict(tol=1e-8, max_iters=120)),
    "mmv": (dict(m=80, n=160, l=4, k=10), 0.08,
            dict(tol=1e-8, max_iters=150)),
    "matrix_completion": (dict(d1=30, d2=30, rank=2), 1.0,
                          dict(tol=1e-7, max_iters=80)),
    "max_norm": (dict(d1=40, d2=8), 0.5, dict(tol=1e-9, max_iters=80)),
    "svm": (dict(m=120, n=30), 0.3, dict(tol=1e-8, max_iters=150)),
    "sparse_lasso": (dict(m=200, n=400, density=0.05, k=15), 0.05,
                     dict(tol=1e-9, max_iters=200)),
    "nmf": (dict(d1=30, d2=20, rank=3), 0.05,
            dict(tol=1e-8, max_iters=150)),
}

MODES = {
    "plain": dict(adaptive=False, accelerate=False),
    "adaptive": dict(adaptive=True, accelerate=False),
    "accelerated": dict(adaptive=False, accelerate=True),
}


def _dtype_for(name):
    if name in ("phase_retrieval", "phase_retrieval_cdp"):
        return jnp.complex128
    return jnp.float64


def _run_pair(name, mode):
    kwargs, tau0, skw = CASES[name]
    prob: Problem = P.build(name, dtype=_dtype_for(name), **kwargs)
    inst = prob.instance
    mkw = MODES[mode]
    r_np = fasta_np(inst["op"], inst.get("op_t"), inst["f"], inst["gradf"],
                    inst["g"], inst["proxg"], inst["x0"], tau0=tau0,
                    record_objective=True, **skw, **mkw)
    prob.tau0 = tau0
    r_j = prob.solve(record_objective=True, **skw, **mkw)
    return r_np, r_j


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("mode", list(MODES))
def test_trajectory_parity(name, mode):
    r_np, r_j = _run_pair(name, mode)

    # Early-trajectory strict match: before fp noise can compound.
    k_strict = min(10, r_np.iteration_count, r_j.iteration_count)
    np.testing.assert_allclose(r_j.taus[:k_strict], r_np.taus[:k_strict],
                               rtol=1e-7,
                               err_msg=f"{name}/{mode}: tau trajectory")
    np.testing.assert_allclose(
        r_j.residuals[:k_strict], r_np.residuals[:k_strict], rtol=1e-6,
        atol=1e-12, err_msg=f"{name}/{mode}: residual trajectory")
    np.testing.assert_allclose(
        r_j.fvals[:k_strict], r_np.fvals[:k_strict], rtol=1e-7,
        atol=1e-12, err_msg=f"{name}/{mode}: f trajectory")

    # Final-objective agreement (the mode cross-check oracle, §4.2).
    # The L∞-regularized problem has degenerate near-optimal vertices
    # (max-magnitude ties): fp-level branch flips in the sort-based prox
    # land on different vertices with ~1e-4 objective spread.
    obj_tol = 1e-3 if name == "democratic" else 1e-5
    scale = max(abs(r_np.objectives[-1]), 1e-10)
    assert abs(r_j.objectives[-1] - r_np.objectives[-1]) / scale < obj_tol, \
        f"{name}/{mode}: final objective {r_j.objectives[-1]} vs " \
        f"{r_np.objectives[-1]}"

    # Iteration counts: identical unless a knife-edge backtracking branch
    # flipped (tolerate small drift on the fp-sensitive problems).
    drift = abs(r_j.iteration_count - r_np.iteration_count)
    limit = 0 if name in ("lasso", "nnls", "max_norm") else \
        max(5, int(0.2 * r_np.iteration_count))
    assert drift <= limit, \
        f"{name}/{mode}: iterations {r_j.iteration_count} vs " \
        f"{r_np.iteration_count}"


@pytest.mark.parametrize("name", ["lasso", "nnls"])
def test_exact_trajectory_on_stable_problems(name):
    """Quadratic problems with simple proxes: the full trajectory must
    match to near machine precision in f64."""
    r_np, r_j = _run_pair(name, "adaptive")
    assert r_j.iteration_count == r_np.iteration_count
    k = r_np.iteration_count
    # XLA vs BLAS reduction order compounds through the BB ratios to
    # ~1e-8 relative over a full trajectory; that is the fp floor.
    np.testing.assert_allclose(r_j.residuals[:k], r_np.residuals[:k],
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(r_j.solution, r_np.solution, atol=1e-8)
    np.testing.assert_array_equal(r_j.backtracks[:k], r_np.backtracks[:k])


def test_modes_reach_same_objective():
    """The reference's de-facto correctness test: plain vs adaptive vs
    accelerated converge to the same objective (SURVEY.md §4.2)."""
    prob = P.build("lasso", m=150, n=300, k=15, dtype=jnp.float64)
    prob.tau0 = 0.05
    objs = []
    for mode_kw in MODES.values():
        # plain FBS at fixed tau converges slowly — give it the budget
        r = prob.solve(tol=1e-10, max_iters=30000, record_objective=True,
                       **mode_kw)
        objs.append(r.objectives[-1])
    assert max(objs) - min(objs) < 1e-5 * max(abs(o) for o in objs)
