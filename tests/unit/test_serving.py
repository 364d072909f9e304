"""recommend_path: the PERF.md serving regime map as code (round-4
VERDICT item 9).  Static decisions pin to the measured winners; the
ServingPlan runners are exercised end-to-end in interpret/CPU mode."""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu import FastaOptions, recommend_path


def _lasso(dtype=jnp.float32):
    return problems.build("lasso", m=120, n=240, k=10, dtype=dtype)


def test_single_solve_picks_microsolver():
    plan = recommend_path(_lasso(), 1)
    assert plan.path == "microsolve"
    r = plan.run(tau0=0.05, max_iters=200, tol=1e-6)
    assert r.converged


def test_large_batch_picks_kernel_batch():
    """512² TV at batch 8 — the measured microsolve_batch winner."""
    tv = problems.build("tv", h=64, w=64, dtype=jnp.float32)
    # 64x64 image -> dual field unknowns = 2*64*64 = 8192 < crossover;
    # force the large regime with the measured flagship metadata shape
    big = problems.build("tv", h=256, w=256, dtype=jnp.float32)
    plan = recommend_path(big, 8)
    assert plan.path == "microsolve_batch"
    assert "2.6-3.7x" in plan.reason
    small_plan = recommend_path(tv, 64)
    assert small_plan.path == "batch_solver"
    assert "dispatch-tail" in small_plan.reason


def test_unsupported_structure_falls_back_to_xla():
    dem = problems.build("democratic", m=64, n=128, dtype=jnp.float32)
    plan = recommend_path(dem, 1)
    assert plan.path == "xla"
    assert "no whole-solve kernel" in plan.reason
    planb = recommend_path(dem, 4)
    assert planb.path == "batch_solver"


def test_f64_and_diagnostics_fall_back_to_xla():
    plan = recommend_path(_lasso(jnp.float64), 1)
    assert plan.path == "xla" and "f32" in plan.reason
    plan2 = recommend_path(_lasso(), 1, need_full_diagnostics=True)
    assert plan2.path == "xla" and "diagnostics" in plan2.reason


def test_plan_runners_execute():
    """Each plan's run() drives the real underlying path."""
    prob = _lasso()
    b = jnp.asarray(prob.fterm.b, jnp.float32)
    bs = jnp.stack([b, b * 1.01])

    kplan = recommend_path(prob, 2)
    # lasso n=240 < crossover -> batch_solver; force the kernel batch
    # by checking a big problem separately and run the small one
    assert kplan.path == "batch_solver"
    res = kplan.run(bs, tau0=0.05,
                    options=FastaOptions(max_iters=200, tol=1e-6,
                                         precision="standard"))
    assert res.solution.shape == (2, 240)
    assert bool(np.asarray(res.converged).all())

    xplan = recommend_path(prob, 1, need_full_diagnostics=True)
    r = xplan.run(options=FastaOptions(max_iters=200, tol=1e-6,
                                       precision="standard"), tau0=0.05)
    assert r.converged and r.objectives is None  # default recorder set


def test_solve_serving_method():
    prob = _lasso()
    r = prob.solve_serving(tau0=0.05, max_iters=200, tol=1e-6)
    assert r.converged     # microsolve path (MicroResult)
    b = jnp.asarray(prob.fterm.b, jnp.float32)
    res = prob.solve_serving(jnp.stack([b, b]), tau0=0.05,
                             options=FastaOptions(max_iters=200,
                                                  tol=1e-6,
                                                  precision="standard"))
    assert res.solution.shape == (2, 240)


def test_kernel_batch_runner_executes():
    """The microsolve_batch plan runner on a forced-large problem."""
    big = problems.build("tv", h=256, w=256, dtype=jnp.float32)
    plan = recommend_path(big, 2)
    assert plan.path == "microsolve_batch"
    b = jnp.asarray(big.fterm.b, jnp.float32)
    rb = plan.run(jnp.stack([b, b * 1.01]), max_iters=60, tol=1e-3)
    assert rb.solutions.shape[0] == 2
    with pytest.raises(ValueError, match="bs"):
        plan.run()
