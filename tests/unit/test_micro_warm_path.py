"""Warm-started in-kernel regularization path (round-4 VERDICT item 8):
microsolve_sweep(warm_start=True) runs solve_path's continuation recipe
inside one kernel launch — interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu import microsolve, microsolve_sweep

MUS = jnp.asarray([0.3, 0.1, 0.03], jnp.float32)     # strongest first


def _lasso():
    return problems.build("lasso", m=120, n=240, k=10, dtype=jnp.float32)


def test_warm_path_first_point_bitmatches_cold():
    """Point 0 has no predecessor — it must bit-match a cold solve."""
    prob = _lasso()
    sw = microsolve_sweep(prob, MUS, tau0=0.05, max_iters=400, tol=1e-7,
                          stop_rule="residual", warm_start=True)
    from fasta_tpu import L1Norm
    p0 = _lasso()
    p0.gterm = L1Norm(jnp.asarray(0.3, jnp.float32))
    r0 = microsolve(p0, tau0=0.05, max_iters=400, tol=1e-7,
                    stop_rule="residual")
    assert sw.iteration_counts[0] == r0.iteration_count
    np.testing.assert_array_equal(np.asarray(sw.solutions[0]),
                                  np.asarray(r0.solution))
    np.testing.assert_array_equal(sw.taus[0], r0.taus)


def test_warm_path_fewer_total_iterations_than_cold():
    """The continuation win solve_path demonstrates (289 vs 388 under
    stop_rule='residual', solver.py note) now exists in-kernel."""
    prob = _lasso()
    warm = microsolve_sweep(prob, MUS, tau0=0.05, max_iters=400,
                            tol=1e-7, stop_rule="residual",
                            warm_start=True)
    cold = microsolve_sweep(prob, MUS, tau0=0.05, max_iters=400,
                            tol=1e-7, stop_rule="residual")
    assert warm.converged.all() and cold.converged.all()
    assert warm.iteration_counts.sum() < cold.iteration_counts.sum()


def test_warm_path_matches_solve_path_objectives():
    """Warm in-kernel path and the XLA solve_path continuation reach
    the same objective at every path point."""
    from fasta_tpu import FastaOptions, L1Norm
    from fasta_tpu.solver import solve_path

    prob = _lasso()
    warm = microsolve_sweep(prob, MUS, tau0=0.05, max_iters=400,
                            tol=1e-7, stop_rule="residual",
                            warm_start=True)
    pr = solve_path(prob.op, prob.fterm, L1Norm(MUS),
                    jnp.asarray(prob.x0, jnp.float32),
                    jnp.asarray(0.05, jnp.float32),
                    FastaOptions(max_iters=400, tol=1e-7,
                                 stop_rule="residual",
                                 precision="standard"))
    for i in range(3):
        mu = float(MUS[i])

        def obj(x):
            return float(prob.fterm.value(prob.op(jnp.asarray(x)))
                         + mu * jnp.sum(jnp.abs(jnp.asarray(x))))

        fw, fp = obj(warm.solutions[i]), obj(pr.solution[i])
        assert abs(fw - fp) <= 1e-4 * (1.0 + abs(fp)), (i, fw, fp)


def test_warm_path_modes_and_fvals():
    """warm_start composes with hp / FISTA / record_fvals."""
    prob = _lasso()
    sw = microsolve_sweep(prob, MUS, tau0=0.05, max_iters=400, tol=1e-6,
                          stop_rule="residual", warm_start=True,
                          hp=True, record_fvals=True)
    assert sw.converged.all()
    assert sw.fvals is not None and len(sw.fvals) == 3
    swa = microsolve_sweep(prob, MUS, tau0=0.05, max_iters=400,
                           tol=1e-6, stop_rule="residual",
                           warm_start=True, accelerate=True)
    assert swa.converged.all()


TV_MUS = jnp.asarray([0.2, 0.1, 0.05], jnp.float32)   # strongest first


def test_tv_warm_path_first_point_bitmatches_cold():
    """TV analog of the dense contract: point 0 has no predecessor, so
    it must bit-match a cold microsolve at the same (tau0, mu)."""
    from fasta_tpu.operators import ScaledOp

    tv = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    sw = microsolve_sweep(tv, TV_MUS, tau0=2.0, max_iters=400, tol=1e-5,
                          stop_rule="residual", warm_start=True)
    p0 = tv.with_parts(op=ScaledOp(float(TV_MUS[0]), tv.op.op))
    r0 = microsolve(p0, tau0=2.0, max_iters=400, tol=1e-5,
                    stop_rule="residual")
    assert sw.iteration_counts[0] == r0.iteration_count
    np.testing.assert_array_equal(np.asarray(sw.solutions[0]),
                                  np.asarray(r0.solution))
    np.testing.assert_array_equal(sw.taus[0], r0.taus)


def test_tv_warm_path_matches_cold_objectives():
    """Warm and cold TV paths reach the same dual objective at every
    strength; the warm path converges everywhere."""
    from fasta_tpu.operators import ScaledOp

    tv = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    warm = microsolve_sweep(tv, TV_MUS, tau0=2.0, max_iters=600,
                            tol=1e-5, stop_rule="residual",
                            warm_start=True)
    cold = microsolve_sweep(tv, TV_MUS, tau0=2.0, max_iters=600,
                            tol=1e-5, stop_rule="residual")
    assert warm.converged.all() and cold.converged.all()
    b = np.asarray(tv.fterm.b)

    def dual_obj(p, mu):
        pv, ph = np.asarray(p[0]), np.asarray(p[1])
        q = pv * (np.arange(16)[:, None] < 15)
        s = ph * (np.arange(16)[None, :] < 15)
        div = (np.roll(q, 1, 0) - q) + (np.roll(s, 1, 1) - s)
        return 0.5 * np.sum((mu * div - b) ** 2)

    for i, mu in enumerate(np.asarray(TV_MUS)):
        fw = dual_obj(warm.solutions[i], mu)
        fc = dual_obj(cold.solutions[i], mu)
        assert abs(fw - fc) <= 1e-3 * (1.0 + abs(fc)), (i, fw, fc)


def test_tv_warm_path_modes():
    """TV warm_start composes with FISTA and record_fvals."""
    tv = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    sw = microsolve_sweep(tv, TV_MUS, tau0=2.0, max_iters=600, tol=1e-5,
                          stop_rule="residual", warm_start=True,
                          accelerate=True, record_fvals=True)
    assert sw.converged.all()
    assert sw.fvals is not None and len(sw.fvals) == 3
    with pytest.raises(ValueError, match="engine"):
        microsolve_sweep(tv, TV_MUS, tau0=2.0, max_iters=10,
                         warm_start=True, engine="vpu")
