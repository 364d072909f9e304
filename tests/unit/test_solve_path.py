"""solve_path: warm-started regularization path (continuation) — one
jitted lax.scan over the penalty leaves, each solve starting from the
previous solution and stepsize."""

import jax.numpy as jnp
import numpy as np

import problems
from fasta_tpu import FastaOptions, make_solver, solve_path
from fasta_tpu.terms import L1Norm


def _prob():
    p = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    return p, jnp.asarray([0.3, 0.1, 0.03, 0.01]) * float(
        np.asarray(p.gterm.mu))


def test_path_matches_cold_solves():
    prob, mus = _prob()
    opts = FastaOptions(max_iters=400, tol=1e-9)
    res = solve_path(prob.op, prob.fterm, L1Norm(mus),
                     jnp.asarray(prob.x0), 0.05, opts)
    assert res.solution.shape == (4,) + jnp.asarray(prob.x0).shape
    assert bool(np.all(np.asarray(res.converged)))

    solve = make_solver(opts)
    for i, mu in enumerate(np.asarray(mus)):
        r = solve(prob.op, prob.fterm, L1Norm(jnp.asarray(mu)),
                  jnp.asarray(prob.x0), 0.05)
        # same minimizer per μ regardless of the start point (strongly
        # determined LASSO instances); tolerance is the stopping tol
        np.testing.assert_allclose(np.asarray(res.solution[i]),
                                   np.asarray(r.solution), atol=1e-7)


def test_path_warm_start_helps_plain_mode():
    """Plain FBS (no BB adaptivity) converges slowly from a cold start —
    warm continuation must cut the total iteration count.  Uses the
    ABSOLUTE residual rule: the default hybrid (ratio) rule normalizes
    by the max residual seen, which a warm start makes small — the
    relative criterion then gets stricter and can eat the warm-start
    advantage (documented in solve_path)."""
    prob, mus = _prob()
    opts = FastaOptions(max_iters=3000, tol=1e-6, adaptive=False,
                        backtrack=False, stop_rule="residual")
    tau0 = 0.4            # ≈ 1/L for the normalized instance (L ≈ 2.6)
    res = solve_path(prob.op, prob.fterm, L1Norm(mus),
                     jnp.asarray(prob.x0), tau0, opts)
    assert bool(np.all(np.asarray(res.converged)))
    warm_total = int(np.asarray(res.iteration_count).sum())

    solve = make_solver(opts)
    cold_total = sum(
        int(solve(prob.op, prob.fterm, L1Norm(jnp.asarray(mu)),
                  jnp.asarray(prob.x0), tau0).iteration_count)
        for mu in np.asarray(mus))
    assert warm_total < cold_total, (warm_total, cold_total)


def test_path_stacks_diagnostics():
    prob, mus = _prob()
    opts = FastaOptions(max_iters=50, tol=1e-9)
    res = solve_path(prob.op, prob.fterm, L1Norm(mus),
                     jnp.asarray(prob.x0), 0.05, opts)
    assert res.taus.shape == (4, 50)
    assert res.residuals.shape == (4, 50)
    assert res.iteration_count.shape == (4,)
