"""Public microsolver dispatch (fasta_tpu.micro) — structure routing,
result contract, and agreement with the XLA solver (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu import MicroResult, microsolve, microsolve_supported


def test_supported_reports_structures():
    lasso = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    tv = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    logistic = problems.build("logistic", m=64, n=32, dtype=jnp.float32)
    svm = problems.build("svm", m=64, n=32, dtype=jnp.float32)
    democratic = problems.build("democratic", m=64, n=128,
                                dtype=jnp.float32)
    assert microsolve_supported(lasso) == (True, "dense")
    assert microsolve_supported(tv) == (True, "tv")
    # round-3: logistic (L1) and SVM (squared hinge + ridge) gained
    # whole-solve kernels
    assert microsolve_supported(logistic) == (True, "dense")
    assert microsolve_supported(svm) == (True, "dense")
    ok, why = microsolve_supported(democratic)
    assert not ok and "LinfNorm" in why


def test_supported_reports_planar():
    pr = problems.build("phase_retrieval", m=128, n=16, planar=True,
                        dtype=jnp.float32)
    assert microsolve_supported(pr) == (True, "planar")


def test_auto_tau0_fallback():
    """microsolve without any tau0 estimates one via the C8 estimator
    (same (2/L)/10 convention as solve())."""
    prob = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    prob.tau0 = None
    r = microsolve(prob, max_iters=400, tol=1e-5)
    assert r.converged


def test_unsupported_raises_with_reason():
    prob = problems.build("democratic", m=64, n=128, dtype=jnp.float32)
    with pytest.raises(ValueError, match="LinfNorm"):
        microsolve(prob, tau0=1.0, max_iters=10)


def test_lasso_dispatch_matches_xla():
    prob = problems.build("lasso", m=200, n=400, k=20, dtype=jnp.float32)
    r = microsolve(prob, tau0=0.05, max_iters=100, tol=1e-6)
    assert isinstance(r, MicroResult)
    prob.tau0 = 0.05
    rx = prob.solve(tol=1e-6, max_iters=100, fuse=False,
                    precision="standard")
    assert r.iteration_count == rx.iteration_count
    assert r.converged == rx.converged
    # early-strict taus; full-trajectory residuals at f32-drift tolerance
    # (conventions of tests/unit/test_microsolver.py)
    np.testing.assert_allclose(r.taus[:10], rx.taus[:10], rtol=1e-5)
    np.testing.assert_allclose(r.residuals, rx.residuals[:r.iteration_count],
                               rtol=1e-2, atol=1e-6)
    np.testing.assert_allclose(r.solution, rx.solution, atol=1e-5)


def test_nnls_dispatch_nonneg_prox():
    prob = problems.build("nnls", m=80, n=40, dtype=jnp.float32)
    r = microsolve(prob, tau0=0.08, max_iters=120, tol=1e-6)
    assert r.converged
    assert np.all(r.solution >= 0.0)
    prob.tau0 = 0.08
    rx = prob.solve(tol=1e-6, max_iters=120, fuse=False,
                    precision="standard")
    np.testing.assert_allclose(r.solution, rx.solution, atol=1e-5)


def _objective(prob, x):
    x = jnp.asarray(x)
    return float(prob.fterm.value(prob.op(x)) + prob.gterm.value(x))


def test_logistic_dispatch_matches_xla():
    """Sparse logistic (Logistic + L1) routes onto the dense kernel with
    loss='logistic': trajectory-prefix parity plus converged-objective
    parity (nonquadratic losses bifurcate at the f32 noise floor near
    the stopping boundary, so iteration counts are not pinned)."""
    prob = problems.build("logistic", m=100, n=50, k=5, dtype=jnp.float32)
    # prefix length: BB stepsizes are ratios of differences, so ulp
    # noise from the kernel's VPU accumulation order amplifies ~10x
    # per 5 iterations; rel drift is <2e-5 through iter 14
    K = 14
    r = microsolve(prob, tau0=0.05, max_iters=K, tol=0.0)
    prob.tau0 = 0.05
    rx = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                    stop_rule="iterations", precision="standard")
    np.testing.assert_allclose(r.taus[:K], rx.taus[:K], rtol=1e-4)
    np.testing.assert_allclose(r.residuals[:K], rx.residuals[:K],
                               rtol=1e-4)
    rc = microsolve(prob, tau0=0.05, max_iters=400, tol=1e-6)
    rxc = prob.solve(tol=1e-6, max_iters=400, fuse=False,
                     precision="standard")
    assert rc.converged and rxc.converged
    fk, fx = _objective(prob, rc.solution), _objective(prob, rxc.solution)
    assert abs(fk - fx) <= 1e-5 * (1.0 + abs(fx))


def test_svm_dispatch_ridge_prox():
    """SVM (SquaredHinge + L2Norm2 ridge) routes onto the dense kernel
    with loss='squared_hinge', prox='ridge' — same parity contract as
    the logistic test (the hinge's active set flips on ulp noise)."""
    prob = problems.build("svm", m=80, n=40, dtype=jnp.float32)
    K = 14
    r = microsolve(prob, tau0=0.05, max_iters=K, tol=0.0)
    prob.tau0 = 0.05
    rx = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                    stop_rule="iterations", precision="standard")
    np.testing.assert_allclose(r.taus[:K], rx.taus[:K], rtol=1e-4)
    np.testing.assert_allclose(r.residuals[:K], rx.residuals[:K],
                               rtol=1e-4)
    rc = microsolve(prob, tau0=0.05, max_iters=400, tol=1e-6)
    rxc = prob.solve(tol=1e-6, max_iters=400, fuse=False,
                     precision="standard")
    assert rc.converged and rxc.converged
    fk, fx = _objective(prob, rc.solution), _objective(prob, rxc.solution)
    assert abs(fk - fx) <= 1e-5 * (1.0 + abs(fx))


def test_logistic_dispatch_hp_and_accel():
    """The new losses compose with the kernel's hp and FISTA modes:
    each converges to the XLA-standard objective (the weakly-regularized
    logistic leaves real SOLUTION slack at tol=1e-5, so x itself is not
    compared across modes)."""
    prob = problems.build("logistic", m=100, n=50, k=5, dtype=jnp.float32)
    prob.tau0 = 0.05
    rxc = prob.solve(tol=1e-6, max_iters=600, fuse=False,
                     precision="standard")
    fx = _objective(prob, rxc.solution)
    r = microsolve(prob, tau0=0.05, max_iters=600, tol=1e-6, hp=True)
    assert r.converged
    assert abs(_objective(prob, r.solution) - fx) <= 1e-5 * (1.0 + abs(fx))
    # FISTA's residual stop legitimately lands ~4e-3 above the
    # adaptive objective on this weakly-determined instance — parity is
    # judged against the XLA ACCELERATED run, not the adaptive one
    rxa = prob.solve(tol=1e-6, max_iters=600, fuse=False,
                     precision="standard", adaptive=False,
                     accelerate=True)
    fa = _objective(prob, rxa.solution)
    r2 = microsolve(prob, tau0=0.05, max_iters=600, tol=1e-6,
                    accelerate=True)
    assert r2.converged
    assert abs(_objective(prob, r2.solution) - fa) <= 1e-4 * (1.0 + abs(fa))


def test_tv_dispatch_hp_and_problem_method():
    prob = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    r = prob.microsolve(tau0=2.0, max_iters=400, tol=1e-4, hp=True)
    assert r.solution.shape == (2, 16, 16)
    prob.tau0 = 2.0
    rx = prob.solve(tol=1e-4, max_iters=400, fuse=False,
                    precision="auto")
    # same convergence regime; early trajectory identical
    kk = min(8, r.iteration_count, rx.iteration_count)
    np.testing.assert_allclose(r.taus[:kk], rx.taus[:kk], rtol=1e-4)


def test_tv_hp_nonpow2_supported():
    """hp dd trees zero-pad non-pow2 dims (exact) — the hp kernel must
    track the XLA hp path on a 24x24 image like it does on pow2."""
    prob = problems.build("tv", h=24, w=24, dtype=jnp.float32)
    K = 10
    r = microsolve(prob, tau0=2.0, max_iters=K, tol=0.0, hp=True)
    assert r.iteration_count == K
    prob.tau0 = 2.0
    rx = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                    stop_rule="iterations", precision="auto")
    np.testing.assert_allclose(r.taus[:K], rx.taus[:K], rtol=1e-4)
    np.testing.assert_allclose(r.residuals[:K], rx.residuals[:K],
                               rtol=1e-4)


def test_accelerate_dispatch():
    tv = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    r = microsolve(tv, tau0=2.0, max_iters=400, tol=1e-4,
                   accelerate=True)
    assert r.converged
    # the dense kernel gained FISTA mode in round 3 (VERDICT item 4)
    lasso = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    r2 = microsolve(lasso, tau0=0.05, max_iters=400, tol=1e-4,
                    accelerate=True)
    assert r2.converged


def test_dense_hp_dispatch():
    """hp=True routes in-kernel dd scalars on the dense kernel too
    (round-3: parity with the TV kernel)."""
    lasso = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    r = microsolve(lasso, tau0=0.05, max_iters=400, tol=1e-5, hp=True)
    assert r.converged


def test_kernel_specific_options_rejected_crosswise():
    tv = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    with pytest.raises(ValueError, match="engine"):
        microsolve(tv, tau0=2.0, max_iters=10, engine="vpu")


def test_batched_mu_reported_unsupported():
    from fasta_tpu import L1Norm
    prob = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    prob.gterm = L1Norm(jnp.asarray([0.05, 0.1]))   # vmap-sweep leaf
    ok, why = microsolve_supported(prob)
    assert not ok and "scalar mu" in why
    with pytest.raises(ValueError, match="scalar mu"):
        microsolve(prob, tau0=0.05, max_iters=10)


def test_restart_dd_reachable_from_dispatcher():
    tv = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    r = microsolve(tv, tau0=2.0, max_iters=400, tol=1e-4,
                   accelerate=True, restart_dd=True)
    assert r.converged


def test_oversized_dense_rejected_cleanly():
    """A dense problem past the kernel's VMEM residency bound raises the
    structured ValueError (round-3 VERDICT missing #3: it used to die
    deep inside the Mosaic compile instead)."""
    import fasta_tpu

    A = jnp.zeros((4000, 2000), jnp.float32)        # 32 MB > 24 MB budget
    prob = fasta_tpu.Problem(
        name="oversized-lasso",
        op=fasta_tpu.DenseOp(A),
        fterm=fasta_tpu.LeastSquares(jnp.zeros(4000, jnp.float32)),
        gterm=fasta_tpu.L1Norm(0.1),
        x0=jnp.zeros(2000, jnp.float32))
    ok, why = microsolve_supported(prob)
    assert not ok and "VMEM-resident" in why and "24 MB" in why
    with pytest.raises(ValueError, match="VMEM-resident"):
        microsolve(prob, tau0=0.05, max_iters=10)


def test_planar_unchunkable_rows_rejected():
    """m > 2048 with no 128-multiple divisor chunk is rejected by the
    gate instead of silently compiling the unchunked (register-spill
    OOM) matvec (round-3 ADVICE)."""
    from fasta_tpu.kernels.microsolver_planar import (
        _row_chunk, supports_planar_microsolver)
    assert _row_chunk(2100) is None
    assert not supports_planar_microsolver(2100, 16)
    assert supports_planar_microsolver(2176, 16)     # 17*128 chunks fine
    pr = problems.build("phase_retrieval", m=2100, n=16, planar=True,
                        dtype=jnp.float32)
    ok, why = microsolve_supported(pr)
    assert not ok and "multiple of 128" in why
    with pytest.raises(ValueError, match="multiple of 128"):
        microsolve(pr, tau0=0.05, max_iters=10)


def test_sweep_rejects_penaltyless_prox():
    """microsolve_sweep on a projection prox (nonneg/box) would return B
    identical solves — rejected per the never-silently-drop contract
    (round-3 ADVICE)."""
    from fasta_tpu import microsolve_sweep
    prob = problems.build("nnls", m=80, n=40, dtype=jnp.float32)
    with pytest.raises(ValueError, match="projection"):
        microsolve_sweep(prob, jnp.asarray([0.05, 0.1]), tau0=0.08,
                         max_iters=10)


# (tau0 is no longer required — microsolve falls back to the C8
# estimator; covered by test_auto_tau0_fallback above.)
