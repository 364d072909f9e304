"""Planar PhaseMax whole-solve microsolver vs the XLA solver —
interpret mode.  The flagship 16384x256 planar config is VMEM-resident
(33.5 MB), so it gets the same speed-of-light treatment as the dense
and TV problems (round 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu.kernels.microsolver_planar import microsolve_planar_phasemax


def _inst(m=256, n=32):
    prob = problems.build("phase_retrieval", m=m, n=n, planar=True,
                          dtype=jnp.float32)
    return prob, (jnp.asarray(prob.op.Ar), jnp.asarray(prob.op.Ai),
                  jnp.asarray(prob.fterm.b), jnp.asarray(prob.gterm.c),
                  jnp.asarray(prob.x0))


def test_planar_microsolver_prefix_matches_xla():
    prob, (Ar, Ai, b, c, x0) = _inst()
    K = 12
    x, taus, res, k, conv = microsolve_planar_phasemax(
        Ar, Ai, b, c, x0, 1.0, max_iters=K, tol=0.0, interpret=True)
    prob.tau0 = 1.0
    r = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                   stop_rule="iterations", precision="standard")
    # the planar kernel's channel-matmul accumulation order differs
    # from XLA's; the hinge amplifies the ulp noise a little faster
    # than least squares, so the 12-iteration band is wider than the
    # dense kernel's (measured ~3e-3 for the VPU sublane-reduce
    # association vs XLA's GEMV).
    rt = 1e-2
    np.testing.assert_allclose(np.asarray(taus[:K]), r.taus[:K], rtol=rt)
    np.testing.assert_allclose(np.asarray(res[:K]), r.residuals[:K],
                               rtol=rt)
    assert int(k) == K


def test_planar_microsolver_hp_converges_like_xla_hp():
    prob, (Ar, Ai, b, c, x0) = _inst()
    x, taus, res, k, conv = microsolve_planar_phasemax(
        Ar, Ai, b, c, x0, 1.0, max_iters=500, tol=1e-5, interpret=True,
        hp=True)
    assert bool(conv)
    prob.tau0 = 1.0
    r = prob.solve(tol=1e-5, max_iters=500, fuse=False, precision="auto")
    assert r.converged
    assert int(k) <= 2 * r.iteration_count
    np.testing.assert_allclose(np.asarray(x), r.solution, atol=1e-4)


def test_planar_microsolver_accel_matches_xla_accel():
    """FISTA-mode planar kernel vs the XLA accelerated hp path: same
    convergence regime (iteration counts within the knife-edge band —
    the final stopping ratio sits within f32 ulp of the threshold) and
    matching solutions; early trajectory identical."""
    prob, (Ar, Ai, b, c, x0) = _inst()
    x, taus, res, k, conv = microsolve_planar_phasemax(
        Ar, Ai, b, c, x0, 1.0, max_iters=500, tol=1e-5, interpret=True,
        hp=True, accelerate=True, restart_dd=True)
    prob.tau0 = 1.0
    r = prob.solve(tol=1e-5, max_iters=500, fuse=False, precision="auto",
                   adaptive=False, accelerate=True)
    assert bool(conv) and r.converged
    assert abs(int(k) - r.iteration_count) <= 2
    np.testing.assert_allclose(np.asarray(x), r.solution, atol=1e-3)
    kk = 20
    np.testing.assert_allclose(np.asarray(res[:kk]), r.residuals[:kk],
                               rtol=5e-4)


def test_planar_microsolver_dispatch():
    """Problem.microsolve routes planar PhaseMax problems to the kernel
    and solves to a good recovery."""
    prob, _ = _inst(m=512, n=32)
    r = prob.microsolve(tau0=1.0, max_iters=500, tol=1e-5, hp=True)
    assert r.converged
    err = prob.recovery_error(np.asarray(r.solution), recovered=False)
    assert err < 0.05, err


def test_planar_microsolver_chunked_matvec_prefix():
    """m > 2048 engages the row-chunked in-kernel matvec (the fix for
    the 16384x256 VMEM spill OOM, 2026-08-19): the tiled
    forward/adjoint must reproduce the single-chunk trajectory."""
    prob, (Ar, Ai, b, c, x0) = _inst(m=4096, n=16)
    K = 6
    x, taus, res, k, conv = microsolve_planar_phasemax(
        Ar, Ai, b, c, x0, 1.0, max_iters=K, tol=0.0, interpret=True)
    prob.tau0 = 1.0
    r = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                   stop_rule="iterations", precision="standard")
    rt = 1e-2
    np.testing.assert_allclose(np.asarray(taus[:K]), r.taus[:K], rtol=rt)
    assert int(k) == K


def test_planar_microsolver_rejects_mxu_engine():
    """VPU-only since the rowt rewrite: the MXU A/B variant measured
    1.44x slower (round 3) and exceeds scoped VMEM at the flagship
    size under transposed storage (AOT OOM, live 2026-08-20)."""
    _prob, (Ar, Ai, b, c, x0) = _inst()
    with pytest.raises(ValueError, match="VPU-only"):
        microsolve_planar_phasemax(Ar, Ai, b, c, x0, 1.0, max_iters=4,
                                   interpret=True, engine="mxu")
