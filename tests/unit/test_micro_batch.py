"""Batched whole-solve kernels (microsolve_batch): one vmapped launch
must be BIT-identical to B separate microsolve calls — interpret mode.

Pallas lowers the vmap to a leading grid axis; each grid step runs the
full in-kernel solve with its own stopping decision, so per-instance
trajectories cannot interact by construction.  These tests pin that.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu import microsolve, microsolve_batch


def _stack_perturbed(b, B):
    return jnp.stack([jnp.asarray(b, jnp.float32) * (1.0 + 0.02 * i)
                      for i in range(B)])


@pytest.mark.parametrize("mode", [dict(), dict(hp=True),
                                  dict(accelerate=True)])
def test_dense_batch_bit_identical(mode):
    prob = problems.build("lasso", m=120, n=240, k=10, dtype=jnp.float32)
    B = 3
    bs = _stack_perturbed(prob.fterm.b, B)
    rb = microsolve_batch(prob, bs, tau0=0.05, max_iters=200, tol=1e-6,
                          **mode)
    assert rb.solutions.shape == (B, 240)
    for i in range(B):
        pi = prob.with_parts(fterm=type(prob.fterm)(bs[i]))
        ri = microsolve(pi, tau0=0.05, max_iters=200, tol=1e-6, **mode)
        assert rb.iteration_counts[i] == ri.iteration_count
        assert rb.converged[i] == ri.converged
        np.testing.assert_array_equal(np.asarray(rb.solutions[i]),
                                      np.asarray(ri.solution))
        np.testing.assert_array_equal(rb.residuals[i], ri.residuals)
        np.testing.assert_array_equal(rb.taus[i], ri.taus)


def test_dense_batch_custom_starts_and_losses():
    """x0s batching + the logistic loss branch under vmap."""
    prob = problems.build("logistic", m=100, n=50, k=5,
                          dtype=jnp.float32)
    B = 2
    bs = jnp.stack([jnp.asarray(prob.fterm.b, jnp.float32)] * B)
    x0s = jnp.stack([jnp.asarray(prob.x0, jnp.float32) * (1.0 + 0.1 * i)
                     for i in range(B)])
    rb = microsolve_batch(prob, bs, x0s=x0s, tau0=0.05, max_iters=300,
                          tol=1e-5)
    for i in range(B):
        pi = prob.with_parts(x0=x0s[i])
        ri = microsolve(pi, tau0=0.05, max_iters=300, tol=1e-5)
        assert rb.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(np.asarray(rb.solutions[i]),
                                      np.asarray(ri.solution))


def test_tv_batch_bit_identical():
    prob = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    B = 2
    bs = _stack_perturbed(prob.fterm.b, B)
    rb = microsolve_batch(prob, bs, tau0=2.0, max_iters=200, tol=1e-4)
    assert rb.solutions.shape == (B, 2, 16, 16)
    for i in range(B):
        pi = prob.with_parts(fterm=type(prob.fterm)(bs[i]))
        ri = microsolve(pi, tau0=2.0, max_iters=200, tol=1e-4)
        assert rb.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(np.asarray(rb.solutions[i]),
                                      np.asarray(ri.solution))


def test_planar_batch_bit_identical():
    prob = problems.build("phase_retrieval", m=128, n=16, planar=True,
                          dtype=jnp.float32)
    B = 2
    bs = _stack_perturbed(prob.fterm.b, B)
    rb = microsolve_batch(prob, bs, tau0=1.0, max_iters=150, tol=1e-4)
    for i in range(B):
        pi = prob.with_parts(fterm=type(prob.fterm)(bs[i]))
        ri = microsolve(pi, tau0=1.0, max_iters=150, tol=1e-4)
        assert rb.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(np.asarray(rb.solutions[i]),
                                      np.asarray(ri.solution))


def test_batch_shape_validation():
    prob = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    with pytest.raises(ValueError, match="leading batch axis"):
        microsolve_batch(prob, jnp.asarray(prob.fterm.b), tau0=0.05)
    bs = _stack_perturbed(prob.fterm.b, 2)
    bad_x0 = jnp.zeros((3, 128), jnp.float32)
    with pytest.raises(ValueError, match="x0s shape"):
        microsolve_batch(prob, bs, x0s=bad_x0, tau0=0.05)


def test_dense_sweep_bit_identical():
    """microsolve_sweep solves the regularization path in one launch —
    mu is a runtime SMEM scalar, vmapped to a grid axis; each path
    point must bit-match a per-mu microsolve."""
    from fasta_tpu import L1Norm

    prob = problems.build("lasso", m=120, n=240, k=10, dtype=jnp.float32)
    mus = jnp.asarray([0.02, 0.05, 0.2], jnp.float32)
    rs = prob.microsolve_sweep(mus, tau0=0.05, max_iters=200, tol=1e-6)
    assert rs.solutions.shape == (3, 240)
    for i, mu in enumerate(np.asarray(mus)):
        pi = prob.with_parts(gterm=L1Norm(float(mu)))
        ri = microsolve(pi, tau0=0.05, max_iters=200, tol=1e-6)
        assert rs.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(np.asarray(rs.solutions[i]),
                                      np.asarray(ri.solution))
    # stronger mu => sparser solution (sanity of the path semantics)
    nnz = [int(np.sum(np.abs(np.asarray(rs.solutions[i])) > 1e-7))
           for i in range(3)]
    assert nnz[0] >= nnz[1] >= nnz[2]


def test_tv_sweep_bit_identical():
    from fasta_tpu.operators import ScaledOp

    prob = problems.build("tv", h=16, w=16, dtype=jnp.float32)
    mus = jnp.asarray([0.05, 0.1], jnp.float32)
    rs = prob.microsolve_sweep(mus, tau0=2.0, max_iters=200, tol=1e-4)
    for i, mu in enumerate(np.asarray(mus)):
        pi = prob.with_parts(op=ScaledOp(float(mu), prob.op.op))
        ri = microsolve(pi, tau0=2.0, max_iters=200, tol=1e-4)
        assert rs.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(np.asarray(rs.solutions[i]),
                                      np.asarray(ri.solution))


def test_sweep_planar_and_shape_validation():
    pr = problems.build("phase_retrieval", m=128, n=16, planar=True,
                        dtype=jnp.float32)
    with pytest.raises(ValueError, match="no penalty weight"):
        pr.microsolve_sweep(jnp.asarray([0.1, 0.2]), tau0=1.0)
    prob = problems.build("lasso", m=64, n=128, k=6, dtype=jnp.float32)
    with pytest.raises(ValueError, match="1-D vector"):
        prob.microsolve_sweep(jnp.zeros((2, 2)), tau0=0.05)


def test_sweep_agrees_with_solve_path():
    """Cross-API consistency: the cold-start kernel sweep and the
    warm-started XLA continuation (solve_path) reach the same objective
    at every path point."""
    from fasta_tpu import FastaOptions, L1Norm
    from fasta_tpu.solver import solve_path

    prob = problems.build("lasso", m=120, n=240, k=10, dtype=jnp.float32)
    mus = jnp.asarray([0.3, 0.1, 0.03], jnp.float32)   # strongest first
    rs = prob.microsolve_sweep(mus, tau0=0.05, max_iters=400, tol=1e-7)
    pr = solve_path(prob.op, prob.fterm, L1Norm(mus),
                    jnp.asarray(prob.x0, jnp.float32),
                    jnp.asarray(0.05, jnp.float32),
                    FastaOptions(max_iters=400, tol=1e-7,
                                 stop_rule="residual",
                                 precision="standard"))
    for i in range(3):
        x_sweep = jnp.asarray(rs.solutions[i])
        x_path = jnp.asarray(pr.solution[i])
        mu = float(mus[i])
        def obj(x):
            return float(prob.fterm.value(prob.op(x))
                         + mu * jnp.sum(jnp.abs(x)))
        fs, fp = obj(x_sweep), obj(x_path)
        assert abs(fs - fp) <= 1e-4 * (1.0 + abs(fp)), (i, fs, fp)


def test_batch_unsupported_structure_raises():
    prob = problems.build("democratic", m=64, n=128, dtype=jnp.float32)
    with pytest.raises(ValueError, match="LinfNorm"):
        microsolve_batch(prob, jnp.zeros((2, 64)), tau0=0.05)


def test_batch_per_instance_tau0_bit_identical():
    """Heterogeneous tau0 batches: a (B,) tau0 vector rides the
    per-instance SMEM scalars (round-4 VERDICT item 7) and each
    instance bit-matches its own separately-launched solve."""
    prob = problems.build("lasso", m=120, n=240, k=10, dtype=jnp.float32)
    B = 3
    bs = _stack_perturbed(prob.fterm.b, B)
    t0s = jnp.asarray([0.02, 0.05, 0.09], jnp.float32)
    rb = microsolve_batch(prob, bs, tau0=t0s, max_iters=200, tol=1e-6)
    for i in range(B):
        pi = prob.with_parts(fterm=type(prob.fterm)(bs[i]))
        ri = microsolve(pi, tau0=float(t0s[i]), max_iters=200, tol=1e-6)
        assert rb.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(np.asarray(rb.solutions[i]),
                                      np.asarray(ri.solution))
        np.testing.assert_array_equal(rb.taus[i], ri.taus)
    with pytest.raises(ValueError, match="per-instance tau0"):
        microsolve_batch(prob, bs, tau0=jnp.asarray([0.05, 0.05]),
                         max_iters=10)


def test_batch_per_instance_tau0_planar():
    """The planar kernel's SMEM scalar is (1,1) so a vmapped
    per-instance tau0 lowers under Mosaic's block rule."""
    pr = problems.build("phase_retrieval", m=128, n=16, planar=True,
                        dtype=jnp.float32)
    B = 2
    bs = _stack_perturbed(pr.fterm.b, B)
    t0s = jnp.asarray([0.01, 0.03], jnp.float32)
    rb = microsolve_batch(pr, bs, tau0=t0s, max_iters=200, tol=1e-4)
    for i in range(B):
        pi = pr.with_parts(fterm=type(pr.fterm)(bs[i]))
        ri = microsolve(pi, tau0=float(t0s[i]), max_iters=200, tol=1e-4)
        assert rb.iteration_counts[i] == ri.iteration_count
        np.testing.assert_array_equal(rb.taus[i], ri.taus)
