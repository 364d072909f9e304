"""Transform composition over the mesh: the vmapped μ-sweep
(make_batch_solver) and the warm-started continuation path (solve_path)
both run unchanged over a row-sharded problem — vmap/scan compose with
the shard_map operator and must reproduce the unsharded results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fasta_tpu as ft
from fasta_tpu import sharding as sh
import problems

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _setup():
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    mesh = sh.make_mesh()
    sp = sh.shard_problem(prob, mesh)
    mus = jnp.asarray([0.3, 0.1, 0.03]) * float(np.asarray(prob.gterm.mu))
    opts = ft.FastaOptions(max_iters=400, tol=1e-9)
    return prob, sp, mus, opts


def test_vmapped_sweep_over_mesh():
    prob, sp, mus, opts = _setup()
    batch = ft.make_batch_solver(
        opts, in_axes=(None, None, ft.L1Norm(0), None, None))
    out = batch(sp.op, sp.fterm, ft.L1Norm(mus), jnp.asarray(sp.x0), 0.05)
    out0 = batch(prob.op, prob.fterm, ft.L1Norm(mus),
                 jnp.asarray(prob.x0), 0.05)
    assert bool(np.all(np.asarray(out.converged)))
    np.testing.assert_array_equal(np.asarray(out.iteration_count),
                                  np.asarray(out0.iteration_count))
    np.testing.assert_allclose(np.asarray(out.solution),
                               np.asarray(out0.solution), atol=1e-8)


def test_solve_path_over_mesh():
    prob, sp, mus, opts = _setup()
    res = ft.solve_path(sp.op, sp.fterm, ft.L1Norm(mus),
                        jnp.asarray(sp.x0), 0.05, opts)
    res0 = ft.solve_path(prob.op, prob.fterm, ft.L1Norm(mus),
                         jnp.asarray(prob.x0), 0.05, opts)
    assert bool(np.all(np.asarray(res.converged)))
    np.testing.assert_allclose(np.asarray(res.solution),
                               np.asarray(res0.solution), atol=1e-8)
