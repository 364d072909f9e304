"""Mixed-precision fast path: bf16-storage operator + f32 refinement."""

import jax.numpy as jnp
import numpy as np

import fasta_tpu as ft
import problems
from fasta_tpu import checkpoint


def test_lowprec_matvec_accuracy():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((64, 32)).astype(np.float32)
    x = rng.standard_normal(32).astype(np.float32)
    op16 = ft.LowPrecDenseOp.from_dense(A)
    d = np.asarray(op16(jnp.asarray(x)))
    assert d.dtype == np.float32
    ref = A @ x
    rel = np.abs(d - ref).max() / np.abs(ref).max()
    assert rel < 2e-2                        # bf16 storage error
    g = np.asarray(op16.rmatvec(jnp.asarray(rng.standard_normal(64)
                                            .astype(np.float32))))
    assert g.shape == (32,) and g.dtype == np.float32


def test_lowprec_adjoint():
    import jax
    rng = np.random.default_rng(1)
    A = rng.standard_normal((40, 20)).astype(np.float32)
    op16 = ft.LowPrecDenseOp.from_dense(A)
    # the probe vectors are rounded to bf16 inside each op (x in the
    # forward, y in the adjoint), so consistency holds at bf16 level
    ft.check_adjoint(op16, jnp.zeros(20, jnp.float32),
                     jax.random.PRNGKey(0), rtol=5e-2)


def test_refinement_workflow_reaches_f32_quality():
    """bf16 solve (coarse) + f32 warm restart must reach the same
    objective as a from-scratch f32 solve."""
    prob = problems.build("lasso", m=128, n=256, k=12, dtype=jnp.float32)
    prob.tau0 = 0.05

    # full-precision baseline
    r_full = prob.solve(tol=1e-6, max_iters=400, record_objective=True)

    # phase 1: bf16 storage (coarse tolerance — bf16 gradient floor)
    prob16 = prob.with_parts(op=ft.LowPrecDenseOp.from_dense(
        prob.instance["A"]))
    r16 = prob16.solve(tol=1e-3, max_iters=400, record_objective=True)

    # phase 2: f32 warm restart from the bf16 result
    r_ref = checkpoint.resume(prob, r16, tol=1e-6, max_iters=400,
                              record_objective=True)

    assert abs(r_ref.objectives[-1] - r_full.objectives[-1]) < 1e-4 * max(
        abs(r_full.objectives[-1]), 1e-10)
    # refinement needs far fewer f32 iterations than solving from scratch
    assert r_ref.iteration_count < r_full.iteration_count
