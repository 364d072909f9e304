"""Exact mid-run resume (round-2 VERDICT missing #6): 50 iterations →
serialize the full SolverState → resume → the trajectory (τ_k, residuals,
f-values, diagnostics cursor) and the solution equal the uninterrupted
100-iteration run BIT-FOR-BIT, in all three solver modes."""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from fasta_tpu import (FastaOptions, checkpoint, make_stateful_solver,
                       resume_state)

MODES = {
    "plain": dict(adaptive=False, accelerate=False),
    "adaptive": dict(adaptive=True, accelerate=False),
    "accelerated": dict(accelerate=True),
}


def _args(dtype=jnp.float64):
    prob = problems.build("lasso", m=48, n=80, k=6, dtype=dtype)
    return (prob.op, prob.fterm, prob.gterm,
            jnp.asarray(prob.x0, dtype),
            jnp.asarray(0.05, jnp.zeros((), dtype).real.dtype))


def _assert_bitwise(r_resumed, r_full):
    np.testing.assert_array_equal(np.asarray(r_resumed.solution),
                                  np.asarray(r_full.solution))
    np.testing.assert_array_equal(np.asarray(r_resumed.taus),
                                  np.asarray(r_full.taus))
    np.testing.assert_array_equal(np.asarray(r_resumed.residuals),
                                  np.asarray(r_full.residuals))
    np.testing.assert_array_equal(np.asarray(r_resumed.fvals),
                                  np.asarray(r_full.fvals))
    np.testing.assert_array_equal(np.asarray(r_resumed.backtracks),
                                  np.asarray(r_full.backtracks))
    assert int(r_resumed.iteration_count) == int(r_full.iteration_count)
    assert int(r_resumed.total_backtracks) == int(r_full.total_backtracks)


@pytest.mark.parametrize("mode", sorted(MODES))
def test_resume_bitwise_equals_uninterrupted(mode, tmp_path):
    kw = MODES[mode]
    args = _args()
    opts50 = FastaOptions(max_iters=50, stop_rule="iterations", **kw)
    opts100 = FastaOptions(max_iters=100, stop_rule="iterations", **kw)

    _, s50 = make_stateful_solver(opts50)(*args)
    assert int(s50.k) == 50

    # serialize through the npz checkpoint (proves the carry is a plain
    # saveable pytree) and resume from the LOADED copy
    p = str(tmp_path / f"state_{mode}.npz")
    checkpoint.save_pytree(s50, p)
    s_loaded = checkpoint.load_pytree(s50, p)

    r_resumed, s100 = resume_state(args[0], args[1], args[2],
                                   s_loaded, opts100)
    r_full, _ = make_stateful_solver(opts100)(*args)
    _assert_bitwise(r_resumed, r_full)
    assert int(s100.k) == 100


def test_resume_bitwise_f32_hp(tmp_path):
    """The hp (double-word) carry — DD window, dd decision scalars —
    must survive the save/resume roundtrip bit-for-bit too."""
    args = _args(jnp.float32)
    opts40 = FastaOptions(max_iters=40, stop_rule="iterations")
    opts80 = FastaOptions(max_iters=80, stop_rule="iterations")
    _, s40 = make_stateful_solver(opts40)(*args)
    p = str(tmp_path / "hp.npz")
    checkpoint.save_pytree(s40, p)
    s_loaded = checkpoint.load_pytree(s40, p)
    r_resumed, _ = resume_state(args[0], args[1], args[2], s_loaded, opts80)
    r_full, _ = make_stateful_solver(opts80)(*args)
    _assert_bitwise(r_resumed, r_full)


def test_resume_converged_state_is_noop():
    args = _args()
    opts = FastaOptions(max_iters=500, tol=1e-10)
    r1, s1 = make_stateful_solver(opts)(*args)
    assert bool(r1.converged)
    r2, s2 = resume_state(args[0], args[1], args[2], s1, opts)
    assert int(r2.iteration_count) == int(r1.iteration_count)
    np.testing.assert_array_equal(np.asarray(r2.solution),
                                  np.asarray(r1.solution))


def test_resume_rejects_short_budget_and_mismatched_recording():
    args = _args()
    opts50 = FastaOptions(max_iters=50, stop_rule="iterations")
    _, s50 = make_stateful_solver(opts50)(*args)
    with pytest.raises(ValueError, match="TOTAL budget"):
        resume_state(args[0], args[1], args[2], s50,
                     FastaOptions(max_iters=20, stop_rule="iterations"))
    with pytest.raises(ValueError, match="record_objective"):
        resume_state(args[0], args[1], args[2], s50,
                     FastaOptions(max_iters=100, stop_rule="iterations",
                                  record_objective=True))


def test_resume_bitwise_sharded():
    """Exact resume composes with the row-sharded mesh: the saved carry
    keeps its shardings (device arrays) and the continuation replays
    the uninterrupted sharded run bit-for-bit."""
    import jax

    from fasta_tpu import sharding as sh
    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs 8 virtual devices")
    prob = problems.build("lasso", m=64, n=48, k=6, dtype=jnp.float64)
    mesh = sh.make_mesh()
    sp = sh.shard_problem(prob, mesh)
    args = (sp.op, sp.fterm, sp.gterm, jnp.asarray(sp.x0),
            jnp.asarray(0.05, jnp.float64))
    opts30 = FastaOptions(max_iters=30, stop_rule="iterations")
    opts60 = FastaOptions(max_iters=60, stop_rule="iterations")
    _, s30 = make_stateful_solver(opts30)(*args)
    r_resumed, _ = resume_state(sp.op, sp.fterm, sp.gterm, s30, opts60)
    r_full, _ = make_stateful_solver(opts60)(*args)
    _assert_bitwise(r_resumed, r_full)


def test_resume_bitwise_lean_mode(tmp_path):
    """Exact resume composes with lean mode: a diagnostics-free carry
    roundtrips and continues bit-identically."""
    args = _args()
    o30 = FastaOptions(max_iters=30, stop_rule="iterations",
                       record_diagnostics=False)
    o60 = FastaOptions(max_iters=60, stop_rule="iterations",
                       record_diagnostics=False)
    _, s30 = make_stateful_solver(o30)(*args)
    p = str(tmp_path / "lean.npz")
    checkpoint.save_pytree(s30, p)
    s = checkpoint.load_pytree(s30, p)
    r2, _ = resume_state(args[0], args[1], args[2], s, o60)
    rf, _ = make_stateful_solver(o60)(*args)
    np.testing.assert_array_equal(np.asarray(r2.solution),
                                  np.asarray(rf.solution))
    assert r2.taus is None


def test_resume_continues_recorded_diagnostics():
    """Diagnostics written before the checkpoint must still be in the
    resumed result (the cursor continues; earlier slots intact)."""
    args = _args()
    opts30 = FastaOptions(max_iters=30, stop_rule="iterations",
                          record_objective=True)
    opts60 = FastaOptions(max_iters=60, stop_rule="iterations",
                          record_objective=True)
    r30, s30 = make_stateful_solver(opts30)(*args)
    r60, _ = resume_state(args[0], args[1], args[2], s30, opts60)
    np.testing.assert_array_equal(np.asarray(r60.objectives)[:30],
                                  np.asarray(r30.objectives))
    assert np.all(np.asarray(r60.objectives)[30:] != 0.0)
