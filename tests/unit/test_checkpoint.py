"""Checkpoint/resume: pytree save/load roundtrip and warm restart."""

import jax.numpy as jnp
import numpy as np

import problems
from fasta_tpu import checkpoint as ckpt


def test_pytree_roundtrip(tmp_path):
    prob = problems.build("lasso", m=64, n=96, k=8, dtype=jnp.float64)
    prob.tau0 = 0.05
    r = prob.solve(tol=1e-8, max_iters=30)
    path = str(tmp_path / "result.npz")
    ckpt.save_pytree(r.__dict__, path)
    loaded = ckpt.load_pytree(r.__dict__, path)
    np.testing.assert_allclose(loaded["solution"], r.solution)
    np.testing.assert_allclose(loaded["taus"], r.taus)


def test_resume_continues_progress():
    prob = problems.build("lasso", m=64, n=96, k=8, dtype=jnp.float64)
    prob.tau0 = 0.05
    r1 = prob.solve(tol=1e-12, max_iters=10, record_objective=True)
    r2 = ckpt.resume(prob, r1, tol=1e-12, max_iters=10,
                     record_objective=True)
    # warm restart must not regress the objective
    assert r2.objectives[-1] <= r1.objectives[-1] + 1e-9
    # and it starts from the prior solution
    assert r2.initial_tau == float(r1.taus[-1])


def test_complex_pytree_roundtrip(tmp_path):
    prob = problems.build("phase_retrieval", m=128, n=8,
                          dtype=jnp.complex128)
    prob.tau0 = 1.0
    r = prob.solve(tol=1e-6, max_iters=10)
    path = str(tmp_path / "c.npz")
    ckpt.save_pytree({"x": r.solution}, path)
    loaded = ckpt.load_pytree({"x": r.solution}, path)
    np.testing.assert_allclose(loaded["x"], r.solution)


def test_load_legacy_positional_format(tmp_path):
    """Round-1 checkpoints used positional leaf_{i} keys; the loader
    falls back to flatten-order assignment for them (ADVICE r2)."""
    src = {"a": np.arange(3.0), "b": np.ones((2, 2))}
    flat, _ = __import__("jax").tree_util.tree_flatten(src)
    p = str(tmp_path / "legacy.npz")
    np.savez(p, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
    out = ckpt.load_pytree({"a": np.zeros(3), "b": np.zeros((2, 2))}, p)
    np.testing.assert_array_equal(out["a"], src["a"])
    np.testing.assert_array_equal(out["b"], src["b"])


def test_load_rejects_mismatched_structure(tmp_path):
    """A checkpoint keyed by tree paths must refuse to load into a
    different structure with the same leaf count (ADVICE r1: the old
    index-keyed loader silently mis-assigned arrays)."""
    import pytest
    from fasta_tpu.checkpoint import load_pytree, save_pytree

    src = {"a": np.arange(3.0), "b": np.ones((2, 2))}
    p = str(tmp_path / "ck.npz")
    save_pytree(src, p)
    # same number of leaves, different paths -> must raise
    with pytest.raises(ValueError, match="does not match"):
        load_pytree({"a": np.arange(3.0), "c": np.ones((2, 2))}, p)
    # matching structure loads, path-keyed
    out = load_pytree({"a": np.zeros(3), "b": np.zeros((2, 2))}, p)
    np.testing.assert_array_equal(out["a"], src["a"])
    np.testing.assert_array_equal(out["b"], src["b"])
