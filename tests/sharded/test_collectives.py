"""Communication-pattern regression tests: the compiled row-sharded
solve must contain only the intended collectives — a handful of
all-reduces (one fused psum per gradmap evaluation), and never a gather
of the sharded matrix."""

import re

import jax
import jax.numpy as jnp
import pytest

import problems
from fasta_tpu import FastaOptions, make_solver
from fasta_tpu import sharding as sh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _compiled_text(prob, **solve_kw):
    mesh = sh.make_mesh()
    sp = sh.shard_problem(prob, mesh)
    fn = make_solver(FastaOptions(**solve_kw))
    low = fn.lower(sp.op, sp.fterm, sp.gterm, jnp.asarray(sp.x0), 0.05)
    return low.compile().as_text()


def test_lasso_collective_budget():
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50)
    n_ar = len(re.findall(r" all-reduce\(", txt))
    # one fused psum of (f, g) per gradmap region: init + loop body +
    # backtracking trial body = 3; anything beyond ~5 means scalar math
    # started communicating per-op (regression)
    assert 1 <= n_ar <= 5, f"unexpected all-reduce count {n_ar}"
    # the sharded matrix must never be gathered
    assert len(re.findall(r" all-gather\(", txt)) == 0
    assert "f64[240,96]" not in txt, "matrix not partitioned"


def test_phase_retrieval_collective_budget():
    prob = problems.build("phase_retrieval", m=512, n=16,
                          dtype=jnp.complex128)
    txt = _compiled_text(prob, max_iters=50, accelerate=True,
                         adaptive=False)
    n_ar = len(re.findall(r" all-reduce\(", txt))
    # accel adds one rmatvec psum (gradient at the extrapolated point)
    assert 1 <= n_ar <= 7, f"unexpected all-reduce count {n_ar}"
    assert len(re.findall(r" all-gather\(", txt)) == 0


def test_partitioned_shapes_present():
    """The compiled module must hold per-device shards (m/8 rows), not
    the full matrix."""
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50)
    assert re.search(r"f64\[30,96\]", txt), "matrix not partitioned"
