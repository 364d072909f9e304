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


def _compiled_text(prob, two_d=False, **solve_kw):
    if two_d:
        mesh = sh.make_mesh_2d(2, 4)
        sp = sh.shard_problem_2d(prob, mesh)
    else:
        mesh = sh.make_mesh()
        sp = sh.shard_problem(prob, mesh)
    fn = make_solver(FastaOptions(**solve_kw))
    low = fn.lower(sp.op, sp.fterm, sp.gterm, jnp.asarray(sp.x0), 0.05)
    return low.compile().as_text()


def _collectives(txt):
    return (len(re.findall(r" all-reduce\(", txt)),
            len(re.findall(r" all-gather\(", txt)))


def _permutes(txt):
    return len(re.findall(r" collective-permute\(", txt))


def test_lasso_collective_budget():
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50)
    n_ar, n_ag = _collectives(txt)
    # EXACTLY one fused psum of (f, g) per gradmap region: init + loop
    # body + backtracking trial body = 3 (measured; CLAUDE.md pin).
    # Any growth means scalar math started communicating per-op.
    assert n_ar == 3, f"unexpected all-reduce count {n_ar}"
    # the sharded matrix must never be gathered
    assert n_ag == 0
    assert "f64[240,96]" not in txt, "matrix not partitioned"


def test_lasso_accelerated_budget():
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50, adaptive=False,
                         accelerate=True)
    n_ar, n_ag = _collectives(txt)
    # measured: 3 gradmap psums + 1 (restart-path reduction)
    assert n_ar == 4, f"unexpected all-reduce count {n_ar}"
    assert n_ag == 0


def test_sparse_collective_budget():
    prob = problems.build("sparse_lasso", m=320, n=160, density=0.05,
                          k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50)
    n_ar, n_ag = _collectives(txt)
    # sparse has no fused gradmap: rmatvec psums + scalar psums = 4
    # (measured)
    assert n_ar == 4, f"unexpected all-reduce count {n_ar}"
    assert n_ag == 0


def test_cdp_collective_budget():
    prob = problems.build("phase_retrieval_cdp", n=64, K=8,
                          dtype=jnp.complex128)
    txt = _compiled_text(prob, max_iters=50, accelerate=True,
                         adaptive=False)
    n_ar, n_ag = _collectives(txt)
    assert n_ar == 6, f"unexpected all-reduce count {n_ar}"   # measured
    assert n_ag == 0


def test_2d_mesh_collective_budget():
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, two_d=True, max_iters=50)
    n_ar, n_ag = _collectives(txt)
    # 2 per fused gradmap region (col-axis psum for d, row-axis fused
    # psum for (f,g)) x 3 regions + 2 col-axis scalar psums = 8
    # (measured)
    assert n_ar == 8, f"unexpected all-reduce count {n_ar}"
    assert n_ag == 0


def test_2d_mesh_planar_collective_budget():
    """Planar-complex wide-problem layout (GridShardedPlanarDenseOp):
    identical budget to the real 2-D mesh — the channel pair doubles
    local FLOPs, never communication.  2 per fused hinge-gradmap region
    (col-axis psum for d, fused row-axis psum for (f,g)) x 3 regions +
    2 col-axis scalar psums = 8 (measured); accel adds the restart
    reduction (9).  Neither channel matrix may ever be gathered."""
    prob = problems.build("phase_retrieval", m=64, n=64, planar=True,
                          dtype=jnp.float64)
    txt = _compiled_text(prob, two_d=True, max_iters=50)
    n_ar, n_ag = _collectives(txt)
    assert n_ar == 8, f"unexpected all-reduce count {n_ar}"
    assert n_ag == 0
    assert "f64[64,64]" not in txt, "channel matrix not partitioned"

    txt = _compiled_text(prob, two_d=True, max_iters=50,
                         adaptive=False, accelerate=True)
    n_ar, n_ag = _collectives(txt)
    assert n_ar == 9, f"unexpected all-reduce count {n_ar}"   # measured
    assert n_ag == 0


def test_2d_mesh_sparse_collective_budget():
    """Sparse wide-problem layout (GridShardedSparseOp): identical
    budget to the dense 2-D mesh — 2 per fused gradmap region (col-axis
    psum for d, fused row-axis psum for (f,g)) x 3 regions + 2 col-axis
    scalar psums = 8 (measured); the grid-blocked BCOO carriers must
    never be gathered."""
    prob = problems.build("sparse_lasso", m=320, n=160, density=0.05,
                          k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, two_d=True, max_iters=50)
    n_ar, n_ag = _collectives(txt)
    assert n_ar == 8, f"unexpected all-reduce count {n_ar}"
    assert n_ag == 0
    assert "f64[320,160]" not in txt, "matrix not partitioned"


def test_phase_retrieval_collective_budget():
    prob = problems.build("phase_retrieval", m=512, n=16,
                          dtype=jnp.complex128)
    txt = _compiled_text(prob, max_iters=50, accelerate=True,
                         adaptive=False)
    n_ar, n_ag = _collectives(txt)
    # accel adds rmatvec psums (gradient at the extrapolated point);
    # measured: 6
    assert n_ar == 6, f"unexpected all-reduce count {n_ar}"
    assert n_ag == 0


def test_tv_halo_collective_budget():
    """Sharded-dual TV: 2 halo ppermutes per gradmap region × 3 regions;
    one fused f-psum per region + 2 decision-scalar psums over the
    sharded dual (measured).  Nothing may gather the dual field —
    solver dots are shape-preserving reductions, not vdot/ravel."""
    prob = problems.build("tv", h=64, w=64, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50)
    n_ar, n_ag = _collectives(txt)
    assert n_ar == 5, f"unexpected all-reduce count {n_ar}"
    assert n_ag == 0
    assert _permutes(txt) == 6
    # dual field partitioned: (2, 64/8, 64) per-device blocks present
    assert re.search(r"f64\[2,8,64\]", txt), "dual field not partitioned"


def test_tv_halo_accel_collective_budget():
    prob = problems.build("tv", h=64, w=64, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50, adaptive=False,
                         accelerate=True)
    n_ar, n_ag = _collectives(txt)
    assert n_ar == 6, f"unexpected all-reduce count {n_ar}"   # measured
    assert n_ag == 0
    assert _permutes(txt) == 6


def test_tv_halo_f32_hp_never_gathers_dual():
    """DEFAULT dtype (f32 → hp double-word decision scalars): the dd
    reductions must never all-gather the sharded dual field.  GSPMD
    cannot partition a custom-combiner reduce, so precision.py
    pre-collapses the trailing axis device-locally — only per-row
    partials (a few bytes per shard) are gathered."""
    prob = problems.build("tv", h=64, w=64, dtype=jnp.float32)
    mesh = sh.make_mesh()
    sp = sh.shard_problem(prob, mesh)
    fn = make_solver(FastaOptions(max_iters=50))
    txt = fn.lower(sp.op, sp.fterm, sp.gterm, jnp.asarray(sp.x0),
                   jnp.asarray(2.0, jnp.float32)).compile().as_text()
    # the only gathered results are tiny per-shard partial rows — the
    # (2, 64, 64) dual field itself must never appear in a gather
    for ln in txt.splitlines():
        if " all-gather(" in ln:
            m = re.search(r"= (f32\[[0-9,]*\])", ln)
            assert m and m.group(1) in ("f32[8]", "f32[16]", "f32[64]",
                                        "f32[2,64]"), ln.strip()[:120]


def test_partitioned_shapes_present():
    """The compiled module must hold per-device shards (m/8 rows), not
    the full matrix."""
    prob = problems.build("lasso", m=240, n=96, k=10, dtype=jnp.float64)
    txt = _compiled_text(prob, max_iters=50)
    assert re.search(r"f64\[30,96\]", txt), "matrix not partitioned"
