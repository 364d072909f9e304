"""Every built-in smooth term decomposes its value for the fused hp
reduce (round-2 VERDICT missing #4): ``value_parts`` must be non-None
and its dd-sum must equal ``value_dd``, or the solver silently pays 3
dd dispatches per backtracking trial instead of 1 (the fallback
CLAUDE.md warns about)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fasta_tpu import operators as ops
from fasta_tpu import precision as prec
from fasta_tpu import terms
from fasta_tpu.options import FastaOptions
from fasta_tpu import solver as solver_mod

RNG = np.random.default_rng(42)


def _f32(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


def _term_and_d(name):
    m = 257                       # non-pow2, exercises padding paths
    if name == "least_squares":
        return terms.LeastSquares(_f32(m)), _f32(m)
    if name == "logistic":
        b = jnp.asarray((RNG.random(m) > 0.5).astype(np.float32))
        return terms.Logistic(b), _f32(m)
    if name == "masked_logistic":
        Y = jnp.asarray((RNG.random((24, 17)) > 0.5).astype(np.float32))
        mask = jnp.asarray((RNG.random((24, 17)) > 0.4).astype(np.float32))
        return terms.MaskedLogistic(Y, mask), _f32(24, 17)
    if name == "phase_hinge":
        return terms.PhaseHinge(jnp.abs(_f32(m)) + 0.1), _f32(m)
    if name == "planar_phase_hinge":
        return (terms.PlanarPhaseHinge(jnp.abs(_f32(m)) + 0.1),
                _f32(m, 2))
    if name == "squared_hinge":
        y = jnp.asarray(np.sign(RNG.standard_normal(m)).astype(np.float32))
        return terms.SquaredHinge(y), _f32(m)
    if name == "nmf":
        Y = jnp.abs(_f32(12, 9))
        return terms.NMFLoss(Y), jnp.abs(_f32(12 + 9, 4))
    raise AssertionError(name)


ALL_TERMS = ["least_squares", "logistic", "masked_logistic", "phase_hinge",
             "planar_phase_hinge", "squared_hinge", "nmf"]


@pytest.mark.parametrize("name", ALL_TERMS)
def test_value_parts_sums_to_value_dd(name):
    term, d = _term_and_d(name)
    parts = term.value_parts(d)
    assert parts is not None, f"{name} does not decompose its value"
    hi, lo = parts
    assert hi.ndim == 1 and lo.ndim == 1
    got = prec._reduce_dd_sum(jnp.asarray(hi), jnp.asarray(lo))
    want = term.value_dd(d)
    g = float(got.hi) + float(got.lo)
    w = float(want.hi) + float(want.lo)
    assert g == pytest.approx(w, rel=1e-12, abs=1e-30)
    # and both agree with the plain value at f32 grade
    assert g == pytest.approx(float(term.value(d)), rel=1e-5)


def test_phase_hinge_value_parts_complex():
    """PhaseHinge runs on complex measurements; its residual is real, so
    the parts stream must stay real and match value_dd."""
    m = 130
    b = jnp.abs(_f32(m)) + 0.1
    term = terms.PhaseHinge(b)
    d = (_f32(m) + 1j * _f32(m)).astype(jnp.complex64)
    hi, lo = term.value_parts(d)
    assert not jnp.issubdtype(hi.dtype, jnp.complexfloating)
    got = prec._reduce_dd_sum(hi, lo)
    want = term.value_dd(d)
    assert float(got.hi) + float(got.lo) == pytest.approx(
        float(want.hi) + float(want.lo), rel=1e-12)


def test_hp_fuse_engages_in_lowered_hlo():
    """With value_parts available the hp solver fuses its per-trial dd
    scalars into ONE variadic reduce; a term without value_parts pays
    separate dd reductions — visible as extra reduce ops in the lowered
    module (round-2 VERDICT item 5 'done' criterion)."""

    @jax.tree_util.register_pytree_node_class
    class NoParts(terms.SquaredHinge):
        def value_parts(self, d):
            return None

    m, n = 64, 48
    A = _f32(m, n)
    y = jnp.asarray(np.sign(RNG.standard_normal(m)).astype(np.float32))
    op = ops.DenseOp(A)
    gterm = terms.L1Norm(0.1)
    x0 = jnp.zeros((n,), jnp.float32)
    opts = FastaOptions(max_iters=5, stop_rule="iterations",
                        precision="high")
    fn = jax.jit(solver_mod._make_solve_fn(opts))

    def n_reduce(fterm):
        txt = fn.lower(op, fterm, gterm, x0,
                       jnp.asarray(0.1, jnp.float32)).as_text()
        return txt.count("stablehlo.reduce")

    fused = n_reduce(terms.SquaredHinge(y))
    unfused = n_reduce(NoParts(y))
    assert fused < unfused, (fused, unfused)
