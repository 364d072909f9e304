"""Numeric-quality pins for the shared in-kernel Sum2 dd reduction
(kernels/ddreduce.py) — the fold every microsolver's hp decision
scalars ride.  The Sum2 (Ogita–Rump–Oishi) accumulation replaced the
full-dd_add tree 2026-08-20 (2.5× less tree work); these tests pin the
properties the hp formulas actually consume:

- error ≥10× below the f32 ulp of Σ|p| on random inputs (measured
  0.8–9.2e-10 of Σ|p| across shapes; the f32 ulp the formulas defend
  against is ~6e-8 and the backtracking slack 7.6e-6; the old
  full-dd tree's ~1e-16 was precision nothing consumed)
- EXACT result under total cancellation (the ⟨Δx,Δg⟩ → 0 BB case)
- a single-ulp f-value difference is resolved (the window/backtracking
  sensitivity)
- the fused two-channel dot equals the sum of separate dots

Run through interpret-mode pallas_call — pltpu.roll has no eager CPU
evaluation rule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from fasta_tpu.kernels.ddreduce import dd_dot_rows, dd_dot_rows2


def _dot_dd(u, v):
    """dd_dot_rows inside an interpret-mode kernel → (hi, lo)."""

    def kern(u_ref, v_ref, o_ref):
        d = dd_dot_rows(u_ref[:], v_ref[:])
        o_ref[0, 0] = d.hi
        o_ref[0, 1] = d.lo

    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        interpret=True)(jnp.asarray(u), jnp.asarray(v))
    return float(np.float64(out[0, 0]) + np.float64(out[0, 1]))


@pytest.mark.parametrize("shape", [(512, 512), (1, 2000), (48, 24),
                                   (7, 130)])
def test_dot_matches_f64_on_random(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    u = rng.standard_normal(shape).astype(np.float32)
    v = rng.standard_normal(shape).astype(np.float32)
    got = _dot_dd(u, v)
    exact = float(np.sum(u.astype(np.float64) * v.astype(np.float64)))
    mag = float(np.sum(np.abs(u.astype(np.float64) * v)))
    # ≥10x below the f32 ulp of the magnitude sum (measured headroom
    # is ~6-70x depending on shape; plain f32 lands at ~1e-7-1e-6).
    # NOTE: 6e-9 is an EMPIRICAL pin for these fixed seeds/shapes, not
    # a worst case — the Sum2 carry channel accumulates uncompensated,
    # so the true bound grows with tree depth × eps² × conditioning.
    # Convergence parity (tests/parity/test_f32_hp.py) is the real
    # gate; if this flakes after a shape/data change, re-measure and
    # re-pin rather than treating 6e-9 as a guarantee.
    bound = 6e-9 * mag
    assert abs(got - exact) <= bound, (got, exact, mag, bound)


def test_exact_under_total_cancellation():
    """The BB numerator's catastrophic-cancellation case: +x and -x
    halves must reduce to exactly zero.  Exact-zero holds here because
    v = ones makes every two_prod error term zero, so the whole
    reduction lives in the (exact) two_sum channel; for inexact
    products see test_cancellation_with_inexact_products."""
    rng = np.random.default_rng(7)
    a = (rng.standard_normal((256, 64)) * 1e3).astype(np.float32)
    b = np.concatenate([a, -a], axis=0).astype(np.float32)
    got = _dot_dd(b, np.ones_like(b))
    assert got == 0.0, got


def test_cancellation_with_inexact_products():
    """Fully cancelling dot with INEXACT products: ⟨[u,u],[v,-v]⟩ = 0
    in exact arithmetic, every elementwise product carries a two_prod
    error term that rides the plain-f32 carry channel.  The result is
    O(eps²·Σ|p|), not exact zero — the honest bound for the kernel's
    BB cancellation case with real data (ddreduce.py docstring)."""
    rng = np.random.default_rng(13)
    u = rng.standard_normal((128, 256)).astype(np.float32)
    v = (rng.standard_normal((128, 256)) * 3.7).astype(np.float32)
    uu = np.concatenate([u, u], axis=0)
    vv = np.concatenate([v, -v], axis=0)
    got = _dot_dd(uu, vv)
    mag = float(np.sum(np.abs(uu.astype(np.float64) * vv)))
    # exact sum is identically 0; the residue may round to zero but
    # must sit at the eps²-carry level (eps_f32² ≈ 1.4e-14; measured
    # ~1e-12..1e-10 of Σ|p|), far below plain-f32 (~1e-7·Σ|p|)
    assert abs(got) <= 6e-9 * mag, (got, mag)


def test_single_ulp_difference_resolved():
    """f(x) vs f(x + one ulp in one entry): the dd difference must
    match the f64 difference to ~0.1% — the window comparison's
    sensitivity (plain f32 sums bury this under ~1e-6·f noise)."""
    rng = np.random.default_rng(3)
    r = rng.standard_normal((128, 128)).astype(np.float32)
    r2 = r.copy()
    r2[0, 0] = np.nextafter(r2[0, 0], np.inf, dtype=np.float32)
    f1 = _dot_dd(r, r)
    f2 = _dot_dd(r2, r2)
    exact = float(np.sum(r2.astype(np.float64) ** 2)
                  - np.sum(r.astype(np.float64) ** 2))
    assert exact != 0.0
    assert abs((f2 - f1) - exact) <= 1e-3 * abs(exact), (f2 - f1, exact)


def test_two_channel_fused_dot_matches_separate():
    rng = np.random.default_rng(11)
    u1 = rng.standard_normal((64, 128)).astype(np.float32)
    v1 = rng.standard_normal((64, 128)).astype(np.float32)
    u2 = rng.standard_normal((64, 128)).astype(np.float32)
    v2 = rng.standard_normal((64, 128)).astype(np.float32)

    def kern(a_ref, b_ref, c_ref, d_ref, o_ref):
        d = dd_dot_rows2(a_ref[:], b_ref[:], c_ref[:], d_ref[:])
        o_ref[0, 0] = d.hi
        o_ref[0, 1] = d.lo

    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        interpret=True)(jnp.asarray(u1), jnp.asarray(v1),
                        jnp.asarray(u2), jnp.asarray(v2))
    got = float(np.float64(out[0, 0]) + np.float64(out[0, 1]))
    exact = float(np.sum(u1.astype(np.float64) * v1)
                  + np.sum(u2.astype(np.float64) * v2))
    mag = float(np.sum(np.abs(u1.astype(np.float64) * v1))
                + np.sum(np.abs(u2.astype(np.float64) * v2)))
    assert abs(got - exact) <= 6e-9 * mag
