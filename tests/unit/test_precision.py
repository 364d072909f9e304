"""Double-word (compensated) arithmetic: fasta_tpu/precision.py.

Every primitive is checked against float64 ground truth: the dd result,
collapsed to float32, must equal the float64 result rounded to float32
within a couple of ulp — i.e. "as if computed in double then rounded"
(the Ogita–Rump–Oishi Dot2 guarantee).  Plain float32 reductions fail
these bounds by orders of magnitude on the adversarial cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fasta_tpu import precision as prec


def _ulps(got32, ref64):
    """Distance in float32 ulps between got32 and the correctly rounded
    float64 reference."""
    ref32 = np.float32(ref64)
    u = np.spacing(np.abs(ref32)) or np.spacing(np.float32(1e-30))
    return abs(float(got32) - float(ref32)) / u


@pytest.mark.parametrize("n", [1, 2, 7, 1000, 100_000])
def test_dot_dd_matches_float64(n):
    rng = np.random.default_rng(n)
    a = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    ref = np.dot(a.astype(np.float64), b.astype(np.float64))
    got = prec.dd_to_float(prec.dot_dd(jnp.asarray(a), jnp.asarray(b)))
    assert _ulps(got, ref) <= 2.0


def test_dot_dd_cancellation():
    """⟨a, a⟩ − ⟨a, a − tiny⟩ resolved far below float32 ulp of the
    operands — the BB-stepsize cancellation pattern near convergence.

    The default ``lax.reduce`` implementation's error is bounded relative
    to Σ|aᵢbᵢ| (the backend picks the combine order); the explicit
    pairwise tree is tight to a few ulp of the cancelled result."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal(100_000).astype(np.float32)
    tiny = (rng.standard_normal(100_000) * 1e-6).astype(np.float32)
    d2 = -(a - tiny)
    a64, d264 = a.astype(np.float64), d2.astype(np.float64)
    ref = np.dot(a64, a64) + np.dot(a64, d264)      # ≈ ⟨a, tiny⟩ ~ 1e-4
    # sanity: the quantity really is ~8 orders below the operand scale
    assert abs(ref) < 1e-3
    operand_scale = float(np.sum(np.abs(a64 * a64)))

    got = prec.dd_to_float(prec.dd_add(
        prec.dot_dd(jnp.asarray(a), jnp.asarray(a)),
        prec.dot_dd(jnp.asarray(a), jnp.asarray(d2))))
    # float64-grade: ~1e-13 of the operand scale (plain f32 errs ~1e-2
    # absolute here, 9 orders worse)
    assert abs(float(got) - ref) <= 1e-12 * operand_scale

    def tree_dot(u, v):
        p, e = prec.two_prod(jnp.asarray(u), jnp.asarray(v))
        return prec._pairwise_dd_sum(p, e)

    got_tree = prec.dd_to_float(prec.dd_add(tree_dot(a, a),
                                            tree_dot(a, d2)))
    assert _ulps(got_tree, ref) <= 4.0


def test_sum_dd_adversarial():
    """Alternating large/small magnitudes that defeat plain float32."""
    rng = np.random.default_rng(1)
    big = rng.standard_normal(4096).astype(np.float32) * 1e6
    x = np.concatenate([big, -big, rng.standard_normal(999).astype(
        np.float32)])
    rng.shuffle(x)
    ref = np.sum(x.astype(np.float64))
    got = prec.dd_to_float(prec.sum_dd(jnp.asarray(x)))
    plain = float(jnp.sum(jnp.asarray(x)))
    assert _ulps(got, ref) <= 4.0
    assert abs(plain - ref) > abs(float(got) - ref)   # dd strictly better


def test_dot_dd_complex():
    rng = np.random.default_rng(2)
    a = (rng.standard_normal(5000)
         + 1j * rng.standard_normal(5000)).astype(np.complex64)
    b = (rng.standard_normal(5000)
         + 1j * rng.standard_normal(5000)).astype(np.complex64)
    # Re⟨a,b⟩ = Σ re(a)re(b) + im(a)im(b) — identical to Re vdot(a, b)
    ref = float(np.real(np.vdot(a.astype(np.complex128),
                                b.astype(np.complex128))))
    got = prec.dd_to_float(prec.dot_dd(jnp.asarray(a), jnp.asarray(b)))
    assert _ulps(got, ref) <= 4.0


def test_norm2_dd_and_scale_div():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(33_333).astype(np.float32)
    ref = np.dot(a.astype(np.float64), a.astype(np.float64))
    nd = prec.norm2_dd(jnp.asarray(a))
    assert _ulps(prec.dd_to_float(nd), ref) <= 2.0
    # scale by 0.5 (exact) and divide by an awkward scalar
    assert _ulps(prec.dd_to_float(prec.dd_scale(nd, 0.5)), 0.5 * ref) <= 2.0
    c = 3.141592
    assert _ulps(prec.dd_to_float(prec.dd_div_float(nd, c)), ref / c) <= 2.0


def test_dd_div():
    rng = np.random.default_rng(4)
    a = rng.standard_normal(10_000).astype(np.float32)
    b = (a + rng.standard_normal(10_000).astype(np.float32) * 1e-5)
    num = prec.norm2_dd(jnp.asarray(a))
    den = prec.dot_dd(jnp.asarray(a), jnp.asarray(b))
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    ref = np.dot(a64, a64) / np.dot(a64, b64)
    got = prec.dd_to_float(prec.dd_div(num, den))
    assert _ulps(got, ref) <= 4.0


def test_dd_max_lexicographic():
    """Equal hi components must be broken by lo — the nonmonotone-window
    tie case near convergence."""
    hi = jnp.asarray(np.float32([1.0, 1.0, 0.5, -np.inf]))
    lo = jnp.asarray(np.float32([-3e-8, 2e-8, 0.0, 0.0]))
    m = prec.dd_max(prec.DD(hi, lo))
    assert float(m.hi) == 1.0 and float(m.lo) == pytest.approx(2e-8)


def test_bf16_promotion():
    rng = np.random.default_rng(5)
    a32 = rng.standard_normal(2048).astype(np.float32)
    a16 = jnp.asarray(a32, jnp.bfloat16)
    ref = np.sum(np.asarray(a16, np.float64))
    got = prec.dd_to_float(prec.sum_dd(a16))
    assert got.dtype == jnp.float32
    assert _ulps(got, ref) <= 2.0


def test_two_prod_exact():
    """The Dekker transform must be error-free: p + err == a·b exactly
    (checked in float64, which holds f32×f32 products exactly)."""
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal(10_000).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(10_000).astype(np.float32))
    p, e = prec.two_prod(a, b)
    exact = (np.asarray(a, np.float64) * np.asarray(b, np.float64))
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_two_sum_exact():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal(10_000).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(10_000) * 1e-4).astype(np.float32))
    s, e = prec.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)


def test_reduce_dd_many_matches_separate():
    """The fused variadic multi-reduce must reproduce the separate
    compensated reductions exactly (same combiner, zero-padding is a dd
    identity) for streams of different lengths."""
    rng = np.random.default_rng(8)
    a = jnp.asarray(rng.standard_normal(2000).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(2000).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    streams = [
        (0.5 * p for p in prec.dot_parts(r, r)),      # f = ½‖r‖², len m
        prec.dot_parts(a, b),                         # len n
        prec.dot_parts(a, a),                         # len n
    ]
    streams = [tuple(s) for s in streams]
    fused = prec.reduce_dd_many(streams)
    seps = [prec._reduce_dd_sum(*s) for s in streams]
    for got, want in zip(fused, seps):
        assert float(got.hi) == float(want.hi)
        assert float(got.lo) == float(want.lo)


def test_dot_parts_sum_is_dot_dd():
    """dd-summing dot_parts equals dot_dd, real and complex."""
    rng = np.random.default_rng(9)
    a = rng.standard_normal(513).astype(np.float32)
    b = rng.standard_normal(513).astype(np.float32)
    got = prec._reduce_dd_sum(*prec.dot_parts(a, b))
    want = prec.dot_dd(jnp.asarray(a), jnp.asarray(b))
    assert float(got.hi) == float(want.hi)
    zc = (rng.standard_normal(257) + 1j * rng.standard_normal(257)
          ).astype(np.complex64)
    wc = (rng.standard_normal(257) + 1j * rng.standard_normal(257)
          ).astype(np.complex64)
    ref = np.real(np.vdot(np.asarray(zc, np.complex128),
                          np.asarray(wc, np.complex128)))
    got = prec.dd_to_float(
        prec._reduce_dd_sum(*prec.dot_parts(jnp.asarray(zc),
                                            jnp.asarray(wc))))
    assert _ulps(got, ref) <= 2.0


def test_blocked2_accuracy():
    """The hybrid lane-blocked impl keeps the Dot2 error bound on a
    heavily cancelled dot (plain f32 fails this by ~1e5 ulps)."""
    rng = np.random.default_rng(10)
    a64 = rng.standard_normal(2000)
    b64 = rng.standard_normal(2000)
    a = a64.astype(np.float32)
    b = (b64 - a64 * (a64 @ b64) / (a64 @ a64)).astype(np.float32)
    ref = np.dot(a.astype(np.float64), b.astype(np.float64))
    p, e = prec.two_prod(jnp.asarray(a), jnp.asarray(b))
    got = prec.dd_to_float(prec._blocked2_dd_sum(p, e))
    assert _ulps(got, ref) <= 4.0


def test_multiaxis_dd_matches_float64():
    """Multi-axis inputs pre-collapse their trailing axis (one dd
    reduction per row, device-local under sharding) — the value must
    stay at dd accuracy vs a float64 reference, and 1-D inputs must be
    BIT-identical to the pre-change single-reduction path."""
    rng = np.random.default_rng(11)
    a3 = jnp.asarray(rng.standard_normal((2, 48, 96)) * 1e3, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((2, 48, 96)), jnp.float32)
    ref = float(np.vdot(np.asarray(a3, np.float64),
                        np.asarray(b3, np.float64)))
    got = prec.dd_to_float(prec.dot_dd(a3, b3))
    assert abs(got - ref) / abs(ref) < 1e-6

    s_ref = float(np.asarray(a3, np.float64).sum())
    s_got = prec.dd_to_float(prec.sum_dd(a3))
    assert abs(s_got - s_ref) / abs(s_ref) < 1e-6

    # 1-D path unchanged: dot_parts on the raveled input is the
    # original elementwise transform (no collapse)
    p, e = prec.dot_parts(jnp.ravel(a3), jnp.ravel(b3))
    assert p.shape == (2 * 48 * 96,)
    p2, e2 = prec.dot_parts(a3, b3)
    assert p2.shape == (2 * 48,)      # collapsed to per-row partials
    v1 = prec.dd_to_float(prec._dd_sum_flat(p, e))
    v2 = prec.dd_to_float(prec._dd_sum_flat(p2, e2))
    assert abs(v1 - ref) / abs(ref) < 1e-6
    assert abs(v2 - ref) / abs(ref) < 1e-6


@pytest.mark.parametrize("impl", ["reduce", "tree", "blocked", "blocked2",
                                  "f64"])
def test_dd_impl_variants_agree(impl, monkeypatch):
    """Every FASTA_TPU_DD_IMPL selection must hit the same dd accuracy
    band on an adversarial cancellation stream (different association
    orders — values agree to a couple of f32 ulps, not bitwise)."""
    monkeypatch.setenv("FASTA_TPU_DD_IMPL", impl)
    rng = np.random.default_rng(13)
    a = jnp.asarray(rng.standard_normal(4096) * 1e4, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    ref = float(np.vdot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    got = prec.dd_to_float(prec.dot_dd(a, b))
    assert _ulps(np.float32(got), ref) <= 4.0, (impl, got, ref)
