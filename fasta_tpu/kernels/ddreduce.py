"""In-kernel double-word (compensated) reductions for Pallas TPU kernels.

The whole-solve microsolvers need oracle-grade decision scalars INSIDE a
kernel, where ``lax.reduce`` with a custom combiner is unavailable and a
per-reduce dispatch would defeat the point of fusing the loop.  This
module provides the shared reduction: fully vectorized VPU folds —
sublane halving tree → lane-chunk folds to ≤128 lanes → log₂ butterfly
all-reduce via circular rolls — over ``(hi, lo)`` part arrays.  Non-pow2
dims are zero-padded up front; zeros are EXACT in two_sum/two_prod
chains, so the dd value is unchanged.

Accumulation is Sum2-style (Ogita–Rump–Oishi ``TwoSum`` cascade): the
carry is an UNNORMALIZED ``(s, c)`` pair — per tree level
``s, e = two_sum(sa, sb); c = ca + cb + e`` — normalized to a DD once at
the end.  That is 8 elementwise ops per level-element against the ~20 of
the previous full-``dd_add`` tree, for a measured error of 0.8–9.2e-10
of Σ|p| across shapes (interpret-mode vs f64; the old full-dd tree
measured ~1e-16) — still ~60–4000× below every
consumer: the f32 ulp is 6e-8, the backtracking sufficient-decrease
slack is 64·eps_f32 ≈ 7.6e-6 relative, and the f32-stored ITERATES
already carry eps-level noise into every product.  Under total
cancellation the SUM channel is exact (each two_sum is exact), so a
fully cancelling ±x sum returns exactly zero when the element pairs
are exact (e.g. lo parts all zero, the ⟨Δx,Δg⟩→0 BB case with equal
magnitudes); with inexact products the carry channel is plain-f32
summation, so the result is O(eps²·Σ|p|), not exact zero.
Convergence parity is the real gate and held everywhere: identical
1,330-iteration TV 512² FISTA trajectory on chip pre/post switch,
iteration-count equality vs the XLA hp (full-dd) path in the interpret
suite, taus rtol 1e-4 on chip.  Measured on chip (2026-08-20): the
switch cut the TV hp iteration 28.0 → 20.6 µs at 512×512 (the dd trees
were 2/3 of every hp iteration; FISTA to-tol 32.8 → 26.5 ms at the
SAME 1,330-iteration trajectory) and the dense hp rate 206.6k → 226.2k
it/s, with taus matching the XLA hp path rtol 1e-4 on chip.  Numeric
pins (error vs f64, total-cancellation exactness, single-ulp f
resolution): tests/unit/test_ddreduce.py.

Used by ``microsolver_tv.py`` (2-D dual fields), ``microsolver.py``
((1, L) row vectors — the sublane stage is a no-op there) and
``microsolver_planar.py``.  The fold association order is fixed by the
shapes, so trajectories are deterministic per executable (same contract
as precision._dd_sum_flat).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .. import precision as prec

__all__ = ["dd_reduce", "dd_dot_rows", "dd_dot_rows2"]


def _sum2_combine(sa, ca, sb, cb):
    """One Sum2 tree level: exact two_sum of the sums, plain carry."""
    s, e = prec.two_sum(sa, sb)
    return s, ca + cb + e


def _sum2_tree(s, c) -> prec.DD:
    """Fold an (h, w) unnormalized (s, c) pair array to a scalar DD."""
    hh = s.shape[0]
    hp2 = 1 << (hh - 1).bit_length()
    if hp2 != hh:
        z = jnp.zeros((hp2 - hh, s.shape[1]), jnp.float32)
        s = jnp.concatenate([s, z], axis=0)
        c = jnp.concatenate([c, z], axis=0)
        hh = hp2
    while hh > 1:
        half = hh // 2
        s, c = _sum2_combine(s[:half], c[:half], s[half:], c[half:])
        hh = half
    ww = s.shape[1]
    wp2 = 1 << (ww - 1).bit_length()
    if wp2 != ww:
        z = jnp.zeros((s.shape[0], wp2 - ww), jnp.float32)
        s = jnp.concatenate([s, z], axis=1)
        c = jnp.concatenate([c, z], axis=1)
        ww = wp2
    while ww > 128:
        half = ww // 2
        s, c = _sum2_combine(s[:, :half], c[:, :half],
                             s[:, half:], c[:, half:])
        ww = half
    off = ww // 2
    while off >= 1:
        s, c = _sum2_combine(s, c, pltpu.roll(s, off, 1),
                             pltpu.roll(c, off, 1))
        off //= 2
    # normalize the final pair once (two_sum: no |s|>=|c| precondition)
    hi, lo = prec.two_sum(s[0, 0], c[0, 0])
    return prec.DD(hi, lo)


def dd_reduce(phi, plo) -> prec.DD:
    """Compensated sum of an (h, w) double-word part array to a scalar
    DD, entirely with vectorized VPU ops (no reduce dispatch)."""
    return _sum2_tree(phi, plo)


def dd_dot_rows(u, v) -> prec.DD:
    """Re⟨u, v⟩ of two same-shape 2-D arrays in dd (Dot2 in-kernel)."""
    p, e = prec.two_prod(u, v)
    return _sum2_tree(p, e)


def dd_dot_rows2(u1, v1, u2, v2) -> prec.DD:
    """Re⟨u1,v1⟩ + Re⟨u2,v2⟩ in one fused tree (two-channel dot).

    The channel pair is combined as the tree's level 0 — one Sum2 fold
    instead of two full trees plus a dd_add, halving the per-dot tree
    latency for the TV and planar kernels' 2-channel decision dots.
    """
    p1, e1 = prec.two_prod(u1, v1)
    p2, e2 = prec.two_prod(u2, v2)
    s, c = _sum2_combine(p1, e1, p2, e2)
    return _sum2_tree(s, c)
