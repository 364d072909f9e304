"""In-kernel double-word (compensated) reductions for Pallas TPU kernels.

The whole-solve microsolvers need oracle-grade decision scalars INSIDE a
kernel, where ``lax.reduce`` with a custom combiner is unavailable and a
per-reduce dispatch would defeat the point of fusing the loop.  This
module provides the shared reduction: fully vectorized VPU folds —
sublane halving tree → lane-chunk folds to ≤128 lanes → log₂ butterfly
all-reduce via circular rolls — over ``(hi, lo)`` part arrays.  Non-pow2
dims are zero-padded up front; zeros are EXACT in two_sum/two_prod
chains, so the dd value is unchanged.

Used by ``microsolver_tv.py`` (2-D dual fields) and ``microsolver.py``
((1, L) row vectors — the sublane stage is a no-op there).  The fold
association order is fixed by the shapes, so trajectories are
deterministic per executable (same contract as precision._dd_sum_flat).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .. import precision as prec

__all__ = ["dd_reduce", "dd_dot_rows"]


def dd_reduce(phi, plo) -> prec.DD:
    """Compensated sum of an (h, w) double-word part array to a scalar
    DD, entirely with vectorized VPU ops (no reduce dispatch)."""
    hh = phi.shape[0]
    hp2 = 1 << (hh - 1).bit_length()
    if hp2 != hh:
        z = jnp.zeros((hp2 - hh, phi.shape[1]), jnp.float32)
        phi = jnp.concatenate([phi, z], axis=0)
        plo = jnp.concatenate([plo, z], axis=0)
        hh = hp2
    while hh > 1:
        half = hh // 2
        s = prec.dd_add(prec.DD(phi[:half], plo[:half]),
                        prec.DD(phi[half:], plo[half:]))
        phi, plo = s.hi, s.lo
        hh = half
    ww = phi.shape[1]
    wp2 = 1 << (ww - 1).bit_length()
    if wp2 != ww:
        z = jnp.zeros((phi.shape[0], wp2 - ww), jnp.float32)
        phi = jnp.concatenate([phi, z], axis=1)
        plo = jnp.concatenate([plo, z], axis=1)
        ww = wp2
    while ww > 128:
        half = ww // 2
        s = prec.dd_add(prec.DD(phi[:, :half], plo[:, :half]),
                        prec.DD(phi[:, half:], plo[:, half:]))
        phi, plo = s.hi, s.lo
        ww = half
    off = ww // 2
    while off >= 1:
        s = prec.dd_add(
            prec.DD(phi, plo),
            prec.DD(pltpu.roll(phi, off, 1), pltpu.roll(plo, off, 1)))
        phi, plo = s.hi, s.lo
        off //= 2
    return prec.DD(phi[0, 0], plo[0, 0])


def dd_dot_rows(u, v) -> prec.DD:
    """Re⟨u, v⟩ of two same-shape 2-D arrays in dd (Dot2 in-kernel)."""
    p, e = prec.two_prod(u, v)
    return dd_reduce(p, e)
