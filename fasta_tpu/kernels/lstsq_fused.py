"""Fused least-squares gradient pass:  (d, f, g) = (Ax, ½‖Ax−b‖², Aᴴ(Ax−b))
in ONE streaming read of A.

Why this kernel exists (the TPU-first design argument): a FASTA iteration
on a least-squares problem costs two dense GEMV passes in the naive
formulation — ``d = A x`` (forward/objective) and ``g = Aᴴ(d−b)``
(gradient).  Both are HBM-bandwidth-bound: the matrix read dominates, the
vectors are noise.  But the gradient is separable over row blocks,

    g = Aᴴ r = Σ_i A_iᴴ r_i ,   r_i = A_i x − b_i ,

so one pass over row tiles of A can produce the residual, the objective
value AND the full gradient — **half the HBM traffic per iteration**, and
because every backtracking trial needs exactly this triple, trials get
the same 2× discount.  XLA will not perform this fusion (it has no
concept of reusing one A read across two independent GEMVs); it requires
a kernel.

Kernel structure: 1-D grid over row tiles (sequential on a TPU core).
Each step DMAs an (TM × n) tile of A into VMEM (double-buffered by the
Pallas pipeline), computes the tile residual with an MXU matvec, writes
it out, and accumulates the gradient partial ``A_iᴴ r_i`` (MXU, reverse
contraction) and the scalar ½‖r_i‖² into revisited output blocks —
step 0 initializes, later steps accumulate.

Used by ``LeastSquares.fused_gradmap`` (fasta_tpu/terms.py) when the
operator is a real float32 DenseOp on a TPU backend; everywhere else the
mathematically identical two-pass XLA fallback runs.  Complex operators
currently take the fallback path (planar-complex kernel is a follow-up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_lstsq_gradmap", "lstsq_gradmap_reference", "supports_fusion",
]


def _row_tile(m: int, cap: int = 512) -> int:
    """Largest divisor of m that is a multiple of 8 and ≤ cap (f32
    sublane granularity); 0 if none exists."""
    best = 0
    for tm in range(8, cap + 1, 8):
        if m % tm == 0:
            best = tm
    return best


import os

# The Pallas path is opt-in until its on-hardware validation suite has
# passed on the target backend (interpret-mode tests pass; the tunneled
# dev chip shows a numeric divergence under investigation).  The XLA
# fallback is mathematically identical, so correctness never depends on
# this switch.
_PALLAS_ENABLED = os.environ.get("FASTA_TPU_PALLAS", "0") == "1"


def supports_fusion(m: int, n: int, dtype) -> bool:
    """Pallas path preconditions: real f32, TPU backend, tileable rows."""
    return (_PALLAS_ENABLED
            and jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and _row_tile(m) > 0)


def lstsq_gradmap_reference(A, x, b):
    """Two-pass XLA fallback — the exact graph the unfused solver builds,
    so CPU parity runs are bit-identical with fusion enabled."""
    d = A @ x
    r = d - b
    f = 0.5 * jnp.real(jnp.vdot(r, r))
    g = A.conj().T @ r
    return d, f, g


def _kernel(x_ref, b_ref, A_ref, d_ref, f_ref, g_ref):
    i = pl.program_id(0)
    r = (jnp.dot(A_ref[:], x_ref[:], preferred_element_type=jnp.float32)
         - b_ref[:])                                   # (TM, 1)
    d_ref[:] = r + b_ref[:]
    # gradient partial: Aᵀ r without materializing the transpose
    gpart = jax.lax.dot_general(
        A_ref[:], r, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (n, 1)
    fpart = 0.5 * jnp.sum(r * r)

    @pl.when(i == 0)
    def _init():
        g_ref[:] = gpart
        f_ref[0, 0] = fpart

    @pl.when(i > 0)
    def _acc():
        g_ref[:] = g_ref[:] + gpart
        f_ref[0, 0] = f_ref[0, 0] + fpart


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_lstsq_gradmap(A, x, b, interpret: bool = False):
    """One-pass (d, f, g) for f(x) = ½‖Ax−b‖², real f32 dense A.

    Returns (d: (m,), f: scalar, g: (n,)).
    """
    m, n = A.shape
    tm = _row_tile(m)
    if tm == 0:
        raise ValueError(f"m={m} has no tile multiple of 8")
    x2 = x.reshape(n, 1)
    b2 = b.reshape(m, 1)

    grid = (m // tm,)
    d, f, g = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),        # x
            pl.BlockSpec((tm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # b tile
            pl.BlockSpec((tm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # A tile
        ],
        out_specs=[
            pl.BlockSpec((tm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # d tile
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),        # f accumulator
            pl.BlockSpec((n, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),        # g accumulator
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n,                 # two MXU matvecs per tile
            bytes_accessed=m * n * 4 + (2 * m + 2 * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, b2, A)
    return d.reshape(m), f[0, 0], g.reshape(n)
