"""Fused PLANAR-complex gradient pass:  (d, f, g) in ONE streaming read
of (Ar, Ai).

The flagship phase-retrieval layout (SURVEY.md §3.4) stores complex A as
two real channel matrices (operators.PlanarDenseOp).  At streaming sizes
the two-pass XLA formulation reads BOTH channel matrices twice per
gradient evaluation (forward d = Ax, adjoint g = Aᴴ∇f(d)) — 4·m·n·4
bytes of HBM traffic.  This kernel is the planar analog of
``lstsq_fused``: a 1-D grid over row tiles DMAs one (TM × n) tile of Ar
AND Ai per step (the "two real channel tiles per grid step" structure),
forms the planar product

    dr = Ar xr − Ai xi ,   di = Ar xi + Ai xr ,

applies an elementwise planar loss  (ℓ, ∂ℓ/∂dr, ∂ℓ/∂di), and accumulates
the conjugate-adjoint gradient partials

    gr += Arᵀ ℓr + Aiᵀ ℓi ,   gi += Arᵀ ℓi − Aiᵀ ℓr

in VMEM scratch — both channel matrices read ONCE: half the traffic,
hence up to 2× at the HBM roofline.  All math is exact f32 on the VPU
(broadcast-multiply + reductions — GEMV leaves 127/128 MXU lanes idle).

Supported losses (both exact under the kernel's zero-row padding — a
zero row with zero data contributes 0 to ℓ and to g):

* planar least squares  ½‖d − b‖²  (b planar (m,2))  — used by
  ``LeastSquares.fused_gradmap`` on planar operators;
* the PhaseMax hinge  ½ Σ max(|d|−b, 0)²  (b real (m,) magnitudes) —
  used by ``PlanarPhaseHinge.fused_gradmap`` (terms.py §3.4 wiring).

Dispatch: auto-on in the HBM-streaming regime via
``supports_planar_fusion`` (both channel matrices count toward the
64 MB VMEM-residency threshold shared with lstsq_fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstsq_fused import _STREAMING_BYTES, _pad128, _row_tile, pallas_mode

__all__ = [
    "supports_planar_fusion", "fused_planar_lstsq_gradmap",
    "fused_planar_hinge_gradmap", "planar_lstsq_gradmap_reference",
    "planar_hinge_gradmap_reference",
]


def supports_planar_fusion(m: int, n: int, dtype) -> bool:
    """Same policy as ``lstsq_fused.supports_fusion`` with the stored
    bytes counted over BOTH channel matrices."""
    mode = pallas_mode()
    if mode == "off":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if mode == "auto" and 2 * m * n * itemsize <= _STREAMING_BYTES:
        return False
    # one (128, n) row tile of EACH channel, double-buffered, plus f32
    # intermediates must fit VMEM
    if 128 * n * (4 * itemsize + 6 * 4) > (100 << 20):
        return False
    return (jax.default_backend() == "tpu"
            and dtype in (jnp.float32, jnp.bfloat16))


_HI = jax.lax.Precision.HIGHEST


def planar_lstsq_gradmap_reference(Ar, Ai, x, b):
    """Two-pass XLA fallback — the exact graph the unfused solver builds
    for PlanarDenseOp + LeastSquares.  Matmul precision is pinned to
    HIGHEST like PlanarDenseOp's: planar matvecs are (m,n)·(n,2) MATRIX
    products, and the TPU MXU's DEFAULT precision rounds f32 operands to
    bf16 (~1% relative error, measured on v5e 2026-08-19 — the VPU
    kernel was 2.4e-5 from float64 while a default-precision version of
    this graph was 0.42 off)."""
    p = jnp.matmul(Ar, x, precision=_HI)
    q = jnp.matmul(Ai, x, precision=_HI)
    d = jnp.stack([p[:, 0] - q[:, 1], p[:, 1] + q[:, 0]], axis=-1)
    r = d - b
    f = 0.5 * jnp.sum(r * r)
    pr = jnp.matmul(Ar.T, r, precision=_HI)
    qr = jnp.matmul(Ai.T, r, precision=_HI)
    g = jnp.stack([pr[:, 0] + qr[:, 1], pr[:, 1] - qr[:, 0]], axis=-1)
    return d, f, g


def planar_hinge_gradmap_reference(Ar, Ai, x, b):
    """Two-pass XLA fallback for PlanarDenseOp + PlanarPhaseHinge
    (HIGHEST-precision matmuls — see planar_lstsq_gradmap_reference)."""
    p = jnp.matmul(Ar, x, precision=_HI)
    q = jnp.matmul(Ai, x, precision=_HI)
    d = jnp.stack([p[:, 0] - q[:, 1], p[:, 1] + q[:, 0]], axis=-1)
    mag = jnp.sqrt(jnp.sum(d * d, axis=-1))
    r = jnp.maximum(mag - b, 0.0)
    f = 0.5 * jnp.sum(r * r)
    ell = (r / jnp.maximum(mag, 1e-30))[:, None] * d
    pr = jnp.matmul(Ar.T, ell, precision=_HI)
    qr = jnp.matmul(Ai.T, ell, precision=_HI)
    g = jnp.stack([pr[:, 0] + qr[:, 1], pr[:, 1] - qr[:, 0]], axis=-1)
    return d, f, g


def _lstsq_elem(dr, di, br, bi):
    rr = dr - br
    ri = di - bi
    return 0.5 * (rr * rr + ri * ri), rr, ri


def _hinge_elem(dr, di, b):
    mag = jnp.sqrt(dr * dr + di * di)
    r = jnp.maximum(mag - b, 0.0)
    s = r / jnp.maximum(mag, 1e-30)
    return 0.5 * r * r, s * dr, s * di


def _make_kernel_planar(loss_elem, n_data):
    """Planar streaming kernel body.  Operands: xr, xi (1,n) rows,
    ``n_data`` (tm,1) data column tiles, Ar, Ai (tm,n) tiles.  Outputs:
    dr, di (tm,1) tiles, f (SMEM scalar), gr, gi (1,n) rows; scratch:
    gr/gi accumulators + f accumulator."""
    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        data_refs = refs[2:2 + n_data]
        (Ar_ref, Ai_ref, dr_ref, di_ref, f_ref, gr_ref, gi_ref,
         gr_acc, gi_acc, f_acc) = refs[2 + n_data:]
        i = pl.program_id(0)
        Ar = Ar_ref[:].astype(jnp.float32)
        Ai = Ai_ref[:].astype(jnp.float32)
        xr = xr_ref[:]
        xi = xi_ref[:]
        dr = jnp.sum(Ar * xr - Ai * xi, axis=1, keepdims=True)  # (tm,1)
        di = jnp.sum(Ar * xi + Ai * xr, axis=1, keepdims=True)
        dr_ref[:] = dr
        di_ref[:] = di
        ell, lr, li = loss_elem(dr, di, *[r[:] for r in data_refs])
        fpart = jnp.sum(ell)
        grpart = jnp.sum(Ar * lr + Ai * li, axis=0, keepdims=True)  # (1,n)
        gipart = jnp.sum(Ar * li - Ai * lr, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _init():
            gr_acc[:] = grpart
            gi_acc[:] = gipart
            f_acc[0, 0] = fpart

        @pl.when(i > 0)
        def _acc():
            gr_acc[:] = gr_acc[:] + grpart
            gi_acc[:] = gi_acc[:] + gipart
            f_acc[0, 0] = f_acc[0, 0] + fpart

        @pl.when(i == pl.num_programs(0) - 1)
        def _out():
            gr_ref[:] = gr_acc[:]
            gi_ref[:] = gi_acc[:]
            f_ref[0, 0] = f_acc[0, 0]

    return kernel


def _fused_planar(Ar, Ai, x, data, loss_elem, interpret):
    m, n = Ar.shape
    itemsize = jnp.dtype(Ar.dtype).itemsize
    m_pad = _pad128(m)
    # both channel tiles live in the pipeline: budget 2× the per-tile
    # bytes when picking the row tile
    tm = _row_tile(m_pad, n, 2 * itemsize)
    x = x.astype(jnp.float32)
    data = tuple(jnp.asarray(v, jnp.float32) for v in data)
    if m_pad != m:
        # zero rows with zero data are exact for both supported losses:
        # d=0, ℓ(0;0)=0, ∂ℓ=0 — nothing reaches f or g.  XLA hoists the
        # loop-invariant pads out of the solver's while_loop.
        Ar = jnp.pad(Ar, ((0, m_pad - m), (0, 0)))
        Ai = jnp.pad(Ai, ((0, m_pad - m), (0, 0)))
        data = tuple(jnp.pad(v, (0, m_pad - m)) for v in data)
    xr = x[:, 0].reshape(1, n)
    xi = x[:, 1].reshape(1, n)
    col = lambda: pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((tm, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    operands = [xr, xi] + [v.reshape(m_pad, 1) for v in data] + [Ar, Ai]
    in_specs = ([row(), row()] + [col() for _ in data]
                + [tile(), tile()])

    kern = _make_kernel_planar(loss_elem, len(data))
    dr, di, f, gr, gi = pl.pallas_call(
        kern,
        grid=(m_pad // tm,),
        in_specs=in_specs,
        out_specs=[
            col(), col(),                                 # dr, di tiles
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),        # f
            row(), row(),                                 # gr, gi
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * m_pad * n,
            bytes_accessed=2 * m_pad * n * itemsize
            + (4 * m_pad + 4 * n) * 4,
            transcendentals=m_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            # double-buffered (Ar, Ai) tiles + f32 intermediates +
            # row/column vectors + Mosaic headroom, capped inside the
            # 128 MB VMEM (mirrors lstsq_fused's measured provisioning)
            vmem_limit_bytes=min(
                100 << 20,
                4 * tm * n * itemsize + 4 * tm * n * 4 + (12 << 20)),
        ),
        interpret=interpret,
    )(*operands)
    d = jnp.concatenate([dr[:m], di[:m]], axis=1)
    g = jnp.concatenate([gr.reshape(n, 1), gi.reshape(n, 1)], axis=1)
    return d, f[0, 0], g


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_planar_lstsq_gradmap(Ar, Ai, x, b, interpret: bool = False):
    """One-pass (d, f, g) for  f(x) = ½‖Ax − b‖²  on planar complex
    A = Ar + i·Ai, x ∈ ℝ^{n×2}, b ∈ ℝ^{m×2}.  Returns d (m,2), f
    scalar, g (n,2)."""
    b = jnp.asarray(b, jnp.float32)
    return _fused_planar(Ar, Ai, x, (b[:, 0], b[:, 1]), _lstsq_elem,
                         interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_planar_hinge_gradmap(Ar, Ai, x, b, interpret: bool = False):
    """One-pass (d, f, g) for the PhaseMax hinge
    f(x) = ½ Σ max(|Ax| − b, 0)²  on planar complex A; b ∈ ℝ^m
    magnitudes.  Returns d (m,2), f scalar, g (n,2)."""
    return _fused_planar(Ar, Ai, x, (jnp.asarray(b, jnp.float32),),
                         _hinge_elem, interpret)
