"""Fused TV-dual gradmap:  (μ·div p, ½‖μ·div p − b‖², μ·grad(μ·div p − b))
in ONE kernel launch with the whole state VMEM-resident.

The TV denoising iteration is not bandwidth-bound — the 512×512 dual
state is ~5 MB — it is LAUNCH-bound: XLA lowers the stencil/elementwise
chain to dozens of small kernels per solver iteration.  This kernel
computes the entire measurement-space evaluation (forward divergence,
residual, objective value, adjoint gradient field) as one Pallas call
with a single grid step: every array lives in VMEM, the stencils are
sublane/lane rolls with edge masks, and the only HBM traffic is the
in/out state itself.

Stencil identities (matching reference_oracle/generators.py exactly):

  div  (2,H,W) → (H,W):  out = Σ_axis [ shift₊(q) − q ],
      q = p-channel with its LAST row/col zeroed, shift₊ = circular
      roll by +1 along the axis (the wrapped element is the zeroed one).
  grad (H,W) → (2,H,W):  g = [ shift₋(r) − r ] with the LAST row/col
      of each channel forced to zero, shift₋ = circular roll by −1.

Opt-in with the other Pallas kernels (FASTA_TPU_PALLAS=1); the XLA
composition is the mathematically identical fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_tv_gradmap", "tv_gradmap_reference"]


def _row_mask(h, w, last_zero_axis):
    """1.0 everywhere except the last row (axis=0) / col (axis=1)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), last_zero_axis)
    limit = h - 1 if last_zero_axis == 0 else w - 1
    return (idx < limit).astype(jnp.float32)


def tv_gradmap_reference(p, b, mu):
    """XLA composition — identical math (oracle stencils)."""
    from ..operators import ScaledOp, TVDiv2D, TVGrad2D
    op = ScaledOp(mu, TVDiv2D())
    d = op(p)
    r = d - b
    f = 0.5 * jnp.vdot(r, r).real
    g = mu * TVGrad2D()(r)
    return d, f, g


def _kernel(p_ref, b_ref, d_ref, f_ref, g_ref, *, mu, h, w):
    pv = p_ref[0]
    ph = p_ref[1]
    mrow = _row_mask(h, w, 0)
    mcol = _row_mask(h, w, 1)
    # forward divergence (adjoint of forward differences)
    q = pv * mrow
    s = ph * mcol
    div = (pltpu.roll(q, 1, 0) - q) + (pltpu.roll(s, 1, 1) - s)
    d = mu * div
    r = d - b_ref[:]
    d_ref[:] = d
    f_ref[0, 0] = 0.5 * jnp.sum(r * r)
    # adjoint: forward-difference gradient of r, scaled by mu
    # (roll by size−1 ≡ roll by −1; Mosaic requires non-negative shifts)
    gv = (pltpu.roll(r, h - 1, 0) - r) * mrow
    gh = (pltpu.roll(r, w - 1, 1) - r) * mcol
    g_ref[0] = mu * gv
    g_ref[1] = mu * gh


@functools.partial(jax.jit, static_argnames=("mu", "interpret"))
def fused_tv_gradmap(p, b, mu: float, interpret: bool = False):
    """p: (2,H,W) dual field, b: (H,W) image, mu static.  Returns
    (d: (H,W), f: scalar, g: (2,H,W))."""
    _, h, w = p.shape
    kern = functools.partial(_kernel, mu=mu, h=h, w=w)
    d, f, g = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # p (2,H,W)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b (H,W)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # d (H,W)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # f (1,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # g (2,H,W)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((2, h, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(32 << 20, 14 * h * w * 4),
        ),
        interpret=interpret,
    )(p, b)
    return d, f[0, 0], g
