"""Fused gradient-step + soft-threshold + reduction kernel.

One pass over the signal vector computes everything the solver needs
from a forward-backward trial at stepsize τ:

    x1hat = x0 − τ·g
    x1    = shrink(x1hat, τμ)
    Dx    = x1 − x0
    s_dx2 = ‖Dx‖²            (backtracking quadratic term, residual)
    s_rdg = ⟨Dx, g⟩          (backtracking linear term)
    s_gm2 = ‖x1 − x1hat‖²    (residual normalizer)

XLA fuses the elementwise chain on its own, but materializes x1hat/Dx
between the elementwise kernel and the three reduction kernels; this
Pallas version keeps every intermediate in registers/VMEM and emits the
three partial sums alongside the tile write — one read of (x0, g), one
write of x1, nothing else.  Matters for very wide signals (n ≫ VMEM);
at the example-suite sizes it is a demonstration of the fused native
component (SURVEY.md §2.4 item 2/3).

Real f32 only (the hot path); complex problems use the XLA composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_shrink_step", "shrink_step_reference"]


def shrink_step_reference(x0, g, tau, mu):
    """XLA composition — the exact math the kernel fuses."""
    x1hat = x0 - tau * g
    mag = jnp.abs(x1hat)
    scale = jnp.maximum(mag - tau * mu, 0.0) / jnp.maximum(mag, 1e-30)
    x1 = x1hat * scale
    dx = x1 - x0
    return (x1,
            jnp.vdot(dx, dx).real,
            jnp.vdot(dx, g).real,
            jnp.vdot(x1 - x1hat, x1 - x1hat).real)


def _kernel(ts_ref, x0_ref, g_ref, x1_ref, dx2_ref, rdg_ref, gm2_ref):
    i = pl.program_id(0)
    tau = ts_ref[0]
    thr = ts_ref[1]                       # tau * mu
    x0 = x0_ref[:]
    g = g_ref[:]
    x1hat = x0 - tau * g
    mag = jnp.abs(x1hat)
    scale = jnp.maximum(mag - thr, 0.0) / jnp.maximum(mag, 1e-30)
    x1 = x1hat * scale
    x1_ref[:] = x1
    dx = x1 - x0
    sm = x1 - x1hat
    p_dx2 = jnp.sum(dx * dx)
    p_rdg = jnp.sum(dx * g)
    p_gm2 = jnp.sum(sm * sm)

    @pl.when(i == 0)
    def _():
        dx2_ref[0, 0] = p_dx2
        rdg_ref[0, 0] = p_rdg
        gm2_ref[0, 0] = p_gm2

    @pl.when(i > 0)
    def _():
        dx2_ref[0, 0] = dx2_ref[0, 0] + p_dx2
        rdg_ref[0, 0] = rdg_ref[0, 0] + p_rdg
        gm2_ref[0, 0] = gm2_ref[0, 0] + p_gm2


def _col_tile(n_pad: int, cap: int = 1 << 16) -> int:
    best = 128
    for tn in range(256, cap + 1, 128):
        if n_pad % tn == 0 and tn * 4 * 2 <= (8 << 20):
            best = tn
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_shrink_step(x0, g, tau, mu, interpret: bool = False):
    """(x1, ‖Dx‖², ⟨Dx,g⟩, ‖x1−x1hat‖²) in one fused pass; real f32."""
    n = x0.shape[0]
    n_pad = ((n + 127) // 128) * 128
    if n_pad != n:
        # zero padding is exact: padded lanes give x1hat=0, x1=0, Dx=0
        x0 = jnp.pad(x0, (0, n_pad - n))
        g = jnp.pad(g, (0, n_pad - n))
    tn = _col_tile(n_pad)
    ts = jnp.stack([jnp.asarray(tau, jnp.float32),
                    jnp.asarray(tau, jnp.float32)
                    * jnp.asarray(mu, jnp.float32)])

    x1, dx2, rdg, gm2 = pl.pallas_call(
        _kernel,
        grid=(n_pad // tn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # (2,) scalars
            pl.BlockSpec((1, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # x0 tile
            pl.BlockSpec((1, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # g tile
        ],
        out_specs=[
            pl.BlockSpec((1, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # x1 tile
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(ts, x0.reshape(1, n_pad), g.reshape(1, n_pad))
    return (x1.reshape(n_pad)[:n], dx2[0, 0], rdg[0, 0], gm2[0, 0])
