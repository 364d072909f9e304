"""Probe: WHY does the planar microsolver run ~7x more wall per byte
than the dense one?  (round-3 VERDICT weak #1: 16384x256 planar iterates
at ~93 us = ~720 GB/s implied while the dense kernel's matvec pair
sustains ~11 TB/s VMEM traffic.)

Hypothesis: the chunked VPU matvec pays LANE<->SUBLANE RELAYOUTS on
every chunk.  ``jnp.sum(M * u, axis=1).reshape(1, rc)`` reduces over
lanes — the (rc,) result is COLUMN-natural — then reshapes it to a row:
a genuine rc-element transpose.  The adjoint reshapes a (1, rc) row to
an (rc, 1) column before broadcasting.  At the flagship that is
8 chunks x 4 matvecs x ~2 relayouts = ~64 transposes of 2048-element
vectors per iteration.  The dense kernel pays only 2 per pair.

Candidate fix (variant "col"): keep residual-space vectors in COLUMN
(m, 1) layout end-to-end —
  fwd:  jnp.sum(tile * xrow, axis=1, keepdims=True) -> (rc, 1), column-
        natural, stored to an (m, 1) scratch at sublane offset;
  adj:  tile * ycol broadcasts the column across lanes (native splat),
        jnp.sum(..., axis=0, keepdims=True) -> (1, n), row-natural.
Zero transposes in the whole pair.  The hinge/f/elementwise work is
layout-agnostic.

This probe times K data-chained planar fwd+adj PAIRS inside one kernel
per variant at the 16384x256 flagship shape (the bf16_matvec_probe
method) and prints implied VMEM GB/s.  Variants:
  cur   -- the exact shipped formulation (row scratch + reshapes)
  col   -- column-layout residual side, zero relayouts
  mxu   -- chunked dot_general (HIGHEST), both directions natural

Run on the live TPU:  python benchmarks/planar_matvec_probe.py
Interpret-mode correctness check:  ... --check (CPU, small shape)

Measured live 2026-08-20 (K=8000 chained pairs, RTT-subtracted, same
session as the dense tail probe's L0 = 1.77 us floor):
  cur   75.2-75.5 us/pair ->   889-892 GB/s implied  (round-3 kernel)
  col   23.0-23.6 us/pair -> 2,842-2,918 GB/s        (3.2x)
  colu  22.2-22.7 us/pair -> 2,957-3,025 GB/s        (3.3x, unrolled)
  rowt  23.0 us/pair      -> 2,919 GB/s              (transposed)
  mxu   109-111 us/pair   ->   603-614 GB/s          (batch-1 GEMV)
VERDICT: hypothesis CONFIRMED — the "7x per-byte gap" was the per-chunk
relayouts.  The remaining ~22 us is VPU-ISSUE-bound, not bandwidth-
bound: a planar pair is ~12 elementwise passes over Ar+Ai (4 mults +
2 add/subs per direction x 2 directions) plus the reduces = ~66M
vector ops; at the VPU's ~4x(8,128) lanes/cycle that is ~17 us of pure
issue — the col/rowt variants run within ~1.3x of that bound.  The
KERNEL adopted rowt (transposed storage): same pair rate as colu but
the whole residual side (hinge, b, hp dd folds) stays in natural ROW
layout.  NOTE the kernel could not reuse the probe's keepdims/1-D
accumulators verbatim: accumulating lane-reduced chunk partials with a
canonical zeros init poisons the layout ("Invalid relayout" on mul,
hardware-only) — the shipped adj stages per-chunk partials through an
(nchunks, n) scratch instead (microsolver_planar.py adj).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHECK = "--check" in sys.argv
if CHECK:
    jax.config.update("jax_platforms", "cpu")

M, N, K = (1024, 256, 4) if CHECK else (16384, 256, 8000)
RC = 512 if CHECK else 2048
NCH = M // RC
HI = jax.lax.Precision.HIGHEST


def make(variant, interpret=False):
    """K chained planar fwd+adj pairs; returns (1, n)+(1, n) outputs."""

    def kern_cur(Ar_ref, Ai_ref, x_ref, o_ref, dscr_r, dscr_i,
                 yscr_r, yscr_i):
        xr = x_ref[0:1]
        xi = x_ref[1:2]

        def _mv(u, Mt, adjoint):
            if adjoint:
                return jnp.sum(Mt * u.reshape(Mt.shape[0], 1),
                               axis=0).reshape(1, N)
            return jnp.sum(Mt * u, axis=1).reshape(1, Mt.shape[0])

        def body(i, carry):
            cr, ci, _gr, _gi = carry

            def fchunk(j, c):
                Arc = Ar_ref[pl.ds(j * RC, RC), :]
                Aic = Ai_ref[pl.ds(j * RC, RC), :]
                dscr_r[0:1, pl.ds(j * RC, RC)] = (
                    _mv(cr, Arc, False) - _mv(ci, Aic, False))
                dscr_i[0:1, pl.ds(j * RC, RC)] = (
                    _mv(ci, Arc, False) + _mv(cr, Aic, False))
                return c
            jax.lax.fori_loop(0, NCH, fchunk, 0)
            yscr_r[:] = dscr_r[:]
            yscr_i[:] = dscr_i[:]

            def achunk(j, acc):
                gr_a, gi_a = acc
                Arc = Ar_ref[pl.ds(j * RC, RC), :]
                Aic = Ai_ref[pl.ds(j * RC, RC), :]
                yrc = yscr_r[0:1, pl.ds(j * RC, RC)]
                yic = yscr_i[0:1, pl.ds(j * RC, RC)]
                gr_a = gr_a + _mv(yrc, Arc, True) + _mv(yic, Aic, True)
                gi_a = gi_a + _mv(yic, Arc, True) - _mv(yrc, Aic, True)
                return gr_a, gi_a
            gr, gi = jax.lax.fori_loop(
                0, NCH, achunk,
                (jnp.zeros((1, N), jnp.float32),
                 jnp.zeros((1, N), jnp.float32)))
            return xr + 0.0 * gr, xi + 0.0 * gi, gr, gi

        z = jnp.zeros((1, N), jnp.float32)
        _fr, _fi, gr, gi = jax.lax.fori_loop(0, K, body, (xr, xi, z, z))
        o_ref[0:1] = gr
        o_ref[1:2] = gi

    def kern_col(Ar_ref, Ai_ref, x_ref, o_ref, dscr_r, dscr_i,
                 yscr_r, yscr_i):
        """Column-layout residual side: fwd lane-reduce keepdims ->
        (rc,1) chunks of an (m,1) scratch column; adj broadcasts the
        column chunk across lanes and sublane-reduces -> (1,n) rows.
        No reshapes/transposes anywhere."""
        xr = x_ref[0:1]
        xi = x_ref[1:2]

        def body(i, carry):
            cr, ci, _gr, _gi = carry

            def fchunk(j, c):
                Arc = Ar_ref[pl.ds(j * RC, RC), :]
                Aic = Ai_ref[pl.ds(j * RC, RC), :]
                dscr_r[pl.ds(j * RC, RC), :] = jnp.sum(
                    Arc * cr - Aic * ci, axis=1, keepdims=True)
                dscr_i[pl.ds(j * RC, RC), :] = jnp.sum(
                    Arc * ci + Aic * cr, axis=1, keepdims=True)
                return c
            jax.lax.fori_loop(0, NCH, fchunk, 0)
            yscr_r[:] = dscr_r[:]
            yscr_i[:] = dscr_i[:]

            def achunk(j, acc):
                gr_a, gi_a = acc
                Arc = Ar_ref[pl.ds(j * RC, RC), :]
                Aic = Ai_ref[pl.ds(j * RC, RC), :]
                yrc = yscr_r[pl.ds(j * RC, RC), :]
                yic = yscr_i[pl.ds(j * RC, RC), :]
                gr_a = gr_a + jnp.sum(Arc * yrc + Aic * yic, axis=0,
                                      keepdims=True)
                gi_a = gi_a + jnp.sum(Arc * yic - Aic * yrc, axis=0,
                                      keepdims=True)
                return gr_a, gi_a
            gr, gi = jax.lax.fori_loop(
                0, NCH, achunk,
                (jnp.zeros((1, N), jnp.float32),
                 jnp.zeros((1, N), jnp.float32)))
            return xr + 0.0 * gr, xi + 0.0 * gi, gr, gi

        z = jnp.zeros((1, N), jnp.float32)
        _fr, _fi, gr, gi = jax.lax.fori_loop(0, K, body, (xr, xi, z, z))
        o_ref[0:1] = gr
        o_ref[1:2] = gi

    def kern_colu(Ar_ref, Ai_ref, x_ref, o_ref, dscr_r, dscr_i,
                  yscr_r, yscr_i):
        """col with the chunk loops UNROLLED (static slices, no
        fori_loop/ds overhead — lets Mosaic software-pipeline the
        chunk stream)."""
        xr = x_ref[0:1]
        xi = x_ref[1:2]

        def body(i, carry):
            cr, ci, _gr, _gi = carry
            for j in range(NCH):
                Arc = Ar_ref[j * RC:(j + 1) * RC, :]
                Aic = Ai_ref[j * RC:(j + 1) * RC, :]
                dscr_r[j * RC:(j + 1) * RC, :] = jnp.sum(
                    Arc * cr - Aic * ci, axis=1, keepdims=True)
                dscr_i[j * RC:(j + 1) * RC, :] = jnp.sum(
                    Arc * ci + Aic * cr, axis=1, keepdims=True)
            yscr_r[:] = dscr_r[:]
            yscr_i[:] = dscr_i[:]
            gr = jnp.zeros((1, N), jnp.float32)
            gi = jnp.zeros((1, N), jnp.float32)
            for j in range(NCH):
                Arc = Ar_ref[j * RC:(j + 1) * RC, :]
                Aic = Ai_ref[j * RC:(j + 1) * RC, :]
                yrc = yscr_r[j * RC:(j + 1) * RC, :]
                yic = yscr_i[j * RC:(j + 1) * RC, :]
                gr = gr + jnp.sum(Arc * yrc + Aic * yic, axis=0,
                                  keepdims=True)
                gi = gi + jnp.sum(Arc * yic - Aic * yrc, axis=0,
                                  keepdims=True)
            return xr + 0.0 * gr, xi + 0.0 * gi, gr, gi

        z = jnp.zeros((1, N), jnp.float32)
        _fr, _fi, gr, gi = jax.lax.fori_loop(0, K, body, (xr, xi, z, z))
        o_ref[0:1] = gr
        o_ref[1:2] = gi

    def kern_rowt(Art_ref, Ait_ref, x_ref, o_ref, dscr_r, dscr_i,
                  yscr_r, yscr_i):
        """TRANSPOSED (n, m) channel storage: fwd = sublane-reduce ->
        (1, m) ROW (natural — the whole residual side stays in row
        layout); adj = lane-reduce -> (n,1) column.  Only four
        n=256-element transposes per pair (x channels in, g channels
        out); every m-sized relayout is gone.  Lane chunks of LC."""
        xr = x_ref[0:1]
        xi = x_ref[1:2]
        LC = RC                                  # lane-chunk width

        def body(i, carry):
            cr, ci, _gr, _gi = carry
            crc = cr.reshape(N, 1)               # 256-elt transposes
            cic = ci.reshape(N, 1)
            for j in range(NCH):
                Art = Art_ref[:, j * LC:(j + 1) * LC]
                Ait = Ait_ref[:, j * LC:(j + 1) * LC]
                dscr_r[0:1, j * LC:(j + 1) * LC] = jnp.sum(
                    Art * crc - Ait * cic, axis=0, keepdims=True)
                dscr_i[0:1, j * LC:(j + 1) * LC] = jnp.sum(
                    Art * cic + Ait * crc, axis=0, keepdims=True)
            yscr_r[:] = dscr_r[:]
            yscr_i[:] = dscr_i[:]
            grc = jnp.zeros((N, 1), jnp.float32)
            gic = jnp.zeros((N, 1), jnp.float32)
            for j in range(NCH):
                Art = Art_ref[:, j * LC:(j + 1) * LC]
                Ait = Ait_ref[:, j * LC:(j + 1) * LC]
                yrc = yscr_r[0:1, j * LC:(j + 1) * LC]
                yic = yscr_i[0:1, j * LC:(j + 1) * LC]
                grc = grc + jnp.sum(Art * yrc + Ait * yic, axis=1,
                                    keepdims=True)
                gic = gic + jnp.sum(Art * yic - Ait * yrc, axis=1,
                                    keepdims=True)
            gr = grc.reshape(1, N)
            gi = gic.reshape(1, N)
            return xr + 0.0 * gr, xi + 0.0 * gi, gr, gi

        z = jnp.zeros((1, N), jnp.float32)
        _fr, _fi, gr, gi = jax.lax.fori_loop(0, K, body, (xr, xi, z, z))
        o_ref[0:1] = gr
        o_ref[1:2] = gi

    def kern_mxu(Ar_ref, Ai_ref, x_ref, o_ref, dscr_r, dscr_i,
                 yscr_r, yscr_i):
        """dot_general both directions (batch-1 GEMV on the MXU):
        fwd contracts (1,n)x(rc,n) axis 1x1 -> (1,rc); adj contracts
        (1,rc)x(rc,n) axis 1x0 -> (1,n).  Both row-natural."""
        xr = x_ref[0:1]
        xi = x_ref[1:2]

        def mvf(u, Mt):
            return jax.lax.dot_general(
                u, Mt, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI)

        def mva(u, Mt):
            return jax.lax.dot_general(
                u, Mt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI)

        def body(i, carry):
            cr, ci, _gr, _gi = carry

            def fchunk(j, c):
                Arc = Ar_ref[pl.ds(j * RC, RC), :]
                Aic = Ai_ref[pl.ds(j * RC, RC), :]
                dscr_r[0:1, pl.ds(j * RC, RC)] = mvf(cr, Arc) - mvf(ci, Aic)
                dscr_i[0:1, pl.ds(j * RC, RC)] = mvf(ci, Arc) + mvf(cr, Aic)
                return c
            jax.lax.fori_loop(0, NCH, fchunk, 0)
            yscr_r[:] = dscr_r[:]
            yscr_i[:] = dscr_i[:]

            def achunk(j, acc):
                gr_a, gi_a = acc
                Arc = Ar_ref[pl.ds(j * RC, RC), :]
                Aic = Ai_ref[pl.ds(j * RC, RC), :]
                yrc = yscr_r[0:1, pl.ds(j * RC, RC)]
                yic = yscr_i[0:1, pl.ds(j * RC, RC)]
                gr_a = gr_a + mva(yrc, Arc) + mva(yic, Aic)
                gi_a = gi_a + mva(yic, Arc) - mva(yrc, Aic)
                return gr_a, gi_a
            gr, gi = jax.lax.fori_loop(
                0, NCH, achunk,
                (jnp.zeros((1, N), jnp.float32),
                 jnp.zeros((1, N), jnp.float32)))
            return xr + 0.0 * gr, xi + 0.0 * gi, gr, gi

        z = jnp.zeros((1, N), jnp.float32)
        _fr, _fi, gr, gi = jax.lax.fori_loop(0, K, body, (xr, xi, z, z))
        o_ref[0:1] = gr
        o_ref[1:2] = gi

    kern = {"cur": kern_cur, "col": kern_col, "colu": kern_colu,
            "rowt": kern_rowt, "mxu": kern_mxu}[variant]
    col = variant in ("col", "colu")
    rowt = variant == "rowt"
    dshape = (M, 1) if col else (1, M)

    @jax.jit
    def run(Ar, Ai, x):
        if rowt:
            Ar, Ai = Ar.T, Ai.T              # one-time XLA transposes
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM(dshape, jnp.float32)] * 4,
            compiler_params=pltpu.CompilerParams(
                # +40 MB: the col variant's scoped stack ran 12 KB past
                # a 32 MB headroom on hardware (2026-08-20)
                vmem_limit_bytes=min(100 << 20, 2 * M * N * 4 + (40 << 20)),
            ),
            interpret=interpret,
        )(Ar, Ai, x)

    return run


def reference_pair(Ar, Ai, x):
    """One fwd+adj planar pair in plain NumPy (the --check target)."""
    xr, xi = x[0:1], x[1:2]
    dr = xr @ Ar.T - xi @ Ai.T
    di = xi @ Ar.T + xr @ Ai.T
    gr = dr @ Ar + di @ Ai
    gi = di @ Ar - dr @ Ai
    return gr, gi


def main():
    rng = np.random.default_rng(0)
    Ar = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, N)), jnp.float32)

    if CHECK:
        # every kernel outputs the FINAL pair's g (the carry stays == x
        # through the chain), so correctness == matvec-algebra parity
        # with the plain-XLA planar pair
        gr0, gi0 = reference_pair(np.asarray(Ar), np.asarray(Ai),
                                  np.asarray(x))
        ref = np.concatenate([gr0, gi0], axis=0)
        for variant in ("cur", "col", "colu", "rowt", "mxu"):
            run = make(variant, interpret=True)
            out = np.asarray(run(Ar, Ai, x))
            np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-3)
            print(f"{variant}: fwd+adj pair matches XLA (interpret)")
        return

    tiny = jax.jit(lambda i: jnp.sum(jnp.zeros(8) + i))
    float(tiny(0))
    rtt = 1e9
    for i in range(1, 4):
        t0 = time.perf_counter(); float(tiny(i))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"# rtt {rtt*1e3:.1f} ms; {K} planar fwd+adj pairs per readback; "
          f"{M}x{N}, rc={RC}")

    bytes_per_pair = 2 * 2 * M * N * 4        # Ar+Ai read fwd AND adj
    walls = {}
    for variant in ("cur", "col", "colu", "rowt", "mxu"):
        run = make(variant)
        float(jnp.sum(run(Ar, Ai, x)))        # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(Ar, Ai, x)))
            best = min(best, time.perf_counter() - t0 - rtt)
        walls[variant] = best
        print(f"{variant}: {best/K*1e6:8.2f} us/pair "
              f"({bytes_per_pair*K/best/1e9:,.0f} GB/s VMEM-read implied)")
    print(f"col speedup vs cur: {walls['cur']/walls['col']:.2f}x; "
          f"mxu vs cur: {walls['cur']/walls['mxu']:.2f}x")


if __name__ == "__main__":
    main()
