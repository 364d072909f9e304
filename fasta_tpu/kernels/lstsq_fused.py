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
mathematically identical two-pass XLA fallback runs.  Planar-complex
operators stream through the sibling kernel in ``planar_fused.py``
(both channel matrices read once per evaluation); native complex dtype
takes the fallback path (the TPU backend has no complex support —
planar IS the TPU layout).

Measured status on TPU v5e (2026-08-17; RTT-amortized timing — the
tunneled backend's per-readback round trip measured 28 ms that day, so
single-call timings are latency, not bandwidth; chain K evaluations per
readback or time whole solves): both variants are numerically validated
on hardware (g within 6e-7 of the XLA graph).  The dispatch policy
follows the two measured regimes:

* **HBM-streaming (A beyond VMEM residency, e.g. 8192×16384 = 512 MB)**
  — gradmap-only, live 2026-08-19 with a data-dependency-carrying
  K=256 chain: one-read VPU kernel 0.70 ms/eval vs XLA two-pass
  1.40 ms (**2.00×**, both ~770 GB/s implied — 94% of the 819 GB/s
  roofline, hardware-asserted ≤ roofline by hw_validate check [5]).
  An earlier "0.41 ms / 3.2×" record is RETRACTED (the independent
  K=10 evals did not serialize the A reads; 3.2× would imply 153% of
  roofline — the one-read-vs-two-read ceiling is ≤2×).  In the full
  adaptive solver loop: 1,340 it/s vs 689 (**1.95×** live 2026-08-20,
  hw_validate [13] — the loop adds elementwise + decision-scalar
  passes).
  Default ON here (``supports_fusion`` auto mode).
* **VMEM-resident (the 1000×2000 baseline, 8 MB)** — single-GEMV
  formulations measure 13.2–14.6 µs/pass (590–620 GB/s VMEM-read
  equivalent; chunked-accumulate variants within 5% of the plain
  lowering), so the two-pass floor is ~27 µs and the jitted XLA loop
  already runs at 28.4 µs — 95% of the in-kernel floor.  The kernel
  cannot win here; default OFF (XLA path).

The ``FASTA_TPU_PALLAS`` env var overrides: "1" forces on, "0" forces
off, unset/"auto" applies the size rule above.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_lstsq_gradmap", "lstsq_gradmap_reference", "supports_fusion",
    "fused_pointwise_gradmap",
]


def _pad128(m: int) -> int:
    return ((m + 127) // 128) * 128


def _row_tile(m_pad: int, n: int, itemsize: int = 4, cap: int = 512,
              tile_bytes_cap: int = 12 << 20) -> int:
    """Largest multiple of 128 ≤ cap dividing the (128-padded) row count
    whose A-tile fits the VMEM pipeline budget (double-buffered).
    Mosaic requires block last-dims divisible by 128 (the d/b tiles put
    rows on the lane axis), and 128 always divides m_pad."""
    best = 128
    for tm in range(256, cap + 1, 128):
        if m_pad % tm == 0 and tm * n * itemsize <= tile_bytes_cap:
            best = tm
    return best


import os


def pallas_mode() -> str:
    """The Pallas switch, read DYNAMICALLY at trace time — the solver
    cache keys on the same read (solver.py make_solver), so toggling
    FASTA_TPU_PALLAS mid-process always selects a matching executable.

    "1" → on everywhere supported; "0" → off; unset/"auto" → on only in
    the HBM-streaming regime (A beyond VMEM residency), where the
    one-read pass measured 2.00× XLA's two-pass gradmap (0.70 vs
    1.40 ms/eval, live 2026-08-19) / 1.95× the full solve
    (in-session re-pair, 2026-08-20) — and off at VMEM-resident sizes,
    where XLA sits near the in-kernel per-pass rate and the single-row
    GEMV kernel loses (the whole-solve MICROsolver wins there instead,
    via the explicit `fasta_tpu.microsolve` dispatch)."""
    v = os.environ.get("FASTA_TPU_PALLAS", "auto")
    return {"1": "on", "0": "off"}.get(v, "auto")


def pallas_enabled() -> bool:
    """Explicit opt-in (used by the whole-solve microsolvers and the TV
    fused gradmap, which stay off unless forced)."""
    return pallas_mode() == "on"


# Beyond this working-set size the two XLA GEMV passes stream A from
# HBM twice; the fused one-read pass wins (or at worst ties).  v5e VMEM
# is 128 MB; 64 MB leaves no room for a double-buffered resident A.
_STREAMING_BYTES = 64 << 20


def supports_fusion(m: int, n: int, dtype) -> bool:
    """Pallas path preconditions: real f32 or bf16-storage A on a TPU
    backend (rows are zero-padded to the 128 lane granularity
    internally); enabled by default only for HBM-streaming sizes — the
    threshold compares the ACTUAL stored bytes, so a bf16 A must be 2×
    as large before it leaves VMEM residency (see pallas_mode)."""
    mode = pallas_mode()
    if mode == "off":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if mode == "auto" and m * n * itemsize <= _STREAMING_BYTES:
        return False
    # a single (128, n) row tile must fit the double-buffered pipeline
    # plus its f32 intermediates inside VMEM (~128 MB)
    if 128 * n * (2 * itemsize + 4 * 4) > (100 << 20):
        return False
    return (jax.default_backend() == "tpu"
            and dtype in (jnp.float32, jnp.bfloat16))


def lstsq_gradmap_reference(A, x, b):
    """Two-pass XLA fallback mirroring the unfused solver's gradmap
    graph (same matvecs; f as a shape-preserving elementwise-product
    sum rather than ``LeastSquares.value``'s ``jnp.vdot`` — XLA lowers
    both to the same reduction on current backends, and parity tests
    enforce the equality empirically, but it is not bit-identical BY
    CONSTRUCTION; vdot is avoided here because its dot_general is
    precision-unpinned on TPU).  Matmul precision pinned to HIGHEST
    like DenseOp's (a no-op for true GEMV, which lowers exactly; it
    matters the moment x grows a batch axis — MXU DEFAULT rounds f32
    matrix operands to bf16)."""
    hi = jax.lax.Precision.HIGHEST
    d = jnp.matmul(A, x, precision=hi)
    r = d - b
    f = 0.5 * jnp.sum(jnp.real(r * jnp.conj(r)))
    g = jnp.matmul(A.conj().T, r, precision=hi)
    return d, f, g


def _kernel_vpu(x_ref, b_ref, A_ref, d_ref, f_ref, g_ref,
                g_acc, f_acc):
    """VPU formulation: broadcast-multiply + reductions.  GEMV leaves
    127/128 MXU lanes idle, so the vector units are the natural engine;
    everything stays exact f32 (no MXU bf16 rounding).  b/d ride the
    sublane axis as (tm, 1) columns.  g/f accumulate in VMEM/SMEM
    scratch and are written out once on the last grid step — measured
    ~5% faster than revisited output blocks (v5e, 8192×16384).  A
    bf16-storage tile is upcast to f32 on the VPU after the (half-byte)
    DMA — the mixed-precision fast path streams half the bytes."""
    i = pl.program_id(0)
    A = A_ref[:].astype(jnp.float32)
    r = jnp.sum(A * x_ref[:], axis=1, keepdims=True) - b_ref[:]  # (tm,1)
    d_ref[:] = r + b_ref[:]
    gpart = jnp.sum(A * r, axis=0, keepdims=True)                # (1,n)
    fpart = 0.5 * jnp.sum(r * r)

    @pl.when(i == 0)
    def _init():
        g_acc[:] = gpart
        f_acc[0, 0] = fpart

    @pl.when(i > 0)
    def _acc():
        g_acc[:] = g_acc[:] + gpart
        f_acc[0, 0] = f_acc[0, 0] + fpart

    @pl.when(i == pl.num_programs(0) - 1)
    def _out():
        g_ref[:] = g_acc[:]
        f_ref[0, 0] = f_acc[0, 0]


def _make_kernel_mxu(precision):
    """MXU matvec kernel factory.  Row-vector (lane-major) layout:
    every vector is (1, k) so the signal dimension rides the 128-lane
    axis — degenerate (k, 1) column layouts are a Mosaic hazard.

    The MXU's DEFAULT path rounds f32 inputs to bf16 (~1e-2 relative
    error on GEMV — measured on hardware); HIGHEST (≈6 passes) restores
    full f32, HIGH (bf16x3, 3 passes) is near-f32 at half the MXU work.
    """
    def kernel(x_ref, b_ref, A_ref, d_ref, f_ref, g_ref,
               g_acc, f_acc):
        i = pl.program_id(0)
        A = A_ref[:].astype(jnp.float32)
        # r = x Aᵀ − b  over this row tile:  (1,n)·(tm,n)ᵀ → (1,tm)
        r = (jax.lax.dot_general(
                x_ref[:], A,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
             - b_ref[:])
        d_ref[:] = r + b_ref[:]
        # gradient partial  r A:  (1,tm)·(tm,n) → (1,n)
        gpart = jax.lax.dot_general(
            r, A, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)
        fpart = 0.5 * jnp.sum(r * r)

        @pl.when(i == 0)
        def _init():
            g_acc[:] = gpart
            f_acc[0, 0] = fpart

        @pl.when(i > 0)
        def _acc():
            g_acc[:] = g_acc[:] + gpart
            f_acc[0, 0] = f_acc[0, 0] + fpart

        @pl.when(i == pl.num_programs(0) - 1)
        def _out():
            g_ref[:] = g_acc[:]
            f_ref[0, 0] = f_acc[0, 0]

    return kernel


def _make_kernel_pointwise(loss_elem, n_data, masked):
    """VPU streaming kernel for an arbitrary POINTWISE smooth loss
    f(d) = Σᵢ ℓ(dᵢ; dataᵢ): same one-read structure as the least-squares
    kernel — d from a broadcast-multiply matvec, ℓ/ℓ′ elementwise on the
    tile, gradient partial Aᵀℓ′ accumulated in scratch.  ``loss_elem``
    returns ELEMENTWISE (ℓ, ℓ′) so the kernel can mask padded rows
    (zero rows of A give d=0, but ℓ(0) is generally nonzero — unlike
    least squares, padding is only exact under the mask)."""
    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        if masked:
            mask_ref = refs[1]
            off = 2
        data_refs = refs[off:off + n_data]
        (A_ref, d_ref, f_ref, g_ref, g_acc, f_acc) = refs[off + n_data:]
        i = pl.program_id(0)
        A = A_ref[:].astype(jnp.float32)
        d = jnp.sum(A * x_ref[:], axis=1, keepdims=True)      # (tm,1)
        d_ref[:] = d
        ell, dl = loss_elem(d, *[r[:] for r in data_refs])
        if masked:
            mk = mask_ref[:]
            ell = mk * ell
            dl = mk * dl
        fpart = jnp.sum(ell)
        gpart = jnp.sum(A * dl, axis=0, keepdims=True)        # (1,n)

        @pl.when(i == 0)
        def _init():
            g_acc[:] = gpart
            f_acc[0, 0] = fpart

        @pl.when(i > 0)
        def _acc():
            g_acc[:] = g_acc[:] + gpart
            f_acc[0, 0] = f_acc[0, 0] + fpart

        @pl.when(i == pl.num_programs(0) - 1)
        def _out():
            g_ref[:] = g_acc[:]
            f_ref[0, 0] = f_acc[0, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("loss_elem", "interpret"))
def fused_pointwise_gradmap(A, x, data, loss_elem, interpret: bool = False):
    """One-pass (d, f, Aᵀℓ′(d)) for f(x) = Σᵢ ℓ((Ax)ᵢ; dataᵢ) — the
    streaming analog of ``sharding.sharded_pointwise_gradmap``: logistic,
    squared hinge, and any future pointwise loss read A ONCE per
    gradient evaluation (bf16 storage halves the bytes again).

    ``data`` is a tuple of (m,) measurement-space arrays;
    ``loss_elem(d_tile, *data_tiles) -> (ℓ, ℓ′)`` elementwise.
    """
    m, n = A.shape
    itemsize = jnp.dtype(A.dtype).itemsize
    m_pad = _pad128(m)
    tm = _row_tile(m_pad, n, itemsize)
    x = x.astype(jnp.float32)
    data = tuple(jnp.asarray(v, jnp.float32) for v in data)
    masked = m_pad != m
    if masked:
        A = jnp.pad(A, ((0, m_pad - m), (0, 0)))
        data = tuple(jnp.pad(v, (0, m_pad - m)) for v in data)
    x2 = x.reshape(1, n)
    cols = [v.reshape(m_pad, 1) for v in data]
    tile_col = lambda: pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    operands = [x2]
    in_specs = [pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    if masked:
        mask = jnp.pad(jnp.ones((m, 1), jnp.float32),
                       ((0, m_pad - m), (0, 0)))
        operands.append(mask)
        in_specs.append(tile_col())
    operands += cols
    in_specs += [tile_col() for _ in cols]
    operands.append(A)
    in_specs.append(pl.BlockSpec((tm, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))

    kern = _make_kernel_pointwise(loss_elem, len(cols), masked)
    d, f, g = pl.pallas_call(
        kern,
        grid=(m_pad // tm,),
        in_specs=in_specs,
        out_specs=[
            tile_col(),                                   # d tile
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),        # f accumulator
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),        # g accumulator
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * n,
            bytes_accessed=m_pad * n * itemsize + (2 * m_pad + 2 * n) * 4,
            transcendentals=2 * m_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                24 << 20,
                int(2.5 * tm * n * itemsize) + tm * n * 4 + (8 << 20)),
        ),
        interpret=interpret,
    )(*operands)
    return d.reshape(m_pad)[:m], f[0, 0], g.reshape(n)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "variant", "precision"))
def fused_lstsq_gradmap(A, x, b, interpret: bool = False,
                        variant: str = "vpu",
                        precision=jax.lax.Precision.HIGHEST):
    """One-pass (d, f, g) for f(x) = ½‖Ax−b‖², real dense A stored as
    f32 or bf16 (bf16 tiles are upcast to f32 in-kernel after the
    half-byte DMA — the mixed-precision streaming path).

    Returns (d: (m,), f: scalar, g: (n,)).  ``variant``: "vpu" (default,
    exact f32 on the vector units) or "mxu" (matrix-unit matvecs at the
    given ``precision``).
    """
    m, n = A.shape
    itemsize = jnp.dtype(A.dtype).itemsize
    m_pad = _pad128(m)
    tm = _row_tile(m_pad, n, itemsize)
    x = x.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if m_pad != m:
        # Zero rows are exact: they contribute r_i = 0, hence nothing to
        # f or g.  XLA hoists this loop-invariant pad out of the solver's
        # while_loop, so it costs one copy per solve, not per iteration.
        A = jnp.pad(A, ((0, m_pad - m), (0, 0)))
        b = jnp.pad(b, (0, m_pad - m))
    x2 = x.reshape(1, n)

    if variant == "vpu":
        kernel = _kernel_vpu
        b2 = b.reshape(m_pad, 1)
        bd_spec = lambda: pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
        d_shape = (m_pad, 1)
    else:
        kernel = _make_kernel_mxu(precision)
        b2 = b.reshape(1, m_pad)
        bd_spec = lambda: pl.BlockSpec((1, tm), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        d_shape = (1, m_pad)

    grid = (m_pad // tm,)
    d, f, g = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),        # x row
            bd_spec(),                                    # b tile
            pl.BlockSpec((tm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # A tile
        ],
        out_specs=[
            bd_spec(),                                    # d tile
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),        # f accumulator
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),        # g accumulator
        ],
        out_shape=[
            jax.ShapeDtypeStruct(d_shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),       # g accumulator
            pltpu.SMEM((1, 1), jnp.float32),       # f accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * n,
            bytes_accessed=m_pad * n * itemsize + (2 * m_pad + 2 * n) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # double-buffered A tile + f32 intermediates (the MXU
            # HIGHEST 6-pass path holds several tile-sized temporaries:
            # measured scoped need 48.1 MB at (128, 16384) f32 — bare
            # tile math under-provisions and the kernel fails to
            # compile on a cold cache, hit twice on 2026-08-17) +
            # x/g/b/d rows + Mosaic stack headroom, capped inside the
            # 128 MB VMEM
            vmem_limit_bytes=min(
                100 << 20,
                2 * tm * n * itemsize + 4 * tm * n * 4 + (12 << 20)),
        ),
        interpret=interpret,
    )(x2, b2, A)
    return d.reshape(m_pad)[:m], f[0, 0], g.reshape(n)
