"""Serving-path recommendation — the measured regime map as code.

docs/PERF.md ("Serving regimes") records which execution path wins each
workload shape on the live chip; until now that knowledge lived only in
prose.  :func:`recommend_path` encodes the measured decision tree and
returns a :class:`ServingPlan` that names the winning path, explains
why, and can execute it.

The measured regimes (v5e, readback-barrier-subtracted; PERF.md):

* **Single solve, any size** → the whole-solve microsolver.  The XLA
  loop pays a per-iteration dispatch tail at every size; the one-launch
  kernel removes it entirely and won every measured single-solve row
  (TV 512²: 1.9–3.6x; TV 64²: 3.5x; LASSO 1000x2000: 7.1x).
* **Batch of LARGE problems** → ``microsolve_batch`` (vmap over the
  kernel = one launch with a leading grid axis).  Measured 512²x8:
  34.8 ms/image = 3.2x the vmapped XLA batch solver — vmapping does
  not amortize the dispatch tail at this size and every lane pays the
  slowest image's iteration count.
* **Batch of SMALL problems** → the vmapped XLA batch solver
  (:func:`~fasta_tpu.solver.make_batch_solver`).  Measured 64²x64:
  3.23 ms/image vs 5.70 for sequential grid steps — iterations are
  dispatch-tail-dominated, so cross-instance vectorization amortizes
  exactly what hurts the large-image batch.
* **Out-of-scope structure, f64, or full diagnostics** → the XLA loop
  (single) / vmapped batch solver (batched).  The microsolvers cover a
  fixed set of VMEM-resident f32 structures; the dense and planar
  kernels export the COMPLETE FastaResult contract (taus, residuals,
  backtracks, status, fvals, objectives, norm_residuals, iterates —
  each opt-in), the TV kernel everything but record_iterates (a 512²
  dual trajectory is ~4 GB).

The size crossover between the two batch paths is bracketed by NINE
measured configs (benchmarks/serving_r5.log, live 2026-08-20,
RTT-free chained timing for the sub-RTT dense rows; margins are
winner/loser per-solve wall):

    family   unknowns   batch   winner            margin
    pr16384       512       4   — tie —           1.06x
    pr16384       512      16   batch_solver      3.25x
    pr16384       512      64   batch_solver      3.85x
    lasso       2,000       8   — tie —           1.08x
    lasso       2,000      32   batch_solver      2.11x
    tv64        8,192      64   batch_solver      1.22x
    tv128      32,768       8   microsolve_batch  2.68x
    tv256     131,072       8   microsolve_batch  2.61x
    tv512     524,288       8   microsolve_batch  3.70x

Every config below the threshold picks the vmapped XLA batch solver
(decisively at batch ≥ 16, where cross-instance MXU batching bites; a
measured tie at tiny batches of small problems, where both paths are
launch-bound), and every config at or above it picks the kernel batch
by ≥ 2.6x — the 2¹⁵ = 32,768 threshold sits exactly on the measured
boundary (largest measured batch_solver win: 8,192 unknowns; smallest
measured kernel win: 32,768).  Margins under 1.25x are treated as ties
by the bench (chip state drifts ~1.2-1.5x between sessions).
``benchmarks/serving_bench.py`` re-asserts every row against live
measurements each full run.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .micro import microsolve_supported
from .options import FastaOptions
from .problem import Problem

__all__ = ["ServingPlan", "recommend_path", "BATCH_CROSSOVER_UNKNOWNS"]

# Bracketed by nine measured configs (module docstring table, live
# 2026-08-20): batch_solver wins every row at <= 8,192 unknowns,
# microsolve_batch every row at >= 32,768 — the threshold sits on the
# measured boundary (tv128's dual field is exactly 2*128*128 = 2**15).
BATCH_CROSSOVER_UNKNOWNS = 32_768


@dataclass
class ServingPlan:
    """A named execution path plus the measured rationale.

    ``run(...)`` executes the plan: for the batch paths pass the
    stacked measurement vectors ``bs`` (shape ``(B,) + b.shape``);
    keyword options are forwarded to the underlying path
    (:func:`~fasta_tpu.micro.microsolve` /
    :func:`~fasta_tpu.micro.microsolve_batch` kwargs for the kernel
    paths, a :class:`~fasta_tpu.options.FastaOptions` via ``options=``
    for the XLA paths).
    """

    path: str          # microsolve | microsolve_batch | batch_solver | xla
    reason: str        # one-line measured rationale
    problem: Problem
    batch_size: int

    def run(self, bs: Optional[Any] = None, **kwargs):
        if self.path == "microsolve":
            return self.problem.microsolve(**kwargs)
        if self.path == "microsolve_batch":
            if bs is None:
                raise ValueError("batched plan needs the stacked "
                                 "measurement vectors bs")
            return self.problem.microsolve_batch(bs, **kwargs)
        if self.path == "xla":
            return self.problem.solve(kwargs.pop("options", None),
                                      **kwargs)
        # vmapped XLA batch solver over the smooth term's data leaves
        if bs is None:
            raise ValueError("batched plan needs the stacked "
                             "measurement vectors bs")
        from .solver import make_batch_solver
        opts = kwargs.pop("options", None) or FastaOptions()
        tau0 = kwargs.pop("tau0", None) or self.problem.tau0
        if tau0 is None:
            from .solver import estimate_stepsize
            tau0_arr, _ = estimate_stepsize(
                self.problem.op, self.problem.fterm,
                jnp.asarray(self.problem.x0), key=0)
            tau0 = float(tau0_arr)
        if kwargs:
            raise ValueError(f"batch_solver path takes options=/tau0= "
                             f"only, got {sorted(kwargs)}")
        fterm = self.problem.fterm
        leaves = jax.tree_util.tree_leaves(fterm)
        if len(leaves) != 1:
            raise ValueError(
                f"batch_solver plan batches the smooth term's single "
                f"data leaf; {type(fterm).__name__} has {len(leaves)} "
                f"leaves — build the batched term yourself and call "
                f"make_batch_solver directly")
        bterm = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(fterm), [jnp.asarray(bs)])
        solve = make_batch_solver(opts, in_axes=(None, 0, None, None,
                                                 None))
        return solve(self.problem.op, bterm, self.problem.gterm,
                     jnp.asarray(self.problem.x0),
                     jnp.asarray(tau0, jnp.float32))


def recommend_path(problem: Problem, batch_size: int = 1, *,
                   need_full_diagnostics: bool = False) -> ServingPlan:
    """Pick the measured-best serving path for ``problem`` at
    ``batch_size`` (the module docstring is the measured regime map).

    Static metadata decision — no compilation, no device work.
    ``need_full_diagnostics`` forces the XLA paths (only the TV
    kernel lacks anything — record_iterates; dense and planar export
    the complete contract; micro.py).
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    supported, why = microsolve_supported(problem)
    dtype = jnp.result_type(jnp.asarray(problem.x0).dtype)
    f32 = dtype in (jnp.float32, jnp.complex64)

    if need_full_diagnostics or not supported or not f32:
        cause = ("full diagnostics requested (the TV kernel lacks "
                 "record_iterates)" if need_full_diagnostics
                 else (f"no whole-solve kernel: {why}" if not supported
                       else f"{np.dtype(dtype).name} solve (kernels are "
                            f"f32)"))
        if batch_size == 1:
            return ServingPlan("xla", f"XLA loop — {cause}", problem,
                               batch_size)
        return ServingPlan("batch_solver",
                           f"vmapped XLA batch solver — {cause}",
                           problem, batch_size)

    if batch_size == 1:
        return ServingPlan(
            "microsolve",
            "whole-solve kernel — wins every measured single-solve row "
            "(no per-iteration dispatch tail; PERF.md serving table)",
            problem, batch_size)

    n_unknowns = int(np.prod(np.shape(problem.x0)))
    if n_unknowns >= BATCH_CROSSOVER_UNKNOWNS:
        return ServingPlan(
            "microsolve_batch",
            f"one-launch kernel batch — {n_unknowns} unknowns >= "
            f"{BATCH_CROSSOVER_UNKNOWNS} crossover; vmapping the XLA "
            f"loop does not amortize the dispatch tail at this size "
            f"(measured 2.6-3.7x at every config >= the threshold, "
            f"serving.py evidence table)",
            problem, batch_size)
    return ServingPlan(
        "batch_solver",
        f"vmapped XLA batch solver — {n_unknowns} unknowns < "
        f"{BATCH_CROSSOVER_UNKNOWNS} crossover; small-problem "
        f"iterations are dispatch-tail-dominated, so cross-instance "
        f"vectorization wins (measured 2.1-3.9x at batch >= 16, a tie "
        f"within 1.1x at tiny batches — serving.py evidence table)",
        problem, batch_size)
