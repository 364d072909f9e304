"""TPU-native FASTA solver core (capability C1/C4/C5/C8, SURVEY.md §2.1).

The entire forward-backward splitting engine — gradient step, prox step,
nonmonotone backtracking line search, adaptive Barzilai–Borwein (spectral)
stepsize with the Zhou–Gao–Dai hybrid rule, FISTA acceleration with
O'Donoghue–Candès adaptive restart, selectable stopping rules, and full
per-iteration diagnostics — compiled as ONE ``jax.lax.while_loop`` under
``jax.jit`` with **zero host round-trips**: stepsize and stopping decisions
are device scalars, diagnostics land in preallocated device arrays via
indexed updates, and under a sharded mesh every reduction
(⟨Δx,Δg⟩, ‖·‖², f-values) lowers to an XLA ``psum`` so all devices make
identical decisions (SURVEY.md §2.3/§5).

TPU-first design choices:

  * The operator AND both objective terms are **pytree arguments** of the
    jitted solve — problem data is never a trace constant, so (a) new
    instances with the same shapes reuse the compiled executable, and
    (b) each array carries an explicit ``NamedSharding`` onto the mesh.
  * All of ``FastaOptions`` is static: each mode compiles to its own
    minimal loop body, no runtime mode switches.
  * Cost per iteration: two A/Aᴴ matvecs — the gradient at the accepted
    iterate doubles as the next iteration's starting gradient (the reuse
    noted in SURVEY.md §3.1) — plus one forward matvec per backtracking
    trial.  The FISTA extrapolation exploits linearity (A y formed by the
    same affine combination as y): no extra matvec.

Iteration math is **identical** (same update order, same formulas, same
guard constants) to the float64 oracle ``reference_oracle/fasta_numpy.py``
— the in-repo algorithm spec standing in for the unmountable upstream
(SURVEY.md §0) — so trajectories agree within fp tolerance; the parity
tests in ``tests/parity/`` enforce this per-iteration.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import precision as prec
from .operators import LinearOp, as_linear_op
from .options import FastaOptions
from .terms import ProxTerm, SmoothTerm, as_prox_term, as_smooth_term

__all__ = [
    "fasta", "solve", "make_solver", "make_stateful_solver",
    "resume_state", "make_batch_solver", "solve_path",
    "estimate_stepsize", "FastaResult", "DeviceResult", "SolverState",
    "Diagnostics",
]


def _redot(a, b):
    """Re⟨a, b⟩ over arbitrary-shape (possibly complex) arrays — the
    complex-safe inner product every stepsize/stopping decision uses.
    Shape-preserving (no vdot/ravel): flattening a sharded multi-axis
    array forces an all-gather under GSPMD, while an elementwise
    multiply + all-axes reduce partitions into one psum."""
    return jnp.real(jnp.sum(jnp.conj(a) * b))


def _norm2(a):
    return jnp.real(jnp.sum(jnp.conj(a) * a))


def _norm(a):
    return jnp.sqrt(_norm2(a))


class Diagnostics(NamedTuple):
    """Per-iteration recordings (preallocated, device-side; C5)."""
    residuals: Any
    norm_residuals: Any
    taus: Any
    fvals: Any
    objectives: Any        # None unless record_objective
    backtracks: Any
    iterates: Any          # None unless record_iterates


class SolverState(NamedTuple):
    """The while_loop carry — the full solver state as a pytree.

    Serializable with any pytree checkpointer (e.g. orbax) for free
    resume (SURVEY.md §5 checkpoint/resume)."""
    k: Any                 # iteration counter (int32)
    stop: Any              # convergence flag (bool)
    x1: Any                # current search point (y_k in FISTA terms)
    gradf1: Any            # Aᴴ ∇f(A x1)
    tau1: Any              # stepsize entering the iteration
    fwin: Any              # nonmonotone window ring buffer (length W)
    solution: Any          # solver solution (oracle semantics, see body)
    best_x: Any            # best-objective iterate so far
    min_objective: Any
    max_residual: Any
    total_bt: Any
    accel: Any             # (x_accel1, d_accel1, alpha1) or None
    nonfinite: Any         # sanitizer flag (guard_nonfinite)
    diags: Diagnostics


class DeviceResult(NamedTuple):
    """Raw jit output — everything stays on device (benchmark-friendly)."""
    solution: Any
    best_iterate: Any
    iteration_count: Any
    converged: Any
    residuals: Any
    norm_residuals: Any
    taus: Any
    fvals: Any
    objectives: Any
    backtracks: Any
    total_backtracks: Any
    iterates: Any
    nonfinite: Any


@dataclass
class FastaResult:
    """Host-side result with trimmed diagnostic arrays — mirrors the
    oracle's ``FastaResult`` field for field (reference outputs per
    arXiv:1501.04979 §5).

    ``solve_time`` is wall clock around the jitted call and INCLUDES XLA
    compilation when the (options, shapes) pair is cold — tens of
    seconds on a remote TPU.  It is not comparable to the oracle's
    solve_time on a cold cache; benchmarks use ``make_solver`` +
    warm-up + host-readback timing instead (benchmarks/run.py)."""
    solution: np.ndarray
    best_iterate: np.ndarray
    iteration_count: int
    converged: bool
    residuals: np.ndarray
    norm_residuals: np.ndarray
    taus: np.ndarray
    fvals: np.ndarray
    objectives: Optional[np.ndarray]
    backtracks: np.ndarray
    total_backtracks: int
    solve_time: float
    L_estimate: Optional[float]
    initial_tau: float
    iterates: Optional[np.ndarray] = None
    nonfinite: bool = False


def estimate_stepsize(op: LinearOp, fterm: SmoothTerm, x0, key,
                      points: Optional[tuple] = None) -> tuple:
    """C8: Lipschitz/initial-stepsize estimation from two random points:
    L ≈ ‖∇f̃(z₁)−∇f̃(z₂)‖/‖z₁−z₂‖ with ∇f̃(x) = Aᴴ∇f(Ax), τ₀ = (2/L)/10
    (the reference's convention; oracle fasta_numpy.py C8 block).

    ``points=(z1, z2)`` bypasses the JAX RNG with caller-supplied
    estimation points — generate them once in NumPy and feed the same
    pair to the oracle's ``est_points`` for auto-τ₀ trajectory parity
    (SURVEY.md §7 hard part 5)."""
    x0 = jnp.asarray(x0)
    if points is not None:
        z1 = jnp.asarray(points[0], x0.dtype)
        z2 = jnp.asarray(points[1], x0.dtype)
    else:
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        k1, k2 = jax.random.split(key)
        if jnp.issubdtype(x0.dtype, jnp.complexfloating):
            def rnd(k):
                ka, kb = jax.random.split(k)
                return (jax.random.normal(ka, x0.shape)
                        + 1j * jax.random.normal(kb, x0.shape)
                        ).astype(x0.dtype)
        else:
            def rnd(k):
                return jax.random.normal(k, x0.shape, x0.dtype)
        z1, z2 = rnd(k1), rnd(k2)
    g1 = op.rmatvec(fterm.grad(op(z1)))
    g2 = op.rmatvec(fterm.grad(op(z2)))
    L = _norm(g1 - g2) / jnp.maximum(_norm(z2 - z1), 1e-30)
    L = jnp.maximum(L, 1e-6)
    return 2.0 / L / 10.0, L


def _real_dtype(dtype):
    # computed host-side (numpy): an eager device `.real` is not
    # supported on all backends (e.g. the tunneled TPU)
    return np.zeros((), dtype).real.dtype


def _make_solve_fn(opts: FastaOptions, with_state: bool = False,
                   resume: bool = False):
    """Build the traced solve fn -> DeviceResult.

    ``with_state=True`` additionally returns the final ``SolverState``
    (for exact mid-run checkpointing).  ``resume=True`` changes the
    signature to ``solve(op, fterm, gterm, state)``: the while_loop
    continues from the given carry instead of initializing from x0 —
    the SAME loop body, so the continuation is bit-identical to the
    uninterrupted run (SURVEY.md §5 checkpoint/resume)."""
    W = opts.window
    shrink_f = opts.shrink_factor
    accelerated = opts.accelerate
    adaptive = opts.adaptive and not opts.accelerate   # oracle precedence

    def solve(op: LinearOp, fterm: SmoothTerm, gterm: ProxTerm,
              *args) -> DeviceResult:
        if resume:
            (state0,) = args
            x0 = jnp.asarray(state0.x1)
            rdt = _real_dtype(x0.dtype)
        else:
            x0, tau0 = args
            x0 = jnp.asarray(x0)
            rdt = _real_dtype(x0.dtype)
            tau0 = jnp.asarray(tau0, rdt)

        # High-precision decision scalars (SURVEY.md §7 hard part 3):
        # below float64, every stepsize/backtracking/stopping reduction
        # runs in double-word arithmetic (fasta_tpu/precision.py) so the
        # f32 trajectory tracks the f64 oracle's decisions instead of
        # stalling on reduction noise (round-1 VERDICT item 1).
        hp = (opts.precision == "high"
              or (opts.precision == "auto"
                  and np.dtype(rdt) == np.float32))

        # Only the CANCELLATION-PRONE scalars run in double-word: the
        # f-values/window (f1 − M resolves below f32 ulp), ⟨Δx,∇f(y)⟩
        # (backtracking), ⟨Δx,Δg⟩ (BB numerator) and the restart dot —
        # these have mixed signs and near-total cancellation at
        # convergence.  Positive sums (‖Δx‖², ‖Δg‖², the normalizer
        # norms) carry no cancellation: plain f32 tree sums are ~1e-6
        # relative, harmless for stepsizes/stopping, and each avoided dd
        # reduction saves a dispatch on the latency-bound loop.
        def fval(d):
            """f(d): DD pair under hp, plain rdt scalar otherwise."""
            return fterm.value_dd(d) if hp else fterm.value(d).astype(rdt)

        def f_collapse(fv):
            return prec.dd_to_float(fv) if hp else fv

        # Optional fused one-pass (d, f, Aᴴ∇f) evaluation (TPU hot path).
        fused = fterm.fused_gradmap(op) if opts.fuse else None
        # Zero-matvec FISTA gradient extrapolation: valid when ∇f is
        # affine in d AND the gradient at the prox point comes free from
        # the fused pass.
        affine_accel = (accelerated and fused is not None
                        and fterm.grad_affine)

        d0 = op(x0)     # on resume: only the value_parts probe below
        # Fused dd-scalar reduction eligibility (static, decided at
        # trace time): hp_fuse — the term decomposes its value
        # elementwise, so f and the backtracking dot share one variadic
        # reduce; hp_fuse_bb — the trial gradient rides along in the
        # fused operator pass, so the BB numerator joins it too.
        hp_fuse = hp and fterm.value_parts(d0) is not None
        hp_fuse_bb = hp_fuse and adaptive and fused is not None

        if resume:
            # the carry IS the checkpoint — the probe matvec above is
            # dead code XLA eliminates
            state = state0
        else:
            f0 = fval(d0)
            gradf0 = op.rmatvec(fterm.grad(d0))

            if hp:
                fwin = prec.DD(
                    jnp.full((W,), -jnp.inf, rdt).at[0].set(f0.hi),
                    jnp.zeros((W,), rdt).at[0].set(f0.lo))
            else:
                fwin = jnp.full((W,), -jnp.inf, rdt).at[0].set(f0)

            if opts.record_diagnostics:
                diags = Diagnostics(
                    residuals=jnp.zeros((opts.max_iters,), rdt),
                    norm_residuals=jnp.zeros((opts.max_iters,), rdt),
                    taus=jnp.zeros((opts.max_iters,), rdt),
                    fvals=jnp.zeros((opts.max_iters,), rdt),
                    objectives=(jnp.zeros((opts.max_iters,), rdt)
                                if opts.record_objective else None),
                    backtracks=jnp.zeros((opts.max_iters,), jnp.int32),
                    iterates=(jnp.zeros((opts.max_iters,) + x0.shape,
                                        x0.dtype)
                              if opts.record_iterates else None),
                )
            else:
                # LEAN mode: no per-iteration recording — the loop body
                # carries no diagnostic arrays and pays no
                # dynamic-update-slice kernels (latency-bound serving)
                diags = Diagnostics(None, None, None, None, None, None,
                                    None)

            state = SolverState(
                k=jnp.zeros((), jnp.int32),
                stop=jnp.zeros((), jnp.bool_),
                x1=x0,
                gradf1=gradf0,
                tau1=tau0,
                fwin=fwin,
                solution=x0,
                best_x=x0,
                min_objective=jnp.asarray(jnp.inf, rdt),
                max_residual=jnp.asarray(-jnp.inf, rdt),
                total_bt=jnp.zeros((), jnp.int32),
                accel=(((x0, d0, gradf0, jnp.ones((), rdt)) if affine_accel
                        else (x0, d0, jnp.ones((), rdt)))
                       if accelerated else None),
                nonfinite=jnp.zeros((), jnp.bool_),
                diags=diags,
            )

        def cond(s: SolverState):
            return (s.k < opts.max_iters) & (~s.stop)

        def body(s: SolverState) -> SolverState:
            x0_, gradf0_, tau = s.x1, s.gradf1, s.tau1

            # 1–3: forward (gradient) step, backward (prox) step.  With a
            # fused gradmap the gradient at the trial point rides along in
            # the same operator pass (grad1); otherwise it is evaluated
            # lazily in the mode update below.
            #
            # hp: the trial's double-word decision scalars — f(d₁), the
            # backtracking dot ⟨Δx,∇f(y)⟩ and (when the gradient rides
            # along) the BB numerator ⟨Δx,Δg⟩ — are fused into ONE
            # variadic compound reduce (precision.reduce_dd_many).  Each
            # compound reduce is its own ~2–3 µs kernel dispatch on the
            # latency-bound v5e loop, so 3 → 1 recovers most of the hp
            # path's per-iteration overhead; values are identical to the
            # separate reductions up to zero-padding.
            def fb_step(tau):
                x1hat = x0_ - tau * gradf0_
                x1 = gterm.prox(x1hat, tau)
                Dx = x1 - x0_
                if fused is not None:
                    d1, f1, grad1 = fused(x1)
                    f1 = f1.astype(rdt)
                else:
                    d1 = op(x1)
                    grad1 = None
                    f1 = None
                btdot = bbdot = None
                if hp:
                    if hp_fuse:
                        streams = [fterm.value_parts(d1)]
                        if opts.backtrack:
                            streams.append(prec.dot_parts(Dx, gradf0_))
                        if hp_fuse_bb:
                            Dg = grad1 + (x1hat - x0_) / tau
                            streams.append(prec.dot_parts(Dx, Dg))
                        sums = prec.reduce_dd_many(streams)
                        f1 = sums[0]
                        if opts.backtrack:
                            btdot = sums[1]
                        if hp_fuse_bb:
                            bbdot = sums[-1]
                    else:
                        # dd re-reduction over d1 (O(m) elementwise —
                        # negligible next to the matvec it rode in on)
                        f1 = fval(d1)
                elif f1 is None:
                    f1 = fval(d1)
                return x1hat, x1, Dx, d1, f1, grad1, btdot, bbdot

            x1hat, x1, Dx, d1, f1, grad1, btdot, bbdot = fb_step(tau)
            bt = jnp.zeros((), jnp.int32)

            # 4: nonmonotone backtracking line search (Zhang–Hager window)
            if opts.backtrack:
                M = prec.dd_max(s.fwin) if hp else jnp.max(s.fwin)

                def bt_cond(c):
                    (tau_c, _x1hat, _x1, Dx_c, _d1, f1_c, _g1,
                     btdot_c, _bb, bt_c) = c
                    if hp:
                        # Backtracking slack: the oracle uses an absolute
                        # 1e-12 (float64 noise floor).  Under f32 STORAGE
                        # the true f(prox(y−τg)) can genuinely exceed the
                        # window max by O(eps32)·scale — the iterates
                        # themselves are rounded — so the hp path adds a
                        # relative term at the f32 noise floor; otherwise
                        # the final iterations burn max_backtracks futile
                        # trials (tau collapse).  Recomputed from the
                        # CURRENT trial's f1 (both scalars are already in
                        # the carry): a shrunken-tau trial whose f grows
                        # past the first trial's scale keeps a correctly
                        # scaled slack.
                        slack = 1e-12 + (64.0 * np.finfo(np.float32).eps) \
                            * (jnp.abs(M.hi)
                               + jnp.abs(prec.dd_to_float(f1_c)))
                        # ⟨Δx,∇f(y)⟩ cancels (descent direction) → dd
                        # (fused into the trial's single compound reduce
                        # when the term decomposes); ‖Δx‖²/(2τ) is a
                        # positive sum → plain f32 lifted exactly.
                        q = _norm2(Dx_c) / (2.0 * tau_c)
                        dotv = (btdot_c if hp_fuse
                                else prec.dot_dd(Dx_c, gradf0_))
                        suff = prec.dd_add(M, prec.dd_add(
                            dotv, prec.dd(q)))
                        viol = prec.dd_to_float(
                            prec.dd_sub(f1_c, suff)) > slack
                    else:
                        suff = (M + _redot(Dx_c, gradf0_)
                                + _norm2(Dx_c) / (2.0 * tau_c))
                        viol = f1_c - 1e-12 > suff
                    return viol & (bt_c < opts.max_backtracks)

                def bt_body(c):
                    tau_c, *_, bt_c = c
                    tau_n = tau_c * shrink_f
                    return (tau_n,) + fb_step(tau_n) + (bt_c + 1,)

                (tau, x1hat, x1, Dx, d1, f1, grad1, btdot, bbdot,
                 bt) = jax.lax.while_loop(
                    bt_cond, bt_body,
                    (tau, x1hat, x1, Dx, d1, f1, grad1, btdot, bbdot, bt))

            # 5: residuals, diagnostics, best-iterate tracking (C4/C5).
            # Norms are positive sums — plain working precision in every
            # mode (see the hp note above).
            res = _norm(Dx) / tau
            max_res = jnp.maximum(s.max_residual, res)
            normalizer = (jnp.maximum(_norm(gradf0_), _norm(x1 - x1hat) / tau)
                          + opts.eps_n)
            nres = res / normalizer

            k = s.k
            d_ = s.diags
            f1_f = f_collapse(f1)
            obj = (f1_f + gterm.value(x1).astype(rdt)
                   if opts.record_objective else None)
            if opts.record_diagnostics:
                new_diags = Diagnostics(
                    residuals=d_.residuals.at[k].set(res),
                    norm_residuals=d_.norm_residuals.at[k].set(nres),
                    taus=d_.taus.at[k].set(tau),
                    fvals=d_.fvals,      # written post-mode-update below
                    objectives=(d_.objectives.at[k].set(obj)
                                if opts.record_objective else None),
                    backtracks=d_.backtracks.at[k].set(bt),
                    iterates=(d_.iterates.at[k].set(x1)
                              if opts.record_iterates else None),
                )
            else:
                new_diags = d_

            new_obj = obj if opts.record_objective else res
            better = new_obj < s.min_objective
            min_obj = jnp.where(better, new_obj, s.min_objective)
            best_x = jnp.where(better, x1, s.best_x)

            if opts.verbose:
                jax.debug.print(
                    "[fasta-tpu] iter {k}  tau {t:.3e}  resid {r:.3e}  "
                    "nresid {n:.3e}  f {f:.6e}  bt {b}",
                    k=k, t=tau, r=res, n=nres, f=f1_f, b=bt)

            # stopping rule (static selection; oracle-identical formulas)
            if opts.stop_rule == "residual":
                stop = res < opts.tol
            elif opts.stop_rule == "normalized_residual":
                stop = nres < opts.tol
            elif opts.stop_rule == "ratio_residual":
                stop = res / (max_res + opts.eps_r) < opts.tol
            elif opts.stop_rule == "hybrid_residual":
                stop = ((res / (max_res + opts.eps_r) < opts.tol)
                        | (nres < opts.tol))
            else:  # "iterations"
                stop = jnp.zeros((), jnp.bool_)

            # custom stopping hook (reference stopNow analog)
            if opts.stop_fn is not None:
                stop = stop | opts.stop_fn(k, res, nres, max_res, f1_f)

            # sanitizer: stop on NaN/Inf rather than iterating on garbage
            if opts.guard_nonfinite:
                bad = ~(jnp.isfinite(f1_f) & jnp.isfinite(res))
                stop = stop | bad
            else:
                bad = s.nonfinite    # stays False

            # 6/7: mode-specific next-point update.  Computed even on the
            # stopping iteration (the loop exits before using it) — keeps
            # the body branch-free; costs one matvec on the final iter.
            if adaptive:
                gradf1 = grad1 if fused is not None \
                    else op.rmatvec(fterm.grad(d1))
                Dg = gradf1 + (x1hat - x0_) / tau       # == gradf1 - gradf0
                # ⟨Δx,Δg⟩ is the classic cancellation victim near
                # convergence → dd under hp (carried from the accepted
                # trial's fused reduce when available); ‖Δx‖²/‖Δg‖² are
                # positive sums → plain precision everywhere.
                if hp_fuse_bb:
                    dotprod = prec.dd_to_float(bbdot)
                elif hp:
                    dotprod = prec.dd_to_float(prec.dot_dd(Dx, Dg))
                else:
                    dotprod = _redot(Dx, Dg)
                nDx2 = _norm2(Dx)
                nDg2 = _norm2(Dg)
                tau_s = jnp.where(dotprod != 0.0, nDx2 / dotprod, jnp.inf)
                tau_m = jnp.maximum(
                    jnp.where(nDg2 > 0.0, dotprod / nDg2, 0.0), 0.0)
                tau_next = jnp.where(2.0 * tau_m > tau_s,
                                     tau_m, tau_s - 0.5 * tau_m)
                bb_degenerate = ((tau_next <= 0.0) | jnp.isinf(tau_next)
                                 | jnp.isnan(tau_next))
                tau_next = jnp.where(bb_degenerate, tau * 1.5, tau_next)
                x_next, gradf_next, accel_next = x1, gradf1, None
            elif accelerated:
                if affine_accel:
                    x_accel0, d_accel0, gradfx_accel0, alpha0 = s.accel
                else:
                    x_accel0, d_accel0, alpha0 = s.accel
                # O'Donoghue–Candès gradient-based adaptive restart
                if opts.restart:
                    rdot = (prec.dd_to_float(
                                prec.dot_dd(x0_ - x1, x1 - x_accel0))
                            if hp else _redot(x0_ - x1, x1 - x_accel0))
                    rst = rdot > 0.0
                    alpha0 = jnp.where(rst, jnp.ones((), rdt), alpha0)
                alpha1 = (1.0 + jnp.sqrt(1.0 + 4.0 * alpha0 ** 2)) / 2.0
                beta = ((alpha0 - 1.0) / alpha1).astype(rdt)
                x_next = x1 + beta * (x1 - x_accel0)
                d_next = d1 + beta * (d1 - d_accel0)    # A is linear
                if affine_accel:
                    # ∇f affine in d  ⇒  Aᴴ∇f(d) is affine in d too, so
                    # the extrapolated gradient map is the same affine
                    # combination — zero extra matvecs per iteration.
                    gradf_next = grad1 + beta * (grad1 - gradfx_accel0)
                    accel_next = (x1, d1, grad1, alpha1)
                else:
                    gradf_next = op.rmatvec(fterm.grad(d_next))
                    accel_next = (x1, d1, alpha1)
                tau_next = tau
                # The nonmonotone window must see f at the NEXT search
                # point — the extrapolated y, NOT the prox point — or
                # f(y) can sit above the window max and backtracking
                # collapses tau to zero (descent-lemma termination needs
                # the window to dominate f at the expansion point).
                # O(m) elementwise; no matvec.  On a converged stop the
                # loop exits, so the prox-point value is recorded
                # (oracle break semantics).
                f_next = fval(d_next)
                f_record = (prec.dd_where(stop, f1, f_next) if hp
                            else jnp.where(stop, f1, f_next))
            else:
                gradf_next = grad1 if fused is not None \
                    else op.rmatvec(fterm.grad(d1))
                tau_next = tau
                x_next, accel_next = x1, None

            if not accelerated:
                f_record = f1
            if hp:
                idx = (k + 1) % W
                fwin = prec.DD(s.fwin.hi.at[idx].set(f_record.hi),
                               s.fwin.lo.at[idx].set(f_record.lo))
            else:
                fwin = s.fwin.at[(k + 1) % W].set(f_record)
            if opts.record_diagnostics:
                new_diags = new_diags._replace(
                    fvals=new_diags.fvals.at[k].set(f_collapse(f_record)))

            # Oracle solution semantics: on a converged stop the loop
            # breaks at the prox iterate; at max-iters exhaustion the last
            # body completes, so (in accelerated mode) the extrapolated
            # point is returned.  jnp.where keeps both paths device-side.
            solution = jnp.where(stop, x1, x_next) if accelerated else x1

            return SolverState(
                k=k + 1, stop=stop, x1=x_next, gradf1=gradf_next,
                tau1=tau_next, fwin=fwin, solution=solution, best_x=best_x,
                min_objective=min_obj, max_residual=max_res,
                total_bt=s.total_bt + bt, accel=accel_next,
                nonfinite=bad, diags=new_diags)

        final = jax.lax.while_loop(cond, body, state)

        result = DeviceResult(
            solution=final.solution,
            best_iterate=final.best_x,
            iteration_count=final.k,
            converged=final.stop & ~final.nonfinite,
            residuals=final.diags.residuals,
            norm_residuals=final.diags.norm_residuals,
            taus=final.diags.taus,
            fvals=final.diags.fvals,
            objectives=final.diags.objectives,
            backtracks=final.diags.backtracks,
            total_backtracks=final.total_bt,
            iterates=final.diags.iterates,
            nonfinite=final.nonfinite,
        )
        if with_state:
            return result, final
        return result

    return solve


class _LRUCache:
    """Bounded executable cache.  Unbounded per-(options, env) dicts leak
    compiled executables in a service that cycles option sets (round-2
    VERDICT weak #5); a small LRU keeps the steady-state hit rate of the
    common case (a handful of option sets reused many times) while
    capping growth.  Evicting an entry only drops this module's
    reference to the ``jax.jit`` wrapper — a later miss rebuilds it and
    retraces (the persistent XLA compile cache, when configured, makes
    the recompile a disk hit)."""

    def __init__(self, capacity: int = 32):
        from collections import OrderedDict
        self.capacity = capacity
        self._d = OrderedDict()

    def get(self, key):
        fn = self._d.get(key)
        if fn is not None:
            self._d.move_to_end(key)
        return fn

    def put(self, key, fn):
        self._d[key] = fn
        self._d.move_to_end(key)
        while len(self._d) > self.capacity:
            self._d.popitem(last=False)

    def __len__(self):
        return len(self._d)

    def clear(self):
        self._d.clear()


_SOLVER_CACHE = _LRUCache()


def _cache_key(opts: FastaOptions):
    """Executable-cache key: options + every env var read at trace time
    (the Pallas opt-in and dd-impl selectors are consulted inside
    fused_gradmap/precision during tracing — they must key EVERY cache
    of a traced solver, or toggling them would silently reuse the other
    path's executable).  Single source of truth for make_solver and
    solve_path."""
    import os
    return (opts, os.environ.get("FASTA_TPU_PALLAS", "auto"),
            os.environ.get("FASTA_TPU_DD_IMPL", "reduce"))


def _cached_jit(kind: str, opts: FastaOptions, build):
    key = (kind,) + _cache_key(opts)
    fn = _SOLVER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(build())
        _SOLVER_CACHE.put(key, fn)
    return fn


def make_solver(opts: FastaOptions):
    """Return the jit-compiled
    ``solve(op, fterm, gterm, x0, tau0) -> DeviceResult``.

    One compiled executable serves every problem with the same options
    and array shapes/structures — the operator and both objective terms
    are pytree arguments, not trace constants.
    """
    return _cached_jit("solve", opts, lambda: _make_solve_fn(opts))


def make_stateful_solver(opts: FastaOptions):
    """Like :func:`make_solver` but returning ``(DeviceResult,
    SolverState)`` — the final while_loop carry, a plain pytree that
    :func:`fasta_tpu.checkpoint.save_pytree` serializes and
    :func:`resume_state` continues BIT-IDENTICALLY (same loop body,
    same executable class; SURVEY.md §5 'SolverState as a pytree …
    free resume')."""
    return _cached_jit("solve_state", opts,
                       lambda: _make_solve_fn(opts, with_state=True))


def _check_resume_diags(state: SolverState, opts: FastaOptions):
    d = state.diags
    for optname, arr, want in (("record_diagnostics", d.taus,
                                opts.record_diagnostics),
                               ("record_objective", d.objectives,
                                opts.record_objective),
                               ("record_iterates", d.iterates,
                                opts.record_iterates)):
        if (arr is None) == bool(want):
            raise ValueError(
                f"resume_state: options.{optname}={want} does not match "
                f"the checkpointed state (which "
                f"{'has' if arr is not None else 'lacks'} that "
                f"recording); resume with the recording options the run "
                f"was saved under")


def resume_state(op: LinearOp, fterm: SmoothTerm, gterm: ProxTerm,
                 state: SolverState,
                 opts: Optional[FastaOptions] = None):
    """Continue a checkpointed solve EXACTLY from its ``SolverState``.

    ``state`` is the carry returned by :func:`make_stateful_solver` (or
    loaded back via ``checkpoint.load_pytree``): the nonmonotone window,
    FISTA momentum, BB stepsize, best-iterate tracking and diagnostics
    cursor all continue, so the resumed trajectory equals the
    uninterrupted run bit-for-bit (unlike ``checkpoint.resume``, which
    warm-restarts from (x, τ) and rebuilds window/momentum).

    ``opts.max_iters`` is the TOTAL iteration budget (the loop counter
    continues from ``state.k``); diagnostics arrays are zero-padded up
    to it.  All other options must match the original run — they select
    the loop body.  Returns ``(DeviceResult, SolverState)``.
    """
    opts = opts or FastaOptions()
    _check_resume_diags(state, opts)
    n = opts.max_iters

    def pad(a):
        a = jnp.asarray(a)
        if a.shape[0] > n:
            raise ValueError(
                f"resume_state: opts.max_iters={n} is shorter than the "
                f"checkpoint's recorded diagnostics ({a.shape[0]}); "
                f"max_iters is the TOTAL budget including completed "
                f"iterations")
        if a.shape[0] == n:
            return a
        return jnp.pad(a, ((0, n - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))

    state = jax.tree_util.tree_map(jnp.asarray, state)
    state = state._replace(
        diags=jax.tree_util.tree_map(pad, state.diags))
    fn = _cached_jit("resume", opts,
                     lambda: _make_solve_fn(opts, with_state=True,
                                            resume=True))
    return fn(op, fterm, gterm, state)


def solve(op: LinearOp, fterm: SmoothTerm, gterm: ProxTerm, x0, tau0,
          opts: Optional[FastaOptions] = None) -> DeviceResult:
    """Device-side solve — thin wrapper over ``make_solver``."""
    return make_solver(opts or FastaOptions())(op, fterm, gterm, x0, tau0)


def make_batch_solver(opts: FastaOptions, in_axes):
    """vmap'd solver: solve a whole family of instances in one compiled
    executable — e.g. a regularization-path sweep (μ batched in the prox
    term) or many right-hand sides (b batched in the smooth term).

    ``in_axes`` is the vmap axis spec for ``(op, fterm, gterm, x0,
    tau0)`` — pytree prefixes work, e.g.
    ``(None, None, L1Norm(0), None, None)`` to sweep μ only.
    A TPU-native capability with no reference analog: the batch runs as
    one fused program, saturating the chip with small instances; the
    batched ``lax.while_loop`` freezes converged instances until the
    last one stops.
    """
    fn = _make_solve_fn(opts)
    return jax.jit(jax.vmap(fn, in_axes=in_axes))


_PATH_CACHE = _LRUCache()


def solve_path(op, fterm, gterms, x0, tau0,
               opts: Optional[FastaOptions] = None) -> "DeviceResult":
    """Warm-started regularization path (continuation / homotopy).

    ``gterms`` is a prox term whose array leaves carry a leading PATH
    axis — e.g. ``L1Norm(jnp.array([0.3, 0.1, 0.03]))``, strongest
    penalty first.  The solves run in order as one jitted ``lax.scan``:
    each starts from the previous solution and its last accepted
    stepsize.  Returns a :class:`DeviceResult` whose every field is
    stacked along the path axis.

    Complements :func:`make_batch_solver` (independent COLD solves in
    parallel vmap lanes): continuation trades lane parallelism for
    fewer total iterations when adjacent path solutions are close — the
    classic LASSO μ-path recipe, entirely on device with one compile.

    Stopping-rule note: the default ``hybrid_residual`` rule normalizes
    by the max residual seen within a solve; a warm start makes that
    max small, so the relative criterion tightens and can eat the
    warm-start iteration win (measured: plain FBS path 289 vs 388 cold
    iterations under ``stop_rule="residual"``, but roughly even under
    the hybrid rule).  For paths, prefer ``residual`` /
    ``normalized_residual`` or interpret per-μ counts accordingly.
    """
    opts = opts or FastaOptions()
    if not opts.record_diagnostics:
        raise ValueError("solve_path warm-starts each leg from the "
                         "previous recorded taus; record_diagnostics "
                         "must stay True")
    key = _cache_key(opts)
    path_fn = _PATH_CACHE.get(key)
    if path_fn is None:
        fn = _make_solve_fn(opts)

        def run(op, fterm, gterms, x0, tau0):
            rdt = jnp.real(jnp.zeros((), jnp.asarray(x0).dtype)).dtype

            # tau continuation is mode-dependent.  Near convergence the
            # line search shrinks tau (dx → 0 forbids decrease: partial
            # shrinks on the penultimate iterations, a full
            # shrink^max_backtracks exhaustion on the final one), so the
            # trailing recorded taus are endgame artifacts, not cruise
            # stepsizes.  BB/adaptive re-estimates tau from the first
            # secant, so carrying the last genuinely ACCEPTED tau is
            # safe and warm.  Modes where tau is monotone non-increasing
            # (FISTA, plain FBS with backtracking) can never recover a
            # too-small carry — shrinkage would compound across path
            # points (measured: 0.05 → 0.01 → 1.6e-5, 15x the cold
            # iteration count) — so they warm-start x ONLY and reset tau
            # to the caller's tau0 (L is penalty-independent).  The
            # in-kernel warm sweep (kernels/microsolver.py) mirrors both
            # rules.
            tau_monotone = opts.accelerate or (opts.backtrack
                                               and not opts.adaptive)

            def step(carry, g):
                x, tau = carry
                r = fn(op, fterm, g, x, tau)
                if tau_monotone:
                    new_tau = tau
                else:
                    it = jnp.arange(r.taus.shape[-1])
                    ok = ((it < r.iteration_count)
                          & (r.backtracks < opts.max_backtracks)
                          & (r.taus > 0))
                    last = jnp.argmax(jnp.where(ok, it, -1))
                    # degenerate solve (0 accepted iterations / dead
                    # stepsize): keep warm-starting with the carried tau
                    new_tau = jnp.where(ok.any(), r.taus[last], tau)
                return (r.solution, new_tau.astype(rdt)), r

            carry0 = (jnp.asarray(x0), jnp.asarray(tau0, rdt))
            _, results = jax.lax.scan(step, carry0, gterms)
            return results

        path_fn = jax.jit(run)
        _PATH_CACHE.put(key, path_fn)
    return path_fn(op, fterm, gterms, x0, tau0)


def fasta(
    A: Any,
    At: Any,
    f: Any,
    gradf: Optional[Callable],
    g: Any,
    proxg: Optional[Callable],
    x0,
    *,
    options: Optional[FastaOptions] = None,
    tau0: Optional[float] = None,
    L: Optional[float] = None,
    key: int = 0,
    est_points: Optional[tuple] = None,
    check_adjoint_first: bool = False,
    **opt_kwargs,
) -> FastaResult:
    """Reference-compatible convenience entry point — same call shape as
    the upstream solver and the in-repo oracle: operator (matrix, closure
    pair, LinearOp, or None), smooth term (f, gradf — callables or a
    SmoothTerm), simple term (g, proxg — callables or a ProxTerm),
    initial iterate, keyword options.

    Runs the cached jitted device solver and returns a host-side
    ``FastaResult`` with trimmed diagnostics.  For benchmarking or
    repeated solves use ``make_solver`` and stay on device.
    """
    opts = options or FastaOptions()
    if opt_kwargs:
        opts = opts.replace(**opt_kwargs)
    op = as_linear_op(A, At)
    fterm = as_smooth_term(f, gradf)
    gterm = as_prox_term(g, proxg)
    x0 = jnp.asarray(x0)

    if check_adjoint_first:
        from .operators import check_adjoint
        check_adjoint(op, x0, jax.random.PRNGKey(key))

    L_est = None
    if tau0 is None:
        if L is None:
            tau0_arr, L_arr = estimate_stepsize(op, fterm, x0, key,
                                                points=est_points)
            tau0 = float(tau0_arr)
            L_est = float(L_arr)
        else:
            tau0 = 2.0 / L / 10.0
    initial_tau = float(tau0)

    solve_fn = make_solver(opts)

    t0 = time.perf_counter()
    out = solve_fn(op, fterm, gterm, x0, tau0)
    out = jax.block_until_ready(out)
    solve_time = time.perf_counter() - t0

    k = int(out.iteration_count)

    def trim(a):
        return np.asarray(a)[:k] if a is not None else None

    return FastaResult(
        solution=np.asarray(out.solution),
        best_iterate=np.asarray(out.best_iterate),
        iteration_count=k,
        converged=bool(out.converged),
        residuals=trim(out.residuals),
        norm_residuals=trim(out.norm_residuals),
        taus=trim(out.taus),
        fvals=trim(out.fvals),
        objectives=trim(out.objectives),
        backtracks=trim(out.backtracks),
        total_backtracks=int(out.total_backtracks),
        solve_time=solve_time,
        L_estimate=L_est,
        initial_tau=initial_tau,
        iterates=trim(out.iterates),
        nonfinite=bool(out.nonfinite),
    )
