"""Multi-device execution: row-sharded FASTA over a ``jax.sharding.Mesh``.

The scaling axis of this workload is the measurement dimension ``m``
(SURVEY.md §2.3): each device holds a row block ``A_i`` of the operator
and the matching block of ``b``/residual, computes ``A_i x`` locally, and
the adjoint matvec ``Aᴴr = Σ_i A_iᴴ r_i`` is an all-reduce that XLA lowers
onto ICI.  Everything else in the solver — prox, stepsize logic, stopping
— is either elementwise on the replicated signal ``x`` or a scalar
reduction (⟨Δx,Δg⟩, ‖·‖², f-values) that the partitioner turns into a
``psum``; because the reduction is collective and deterministic, **every
device sees identical stepsize and stopping decisions** (the BASELINE.json
determinism requirement).

Two composable mechanisms, both driving the *same* solver:

  * ``shard_problem(problem, mesh)`` — GSPMD path: ``device_put`` each
    measurement-space leaf with a row ``NamedSharding`` and replicate the
    rest; jit + the XLA partitioner insert all collectives.  Idiomatic
    "annotate shardings, let XLA do the rest".
  * ``RowShardedDenseOp`` — explicit ``shard_map`` path: the matvec pair
    is written with hand-placed ``psum`` so collective placement is
    guaranteed by construction, not inferred.  Used by the multi-chip
    dry-run and available for cases where propagation needs pinning.

Multi-host pods: call ``jax.distributed.initialize()`` before building the
mesh from ``jax.devices()`` — the same code paths compile unchanged; DCN
handles the cross-host legs of the collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .operators import DenseOp, LinearOp
from .problem import Problem

__all__ = [
    "make_mesh", "shard_problem", "RowShardedDenseOp",
    "RowShardedPlanarDenseOp", "replicate", "shard_rows",
    "sharded_lstsq_gradmap", "sharded_phase_hinge_gradmap",
    "sharded_planar_phase_hinge_gradmap", "sharded_pointwise_gradmap",
]


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "rows",
              devices=None) -> Mesh:
    """1-D device mesh over the measurement axis.  Uses all visible
    devices by default (pass ``n_devices`` to take a prefix)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(x, mesh: Mesh):
    """Place an array fully replicated on the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_rows(x, mesh: Mesh, axis_name: str = "rows"):
    """Shard an array's leading axis across the mesh axis."""
    x = jnp.asarray(x)
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


@jax.tree_util.register_pytree_node_class
class RowShardedDenseOp(LinearOp):
    """Dense operator with explicit shard_map row parallelism.

    Forward: purely local GEMV on each device's row block (zero
    communication — the output inherits the row sharding).
    Adjoint:  local ``A_iᴴ y_i`` followed by one ``psum`` over the mesh
    axis — the single collective of the iteration, riding ICI.
    """

    def __init__(self, A, mesh: Mesh, axis_name: str = "rows",
                 precision=jax.lax.Precision.HIGHEST):
        self.A = A
        self.mesh = mesh
        self.axis_name = axis_name
        self.precision = precision

    def __call__(self, x):
        ax = self.axis_name
        prec = self.precision

        def fwd(A_blk, x_rep):
            return jnp.matmul(A_blk, x_rep, precision=prec)

        return shard_map(
            fwd, mesh=self.mesh,
            in_specs=(P(ax, None), P()),
            out_specs=P(ax),
        )(self.A, x)

    def rmatvec(self, y):
        ax = self.axis_name
        prec = self.precision

        def adj(A_blk, y_blk):
            return jax.lax.psum(
                jnp.matmul(A_blk.conj().T, y_blk, precision=prec), ax)

        return shard_map(
            adj, mesh=self.mesh,
            in_specs=(P(ax, None), P(ax)),
            out_specs=P(),
        )(self.A, y)

    @property
    def shape(self):
        return self.A.shape

    def tree_flatten(self):
        return (self.A,), (self.mesh, self.axis_name, self.precision)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


@jax.tree_util.register_pytree_node_class
class RowShardedPlanarDenseOp(LinearOp):
    """Planar-complex dense operator (see operators.PlanarDenseOp) with
    explicit shard_map row parallelism — the flagship sharded layout:
    16k complex measurement rows split over the mesh, all-real local
    matmuls, one psum on the adjoint leg."""

    def __init__(self, Ar, Ai, mesh: Mesh, axis_name: str = "rows",
                 precision=jax.lax.Precision.HIGHEST):
        self.Ar = Ar
        self.Ai = Ai
        self.mesh = mesh
        self.axis_name = axis_name
        self.precision = precision

    def __call__(self, x):
        ax, prec = self.axis_name, self.precision

        def fwd(Ar_blk, Ai_blk, x_rep):
            p = jnp.matmul(Ar_blk, x_rep, precision=prec)
            q = jnp.matmul(Ai_blk, x_rep, precision=prec)
            return jnp.stack([p[:, 0] - q[:, 1], p[:, 1] + q[:, 0]],
                             axis=-1)

        return shard_map(
            fwd, mesh=self.mesh,
            in_specs=(P(ax, None), P(ax, None), P()),
            out_specs=P(ax),
        )(self.Ar, self.Ai, x)

    def rmatvec(self, y):
        ax, prec = self.axis_name, self.precision

        def adj(Ar_blk, Ai_blk, y_blk):
            p = jnp.matmul(Ar_blk.T, y_blk, precision=prec)
            q = jnp.matmul(Ai_blk.T, y_blk, precision=prec)
            out = jnp.stack([p[:, 0] + q[:, 1], p[:, 1] - q[:, 0]],
                            axis=-1)
            return jax.lax.psum(out, ax)

        return shard_map(
            adj, mesh=self.mesh,
            in_specs=(P(ax, None), P(ax, None), P(ax)),
            out_specs=P(),
        )(self.Ar, self.Ai, y)

    @property
    def shape(self):
        return self.Ar.shape

    def tree_flatten(self):
        return (self.Ar, self.Ai), (self.mesh, self.axis_name,
                                    self.precision)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def sharded_planar_phase_hinge_gradmap(op: "RowShardedPlanarDenseOp", b):
    """Fused sharded planar PhaseMax-hinge gradmap — the flagship
    complex 16k-row configuration in its all-real TPU layout: one
    shard_map region per evaluation, one fused psum of (f, Aᴴ∇f)."""
    ax, prec = op.axis_name, op.precision

    def local(Ar_blk, Ai_blk, b_blk, x_rep):
        p = jnp.matmul(Ar_blk, x_rep, precision=prec)
        q = jnp.matmul(Ai_blk, x_rep, precision=prec)
        d_blk = jnp.stack([p[:, 0] - q[:, 1], p[:, 1] + q[:, 0]], axis=-1)
        mag = jnp.sqrt(jnp.sum(d_blk * d_blk, axis=-1))
        r = jnp.maximum(mag - b_blk, 0.0)
        f_part = 0.5 * jnp.sum(r * r)
        gl = (r / jnp.maximum(mag, 1e-30))[:, None] * d_blk
        gp = jnp.matmul(Ar_blk.T, gl, precision=prec)
        gq = jnp.matmul(Ai_blk.T, gl, precision=prec)
        g_part = jnp.stack([gp[:, 0] + gq[:, 1], gp[:, 1] - gq[:, 0]],
                           axis=-1)
        f, g = jax.lax.psum((f_part, g_part), ax)
        return d_blk, f, g

    fn = shard_map(local, mesh=op.mesh,
                   in_specs=(P(ax, None), P(ax, None), P(ax), P()),
                   out_specs=(P(ax), P(), P()))
    return lambda x: fn(op.Ar, op.Ai, b, x)


def sharded_pointwise_gradmap(op: "RowShardedDenseOp", loss_local,
                              *data_leaves):
    """Generic fused sharded gradmap for any POINTWISE smooth loss
    f(d) = Σᵢ ℓ(dᵢ; dataᵢ):  one shard_map region computing
    (d_blk, Σ_local ℓ, A_blkᴴ ℓ'(d_blk)) with a single fused psum.
    ``loss_local(d_blk, *data_blks) -> (loss_sum, dloss)`` runs on the
    device-local rows; every ``data_leaves`` array must carry the same
    row sharding as A (shard_problem guarantees this for smooth-term
    leaves).  Covers logistic, squared hinge, and any future pointwise
    loss without new collective code."""
    ax, prec = op.axis_name, op.precision
    nd = len(data_leaves)

    def local(A_blk, x_rep, *data_blks):
        d_blk = jnp.matmul(A_blk, x_rep, precision=prec)
        f_part, dloss = loss_local(d_blk, *data_blks)
        g_part = jnp.matmul(A_blk.conj().T, dloss, precision=prec)
        f, g = jax.lax.psum((f_part, g_part), ax)
        return d_blk, f, g

    fn = shard_map(local, mesh=op.mesh,
                   in_specs=(P(ax, None), P()) + (P(ax),) * nd,
                   out_specs=(P(ax), P(), P()))
    return lambda x: fn(op.A, x, *data_leaves)


def sharded_lstsq_gradmap(op: "RowShardedDenseOp", b):
    """Fused sharded least-squares gradmap:
    x ↦ (Ax, ½‖Ax−b‖², Aᴴ(Ax−b)) as ONE shard_map region per call —
    the entire measurement-space computation stays device-local and the
    only communication is a single fused psum of (f_partial, g_partial)
    over the mesh axis.  This is the optimal collective pattern for the
    row-sharded iteration (SURVEY.md §2.3): zero communication on the
    forward leg, one all-reduce on the adjoint leg.

    ``b`` must carry the same row sharding as ``op.A`` (shard_problem
    guarantees this).
    """
    ax = op.axis_name

    prec = op.precision

    def local(A_blk, b_blk, x_rep):
        d_blk = jnp.matmul(A_blk, x_rep, precision=prec)
        r = d_blk - b_blk
        f_part = 0.5 * jnp.real(jnp.vdot(r, r))
        g_part = jnp.matmul(A_blk.conj().T, r, precision=prec)
        f, g = jax.lax.psum((f_part, g_part), ax)
        return d_blk, f, g

    fn = shard_map(local, mesh=op.mesh,
                   in_specs=(P(ax, None), P(ax), P()),
                   out_specs=(P(ax), P(), P()))
    return lambda x: fn(op.A, b, x)


def sharded_phase_hinge_gradmap(op: "RowShardedDenseOp", b):
    """Fused sharded PhaseMax-hinge gradmap (the flagship complex
    16k-measurement config):  f(d)=½Σmax(|d|−b,0)² with Wirtinger
    gradient, evaluated shard-locally with one psum for (f, Aᴴ∇f)."""
    ax = op.axis_name

    prec = op.precision

    def local(A_blk, b_blk, x_rep):
        d_blk = jnp.matmul(A_blk, x_rep, precision=prec)
        mag = jnp.abs(d_blk)
        r = jnp.maximum(mag - b_blk, 0.0)
        f_part = 0.5 * jnp.sum(r * r)
        grad_local = (r / jnp.maximum(mag, 1e-30)) * d_blk
        g_part = jnp.matmul(A_blk.conj().T, grad_local, precision=prec)
        f, g = jax.lax.psum((f_part, g_part), ax)
        return d_blk, f, g

    fn = shard_map(local, mesh=op.mesh,
                   in_specs=(P(ax, None), P(ax), P()),
                   out_specs=(P(ax), P(), P()))
    return lambda x: fn(op.A, b, x)


def _measurement_dim(problem: Problem) -> Optional[int]:
    """Leading dimension of the measurement space d = A x."""
    try:
        d_shape = jax.eval_shape(problem.op, jnp.asarray(problem.x0)).shape
    except Exception:
        return None
    return d_shape[0] if d_shape else None


def shard_problem(problem: Problem, mesh: Mesh,
                  axis_name: str = "rows",
                  explicit: bool = True) -> Problem:
    """Place a problem on the mesh, row-sharded over measurements.

    Placement rule: any array leaf of the operator or smooth term whose
    leading dimension equals the measurement dimension ``m`` is sharded
    ``P(axis, None, …)``; every other leaf (prox-term anchors, x0 — all
    signal-space) is replicated.  With ``explicit=True`` (the default)
    a DenseOp is additionally wrapped in :class:`RowShardedDenseOp` so
    the matvec collectives are hand-placed via shard_map — guaranteed
    partitioned execution with exactly one psum on the adjoint leg (and,
    for least-squares / phase-hinge smooth terms, a single fused
    shard-local gradmap region per iteration).  ``explicit=False``
    leaves collective placement to the XLA partitioner (GSPMD) — correct
    everywhere, but some backends (notably CPU) choose to replicate.

    The measurement dim must divide the mesh size for an even layout;
    uneven sizes still work (XLA pads internally) but waste the remainder
    devices' tail.
    """
    m = _measurement_dim(problem)
    n_dev = mesh.devices.size
    if m is not None and m % n_dev != 0:
        raise ValueError(
            f"measurement dim {m} not divisible by mesh size {n_dev}; "
            f"pad the problem or choose a different mesh")

    def place(x, shard_ok: bool):
        if not isinstance(x, (jax.Array, np.ndarray)):
            return x
        x = jnp.asarray(x)
        if shard_ok and x.ndim >= 1 and m is not None and x.shape[0] == m:
            return shard_rows(x, mesh, axis_name)
        return replicate(x, mesh)

    op = jax.tree_util.tree_map(lambda l: place(l, True), problem.op)
    fterm = jax.tree_util.tree_map(lambda l: place(l, True), problem.fterm)
    gterm = jax.tree_util.tree_map(lambda l: place(l, False), problem.gterm)
    x0 = place(problem.x0, False)

    from .operators import PlanarDenseOp
    if explicit and isinstance(op, DenseOp):
        op = RowShardedDenseOp(op.A, mesh, axis_name,
                               precision=op.precision)
    elif explicit and isinstance(op, PlanarDenseOp):
        op = RowShardedPlanarDenseOp(op.Ar, op.Ai, mesh, axis_name,
                                     precision=op.precision)

    return problem.with_parts(op=op, fterm=fterm, gterm=gterm, x0=x0,
                              name=problem.name + f"@{n_dev}dev")
