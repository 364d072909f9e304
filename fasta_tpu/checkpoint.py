"""Checkpoint / resume (SURVEY.md §5).

The reference has no checkpointing — solver state is tiny.  Here the
capability is provided at two levels:

  * ``save_pytree`` / ``load_pytree`` — serialize ANY solver pytree
    (``DeviceResult``, a ``Problem``'s arrays, a mid-run ``SolverState``)
    to a single ``.npz`` file keyed by tree paths.  No external
    dependencies; works for complex dtypes.  Loading verifies the key
    set against the example structure — a checkpoint from a different
    pytree fails loudly instead of silently mis-assigning arrays.
  * ``resume(problem, result, ...)`` — warm-restart a solve from a prior
    result: the fixed-point iteration restarts from the last iterate with
    the last accepted stepsize.  For FBS this is semantically a resume
    (the algorithm is memoryless up to (x, τ); the nonmonotone window and
    FISTA momentum are rebuilt, which only makes the restart more
    conservative, never incorrect).

For BIT-EXACT mid-run resume — window, momentum, BB stepsize and the
diagnostics cursor all continued — use ``fasta_tpu.make_stateful_solver``
to obtain the full ``SolverState`` carry, ``save_pytree``/``load_pytree``
it, and continue with ``fasta_tpu.resume_state`` (the resumed trajectory
equals the uninterrupted run bit-for-bit; tests/unit/test_exact_resume.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from .options import FastaOptions
from .solver import FastaResult

__all__ = ["save_pytree", "load_pytree", "resume"]


def _path_key(path) -> str:
    key = "/".join(
        str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
        for p in path)
    return key or "<root>"


def save_pytree(tree: Any, path: str) -> str:
    """Serialize a pytree of arrays to ``path`` (.npz), each leaf keyed
    by its tree path — the load side verifies the key set, so a
    checkpoint can only be restored into the structure it came from."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {_path_key(p): np.asarray(leaf) for p, leaf in flat}
    if len(arrays) != len(flat):
        raise ValueError("pytree has colliding path keys; cannot save")
    np.savez(path, **arrays)
    return path


def load_pytree(example: Any, path: str) -> Any:
    """Rebuild a pytree saved by ``save_pytree``; ``example`` provides
    the structure.  The checkpoint's path-key set must match the
    example's exactly (shapes load as stored — a resume may legitimately
    carry different diagnostic lengths)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(example)
    want = [_path_key(p) for p, _ in flat]
    have = set(data.files)
    if have == {f"leaf_{i}" for i in range(len(flat))}:
        # legacy round-1 format: positional leaf_{i} keys.  Structure
        # cannot be cross-checked beyond the leaf count; load in
        # flatten order (the order save used then).
        return jax.tree_util.tree_unflatten(
            treedef, [data[f"leaf_{i}"] for i in range(len(flat))])
    if set(want) != have:
        missing = sorted(set(want) - have)
        extra = sorted(have - set(want))
        raise ValueError(
            f"checkpoint does not match the example structure: "
            f"missing keys {missing[:5]}, unexpected keys {extra[:5]} "
            f"({len(missing)} missing / {len(extra)} unexpected total)")
    return jax.tree_util.tree_unflatten(treedef, [data[k] for k in want])


def resume(problem, result: FastaResult,
           options: Optional[FastaOptions] = None, **kwargs) -> FastaResult:
    """Continue a solve from a previous result: warm-start at the last
    iterate with the last accepted stepsize."""
    tau = float(result.taus[-1]) if len(result.taus) else None
    prob = problem.with_parts(x0=result.solution, tau0=tau)
    return prob.solve(options=options, **kwargs)
