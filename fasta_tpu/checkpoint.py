"""Checkpoint / resume (SURVEY.md §5).

The reference has no checkpointing — solver state is tiny.  Here the
capability is provided at two levels:

  * ``save_pytree`` / ``load_pytree`` — serialize ANY solver pytree
    (``DeviceResult``, a ``Problem``'s arrays, a mid-run ``SolverState``)
    to a single ``.npz`` file keyed by tree paths.  No external
    dependencies; works for complex dtypes.
  * ``resume(problem, result, ...)`` — warm-restart a solve from a prior
    result: the fixed-point iteration restarts from the last iterate with
    the last accepted stepsize.  For FBS this is semantically a resume
    (the algorithm is memoryless up to (x, τ); the nonmonotone window and
    FISTA momentum are rebuilt, which only makes the restart more
    conservative, never incorrect).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from .options import FastaOptions
from .solver import FastaResult

__all__ = ["save_pytree", "load_pytree", "resume"]


def _path_key(path) -> str:
    return "/".join(str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
                    for p in path)


def save_pytree(tree: Any, path: str) -> str:
    """Serialize a pytree of arrays to ``path`` (.npz).  Leaf order is
    the tree's canonical flatten order; structure must be supplied again
    at load time (pass an example tree)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, **arrays)
    return path


def load_pytree(example: Any, path: str) -> Any:
    """Rebuild a pytree saved by ``save_pytree``; ``example`` provides
    the structure (shapes need not match — arrays load as stored)."""
    data = np.load(path)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(example)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, structure expects "
            f"{treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def resume(problem, result: FastaResult,
           options: Optional[FastaOptions] = None, **kwargs) -> FastaResult:
    """Continue a solve from a previous result: warm-start at the last
    iterate with the last accepted stepsize."""
    tau = float(result.taus[-1]) if len(result.taus) else None
    prob = problem.with_parts(x0=result.solution, tau0=tau)
    return prob.solve(options=options, **kwargs)
