"""Seed-sweep parity: the exact-trajectory guarantee must hold across
instance draws, not just the default seeds."""

import jax.numpy as jnp
import numpy as np
import pytest

import problems
from reference_oracle.fasta_numpy import fasta as fasta_np


@pytest.mark.parametrize("seed", [7, 77, 777])
@pytest.mark.parametrize("name,kwargs,tau0", [
    ("lasso", dict(m=120, n=240, k=12), 0.05),
    ("nnls", dict(m=100, n=50), 0.08),
])
def test_seeded_instances_match(name, kwargs, tau0, seed):
    prob = problems.build(name, seed=seed, dtype=jnp.float64, **kwargs)
    inst = prob.instance
    r_np = fasta_np(inst["op"], None, inst["f"], inst["gradf"], inst["g"],
                    inst["proxg"], inst["x0"], tau0=tau0, tol=1e-9,
                    max_iters=150)
    prob.tau0 = tau0
    r_j = prob.solve(tol=1e-9, max_iters=150)
    assert r_j.iteration_count == r_np.iteration_count
    k = r_np.iteration_count
    np.testing.assert_allclose(r_j.taus[:k], r_np.taus[:k], rtol=1e-6)
    np.testing.assert_allclose(r_j.solution, r_np.solution, atol=1e-8)
