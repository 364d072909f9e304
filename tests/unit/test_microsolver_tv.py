"""TV whole-solve microsolver vs the XLA solver — interpret mode.

Comparison over an iteration prefix: the TV instance at f32 has
knife-edge backtracking branches, so ANY two implementations diverge
after enough iterations (oracle-vs-XLA shows the same); the contract is
trajectory agreement before chaos compounds.
"""

import jax.numpy as jnp
import numpy as np

import problems
from fasta_tpu.kernels.microsolver_tv import microsolve_tv


def test_tv_microsolver_prefix_matches_xla():
    prob = problems.build("tv", h=64, w=64, dtype=jnp.float32)
    inst = prob.instance
    b = jnp.asarray(inst["b"], jnp.float32)
    p0 = jnp.asarray(inst["x0"], jnp.float32)
    K = 12
    p, taus, res, k, conv = microsolve_tv(b, p0, 2.0, inst["mu"],
                                          max_iters=K, tol=0.0,
                                          interpret=True)
    prob.tau0 = 2.0
    r = prob.solve(tol=1e-12, max_iters=K, fuse=False,
                   stop_rule="iterations", precision="standard")
    np.testing.assert_allclose(np.asarray(taus[:K]), r.taus[:K],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res[:K]), r.residuals[:K],
                               rtol=1e-4)
    assert int(k) == K
