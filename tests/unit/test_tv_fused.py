"""TV fused gradmap kernel vs the XLA composition (interpret mode) and
vs the oracle stencils."""

import jax.numpy as jnp
import numpy as np
import pytest

from fasta_tpu.kernels.tv_fused import fused_tv_gradmap, tv_gradmap_reference
from reference_oracle.generators import tv_div_2d, tv_grad_2d

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("shape", [(64, 64), (128, 256)])
def test_interpret_matches_reference(shape):
    h, w = shape
    p = jnp.asarray(RNG.standard_normal((2, h, w)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((h, w)), jnp.float32)
    d, f, g = fused_tv_gradmap(p, b, 0.1, interpret=True)
    d0, f0, g0 = tv_gradmap_reference(p, b, 0.1)
    np.testing.assert_allclose(d, d0, atol=1e-6)
    np.testing.assert_allclose(float(f), float(f0), rtol=1e-5)
    np.testing.assert_allclose(g, g0, atol=1e-6)


def test_reference_matches_oracle_stencils():
    h, w, mu = 32, 48, 0.3
    p = RNG.standard_normal((2, h, w))
    b = RNG.standard_normal((h, w))
    d, f, g = tv_gradmap_reference(jnp.asarray(p), jnp.asarray(b), mu)
    d_np = mu * tv_div_2d(p)
    r_np = d_np - b
    np.testing.assert_allclose(d, d_np, atol=1e-12)
    np.testing.assert_allclose(float(f), 0.5 * (r_np ** 2).sum(),
                               rtol=1e-12)
    np.testing.assert_allclose(g, mu * tv_grad_2d(r_np), atol=1e-12)
