"""Fused gradient-step+shrink+reductions kernel vs its XLA reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from fasta_tpu.kernels import fused_shrink_step, shrink_step_reference

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("n", [2000, 128, 100])
def test_fused_shrink_step_interpret(n):
    x0 = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    g = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    out = fused_shrink_step(x0, g, 0.3, 0.5, interpret=True)
    ref = shrink_step_reference(x0, g, 0.3, 0.5)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-6)
    for a, b in zip(out[1:], ref[1:]):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-4,
                                   atol=1e-5)


def test_padding_is_exact():
    """n=100 pads to 128; padded lanes contribute exactly zero."""
    x0 = jnp.asarray(RNG.standard_normal(100), jnp.float32)
    g = jnp.asarray(RNG.standard_normal(100), jnp.float32)
    out = fused_shrink_step(x0, g, 1.0, 0.1, interpret=True)
    assert out[0].shape == (100,)
    ref = shrink_step_reference(x0, g, 1.0, 0.1)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-6)
