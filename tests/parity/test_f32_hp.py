"""Float32 high-precision path vs the float64 oracle (VERDICT r1 item 1).

The round-1 f32 solver needed ~8× the oracle's iterations on TV because
plain f32 reductions corrupt the stepsize/backtracking decisions.  With
``precision="auto"`` (double-word decision scalars) the f32 trajectory
must track the f64 oracle's ITERATION COUNT closely — the convergence
behavior, not bitwise values (f32 storage still rounds the iterates).

Oracle spec: reference_oracle/fasta_numpy.py lines 294-364 (backtracking
condition, BB scalars) — the scalars these tests exercise in f32.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import problems as P
from reference_oracle.fasta_numpy import fasta as fasta_np

# name -> (builder kwargs, tau0, solve kwargs)  — tolerances chosen so the
# f64 oracle needs hundreds of iterations: enough decisions for f32 noise
# to matter, small enough for CI.
CASES = {
    "tv": (dict(h=48, w=48), 0.25, dict(tol=1e-5, max_iters=8000)),
    "lasso": (dict(m=150, n=300, k=15, mu=0.05), 0.05,
              dict(tol=1e-7, max_iters=4000)),
    "logistic": (dict(m=150, n=80), 1.0, dict(tol=1e-6, max_iters=4000)),
}


def _oracle(name):
    kwargs, tau0, skw = CASES[name]
    prob = P.build(name, dtype=jnp.float64, **kwargs)
    inst = prob.instance
    return fasta_np(inst["op"], inst.get("op_t"), inst["f"], inst["gradf"],
                    inst["g"], inst["proxg"], inst["x0"], tau0=tau0, **skw)


@pytest.mark.parametrize("name", list(CASES))
def test_f32_hp_iteration_parity(name):
    kwargs, tau0, skw = CASES[name]
    r_np = _oracle(name)
    assert r_np.converged, f"oracle must converge for {name}"

    prob32 = P.build(name, dtype=jnp.float32, **kwargs)
    r_hp = prob32.solve(tau0=tau0, precision="high", **skw)

    assert r_hp.converged, f"{name}: f32 hp did not converge"
    # Iteration count close to the oracle's (round-1's failure mode was
    # 8×).  f32 iterate STORAGE still perturbs the trajectory — logistic
    # is the knife-edge backtracking case where one flipped decision
    # reroutes the path (its standard-precision count is identical, so
    # the residual gap is storage, not reductions).
    factor = 1.5 if name == "logistic" else 1.25
    lo = r_np.iteration_count / factor
    hi = factor * r_np.iteration_count + 10
    assert lo <= r_hp.iteration_count <= hi, (
        f"{name}: oracle {r_np.iteration_count} iters, "
        f"f32 hp {r_hp.iteration_count}")


def test_f32_hp_early_trajectory_tracks_oracle():
    """Early iterations (before storage rounding compounds) must match
    the oracle's stepsize sequence at f32-resolution — this pins the dd
    BB formulas to the oracle's f64 ones."""
    name = "lasso"
    kwargs, tau0, skw = CASES[name]
    r_np = _oracle(name)
    prob32 = P.build(name, dtype=jnp.float32, **kwargs)
    r_hp = prob32.solve(tau0=tau0, precision="high", **skw)
    # f32 data-path rounding compounds ~per-iteration; by iter 15 the tau
    # divergence is ~1e-5 (measured), so a 1e-4 band pins the formulas
    # without flaking on storage noise.
    k = min(15, r_np.iteration_count, r_hp.iteration_count)
    np.testing.assert_allclose(r_hp.taus[:k], r_np.taus[:k], rtol=1e-4)
    np.testing.assert_allclose(r_hp.fvals[:k], r_np.fvals[:k], rtol=1e-4)


def test_precision_modes_identical_in_f64():
    """In float64 the auto mode must take the STANDARD path — bitwise
    identical trajectories (hp is a float32 device, not an algorithm
    change)."""
    prob = P.build("lasso", m=100, n=200, k=10, dtype=jnp.float64)
    r_auto = prob.solve(tau0=0.05, tol=1e-9, max_iters=150,
                        precision="auto")
    r_std = prob.solve(tau0=0.05, tol=1e-9, max_iters=150,
                       precision="standard")
    assert r_auto.iteration_count == r_std.iteration_count
    np.testing.assert_array_equal(r_auto.taus, r_std.taus)
    np.testing.assert_array_equal(r_auto.solution, r_std.solution)


def test_f32_hp_accelerated_mode():
    """The dd window semantics (f recorded at the extrapolated point)
    must hold in FISTA mode too."""
    prob = P.build("lasso", m=150, n=300, k=15, mu=0.05,
                   dtype=jnp.float32)
    r = prob.solve(tau0=0.05, tol=1e-6, max_iters=3000, adaptive=False,
                   accelerate=True, precision="high")
    assert r.converged
    # tau must never have collapsed (the window-semantics failure mode)
    assert r.taus.min() > 1e-4
