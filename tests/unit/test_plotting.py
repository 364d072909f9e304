"""Plotting smoke tests (Agg backend, no display)."""

import os

import jax.numpy as jnp

import problems
from fasta_tpu.harness import compare_modes, format_comparison
from fasta_tpu.plotting import save_comparison_figure


def test_comparison_figure(tmp_path):
    prob = problems.build("lasso", m=48, n=64, k=6, dtype=jnp.float64)
    prob.tau0 = 0.05
    results = compare_modes(prob, tol=1e-6, max_iters=40)
    path = save_comparison_figure(prob, results,
                                  str(tmp_path / "lasso.png"))
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    table = format_comparison(prob, results)
    assert "adaptive" in table and "accelerated" in table


def test_image_problem_figure(tmp_path):
    prob = problems.build("tv", h=32, w=32, dtype=jnp.float64)
    prob.tau0 = 2.0
    results = compare_modes(prob, tol=1e-4, max_iters=30)
    path = save_comparison_figure(prob, results, str(tmp_path / "tv.png"))
    assert os.path.exists(path) and os.path.getsize(path) > 1000
