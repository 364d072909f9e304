"""Convergence plotting (capability C6, SURVEY.md §2.1).

The reference ships residual/objective-vs-iteration plots comparing the
three solver modes plus per-example solution visualizations; this module
reproduces that surface on the ``FastaResult`` diagnostics.  Matplotlib
is imported lazily and an Agg backend is forced when no display exists,
so headless benchmark hosts can still write PNGs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .solver import FastaResult

__all__ = ["plot_convergence", "plot_solution", "save_comparison_figure"]


def _mpl():
    import matplotlib
    if not os.environ.get("DISPLAY"):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_convergence(results: Dict[str, FastaResult], *,
                     quantity: str = "residuals",
                     title: Optional[str] = None,
                     ax=None, logy: bool = True):
    """Residual / normalized-residual / objective vs iteration, one curve
    per solver mode (the reference's signature figure)."""
    plt = _mpl()
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 4.5))
    for mode, r in results.items():
        y = getattr(r, quantity)
        if y is None:
            continue
        y = np.asarray(y)
        ax.plot(np.arange(1, y.size + 1), y, label=mode)
    ax.set_xlabel("iteration")
    ax.set_ylabel(quantity.replace("_", " "))
    if logy:
        ax.set_yscale("log")
    if title:
        ax.set_title(title)
    ax.legend()
    ax.grid(True, which="both", alpha=0.3)
    return ax


def plot_solution(problem, result: FastaResult, ax=None):
    """Per-example solution view: recovered-vs-true stem/line plot for
    vector signals, image pair for 2-D problems."""
    plt = _mpl()
    x = np.asarray(result.solution)
    if problem.recover is not None:
        x = np.asarray(problem.recover(x))
    xt = problem.x_true

    if x.ndim == 2:                           # image problems (TV)
        if ax is None:
            _, axes = plt.subplots(1, 2 if xt is not None else 1,
                                   figsize=(9, 4))
            axes = np.atleast_1d(axes)
        else:
            axes = [ax]
        axes[0].imshow(np.real(x), cmap="gray")
        axes[0].set_title(f"{problem.name}: recovered")
        axes[0].axis("off")
        if xt is not None and len(axes) > 1:
            axes[1].imshow(np.real(xt), cmap="gray")
            axes[1].set_title("ground truth")
            axes[1].axis("off")
        return axes

    if ax is None:
        _, ax = plt.subplots(figsize=(7, 4))
    if xt is not None:
        ax.plot(np.real(np.asarray(xt)), "o", ms=3, alpha=0.6,
                label="true")
    ax.plot(np.real(x), ".", ms=2, label="recovered")
    ax.set_title(problem.name)
    ax.legend()
    return ax


def save_comparison_figure(problem, results: Dict[str, FastaResult],
                           path: str):
    """One figure: convergence (residual + objective) and the solution."""
    plt = _mpl()
    fig, axes = plt.subplots(1, 3, figsize=(16, 4.5))
    plot_convergence(results, quantity="residuals",
                     title=f"{problem.name}: residual", ax=axes[0])
    has_obj = any(r.objectives is not None for r in results.values())
    if has_obj:
        plot_convergence(results, quantity="objectives",
                         title="objective", ax=axes[1], logy=False)
    first = next(iter(results.values()))
    sol_ax = plot_solution(problem, first, ax=axes[2])
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
