"""L5 completeness guard (round-4 VERDICT item 6): every registered
problem must have a committed convergence/solution figure in
docs/figures/, so a new problem cannot land without one (the suite grew
past the figures twice — nmf and sparse_lasso in round 4)."""

from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def test_every_registered_problem_has_a_figure():
    import problems
    problems.build  # noqa: B018 — touching build() below fills REGISTRY
    # importing the submodules (what build() does) populates REGISTRY
    from problems import (democratic, lasso, logistic,  # noqa: F401
                          matrix_completion, max_norm, mmv, nmf, nnls,
                          phase_retrieval, phase_retrieval_cdp,
                          sparse_lasso, svm, tv)
    missing = [name for name in sorted(problems.REGISTRY)
               if not (REPO / "docs" / "figures" / f"{name}.png").exists()]
    assert not missing, (
        f"problems without a docs/figures/<name>.png: {missing} — run "
        f"'python -m problems --quick' (or the single module) and "
        f"commit the figure")


def test_figure_generator_covers_registry():
    """problems/__main__.py's QUICK_SIZES must list every registered
    problem — a missing entry is exactly how the round-4 figure gap
    happened."""
    import problems
    from problems.__main__ import QUICK_SIZES
    from problems import (democratic, lasso, logistic,  # noqa: F401
                          matrix_completion, max_norm, mmv, nmf, nnls,
                          phase_retrieval, phase_retrieval_cdp,
                          sparse_lasso, svm, tv)
    missing = sorted(set(problems.REGISTRY) - set(QUICK_SIZES))
    assert not missing, (
        f"problems missing from problems/__main__.py QUICK_SIZES: "
        f"{missing}")
