"""Pallas TPU kernels — the native hot path (SURVEY.md §2.4).

The reference has no native components; its hot path (matvec +
elementwise prox) maps here to hand-written Pallas kernels compiled
through Mosaic.  The centerpiece is the fused least-squares gradient
pass: one streaming read of A per solver iteration instead of two.
"""

from .lstsq_fused import (
    fused_lstsq_gradmap, fused_pointwise_gradmap, lstsq_gradmap_reference,
    supports_fusion,
)
from .microsolver import microsolve_lasso, supports_microsolver
from .microsolver_planar import (microsolve_planar_phasemax,
                                 supports_planar_microsolver)
from .microsolver_tv import microsolve_tv
from .planar_fused import (
    fused_planar_hinge_gradmap, fused_planar_lstsq_gradmap,
    planar_hinge_gradmap_reference, planar_lstsq_gradmap_reference,
    supports_planar_fusion,
)
from .prox_fused import fused_shrink_step, shrink_step_reference
from .tv_fused import fused_tv_gradmap, tv_gradmap_reference

__all__ = [
    "fused_lstsq_gradmap", "fused_pointwise_gradmap",
    "lstsq_gradmap_reference", "supports_fusion",
    "fused_planar_lstsq_gradmap", "fused_planar_hinge_gradmap",
    "planar_lstsq_gradmap_reference", "planar_hinge_gradmap_reference",
    "supports_planar_fusion",
    "fused_shrink_step", "shrink_step_reference", "fused_tv_gradmap",
    "tv_gradmap_reference", "microsolve_lasso", "supports_microsolver",
    "microsolve_tv", "microsolve_planar_phasemax",
    "supports_planar_microsolver",
]
