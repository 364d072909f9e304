"""Pallas TPU kernels — the native hot path (SURVEY.md §2.4).

The reference has no native components; its hot path (matvec +
elementwise prox) maps here to hand-written Pallas kernels compiled
through Mosaic.  The centerpiece is the fused least-squares gradient
pass: one streaming read of A per solver iteration instead of two.
"""

from .lstsq_fused import (
    fused_lstsq_gradmap, lstsq_gradmap_reference, supports_fusion,
)
from .prox_fused import fused_shrink_step, shrink_step_reference

__all__ = [
    "fused_lstsq_gradmap", "lstsq_gradmap_reference", "supports_fusion",
    "fused_shrink_step", "shrink_step_reference",
]
