"""Pallas TPU kernels for the hot ops (XLA paths remain the reference)."""

from .composite import fused_volume_render
from .mlp import fused_flexible_mlp, fused_flexible_mlp_rays, supports_fused
from .paper_t import fused_paper_mlp_t, supports_fused_paper

__all__ = [
    "fused_volume_render",
    "fused_flexible_mlp",
    "fused_flexible_mlp_rays",
    "supports_fused",
    "fused_paper_mlp_t",
    "supports_fused_paper",
]
