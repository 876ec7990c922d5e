"""Pallas TPU kernels for the hot ops (XLA paths remain the reference)."""

from .composite import fused_volume_render
from .mlp import fused_flexible_mlp, fused_flexible_mlp_rays, supports_fused

__all__ = [
    "fused_volume_render",
    "fused_flexible_mlp",
    "fused_flexible_mlp_rays",
    "supports_fused",
]
