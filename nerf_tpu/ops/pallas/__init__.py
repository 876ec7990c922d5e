"""Pallas TPU kernels for the hot ops (XLA paths remain the reference)."""

from .mlp import fused_flexible_mlp, supports_fused

__all__ = ["fused_flexible_mlp", "supports_fused"]
