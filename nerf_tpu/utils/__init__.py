"""Utilities: metrics, logging, profiling, compilation cache."""

from .compile_cache import enable_compilation_cache
from .logging import MetricWriter, RateMeter
from .metrics import ScalarMetric, psnr, ssim

__all__ = [
    "MetricWriter",
    "RateMeter",
    "ScalarMetric",
    "enable_compilation_cache",
    "psnr",
    "ssim",
]
