"""Utilities: metrics, logging, profiling."""

from .logging import MetricWriter, RateMeter
from .metrics import ScalarMetric, psnr, ssim

__all__ = ["MetricWriter", "RateMeter", "ScalarMetric", "psnr", "ssim"]
