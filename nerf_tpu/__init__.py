"""nerf_tpu — a TPU-native NeRF framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of krrish94/nerf-pytorch, designed
TPU-first: statically-shaped jit-compiled render/train pipelines, device-mesh
data parallelism via shard_map, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

from . import models, ops

__all__ = ["models", "ops", "__version__"]
