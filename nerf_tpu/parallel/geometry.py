"""Mesh-sharded density-grid sweep for geometry extraction.

The R^3 sigma sweep is embarrassingly parallel over grid chunks, so it
shards the same way ray batches do (``parallel/mesh.py`` rationale): the
chunk-index axis splits across the mesh's data axis, every device scans
its local chunk slice with the SAME body the serial sweep uses
(``engine.geometry.sigma_chunk_body`` — coordinates synthesized
on-device), and the out-spec sharding reassembles the global
``(num_chunks, chunk)`` sigma block. Params are replicated; there are no
cross-device reductions at all — scaling is pure throughput.

The reference (krrish94/nerf-pytorch) has neither geometry export nor any
multi-device support; this is TPU-added surface on TPU-added surface.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.geometry import sigma_chunk_body
from ..engine.renderer import RenderSettings
from .mesh import DATA_AXIS


def make_parallel_sigma_grid_fn(
    model,
    settings: RenderSettings,
    resolution: int,
    bbox_min: Tuple[float, float, float],
    bbox_max: Tuple[float, float, float],
    mesh: Mesh,
    axis: str = DATA_AXIS,
    chunk: int = 65536,
):
    """Build ``grid_fn(params) -> (R, R, R) float32 sigma`` sharded over ``mesh``.

    Numerically identical to ``engine.geometry.make_sigma_grid_fn`` (same
    chunk body, same chunk boundaries — only WHICH device scans a chunk
    changes); ``tests/test_geometry.py`` asserts equality on the virtual
    8-device mesh.
    """
    r = int(resolution)
    n = r ** 3
    chunk = int(min(chunk, n))
    num_chunks = (n + chunk - 1) // chunk
    n_shards = mesh.shape[axis]
    # Every shard scans the same number of chunks (static shapes); the tail
    # padding computes out-of-range points that get sliced off below.
    total_chunks = -(-num_chunks // n_shards) * n_shards
    one_chunk = sigma_chunk_body(model, settings, r, bbox_min, bbox_max, chunk)

    def shard_sweep(params, cidx):
        _, sig = jax.lax.scan(
            lambda carry, c: (carry, one_chunk(carry, c)), params, cidx
        )
        return sig  # (local_chunks, chunk)

    sharded = jax.shard_map(
        shard_sweep,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    def grid_fn(params):
        sig = sharded(params, jnp.arange(total_chunks))
        return sig.reshape(total_chunks * chunk)[:n].reshape(r, r, r)

    return jax.jit(grid_fn)
