"""Multi-host (DCN) initialization and process-role helpers.

SURVEY.md §5 scopes multi-host as "via DCN handled by
jax.distributed.initialize when scaled out": the mesh layer (parallel.mesh)
already builds over ``jax.devices()`` — the GLOBAL device list once the
distributed runtime is initialized — so the only host-side work is (a)
calling ``jax.distributed.initialize()`` before backend init, (b) feeding
each process its local shard of the ray store
(``jax.make_array_from_process_local_data``), and (c) gating file writes
(checkpoints, metrics, config dumps) on process 0.

The reference is single-process/single-GPU (train_nerf.py:97-100); none of
this has a reference counterpart.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX distributed runtime when a cluster is configured.

    Triggers (checked in order):
      * explicit coordinator env vars: ``JAX_COORDINATOR_ADDRESS`` (+ optional
        ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``)
      * ``NERF_TPU_DISTRIBUTED=1`` — use JAX's cluster auto-detection
        (TPU pod metadata, SLURM, OpenMPI)
      * a multi-node SLURM allocation

    Call BEFORE anything that initializes a backend. Returns True when the
    distributed runtime is (or already was) live. Safe no-op on single-host.
    """
    env = os.environ
    coordinator = env.get("JAX_COORDINATOR_ADDRESS") or env.get(
        "COORDINATOR_ADDRESS"
    )
    slurm_nodes = int(env.get("SLURM_JOB_NUM_NODES", "1") or 1)
    wants_cluster = (
        coordinator
        or env.get("NERF_TPU_DISTRIBUTED") == "1"
        or slurm_nodes > 1
    )
    if not wants_cluster:
        return False
    # Probe the distributed client directly: jax.process_count() would
    # itself initialize the XLA backend, after which
    # jax.distributed.initialize() unconditionally raises.
    from jax._src import distributed as _dist  # noqa: PLC0415

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already initialized upstream
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
        if "JAX_NUM_PROCESSES" in env:
            kwargs["num_processes"] = int(env["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in env:
            kwargs["process_id"] = int(env["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def is_primary() -> bool:
    """True on the process that owns file writes (checkpoints / metrics)."""
    return jax.process_index() == 0


def process_local_rows(arr, sharding, global_shape=None, axis=0):
    """Extract the slices (along ``axis``) of a (host-replicated) global
    array owned by THIS process's devices, in device order — the
    ``local_data`` contract of
    ``jax.make_array_from_process_local_data``."""
    import numpy as np

    arr = np.asarray(arr)
    shape = global_shape or arr.shape
    idx_map = sharding.addressable_devices_indices_map(shape)
    slices = sorted(
        {idx[axis] for idx in idx_map.values()},
        key=lambda s: (s.start or 0),
    )
    return np.concatenate(
        [arr[(slice(None),) * axis + (s,)] for s in slices], axis=axis
    )
