"""Multi-scene batched training: N scenes optimized as one vmapped TPU workload.

BASELINE.json config 5: "train/render all 7 pretrained lowres scenes as one
vmapped TPU workload". The reference can only run scenes as separate
processes; here the scene axis becomes a leading batch dimension over
parameters, optimizer state, and ray batches, and ONE jitted program steps
every scene simultaneously. For small-MLP protocols the batched matmuls
fill the MXU far better than a single scene can (3.3x aggregate on the
32+32/6-enc demo); at the full 64+64/10-enc protocol single-scene matmuls
already fill the MXU and the batched form runs at ~0.75x flat per-ray
efficiency (measured — docs/PARITY.md roofline), so the win there is
operational: one process, one compile, simultaneous checkpoints.

Composes with data parallelism: vmap over scenes inside, shard_map over rays
outside — ``make_parallel_multiscene_train_step`` / ``_loop`` below. Each
scene's ray batch is sharded across the mesh's data axis, per-scene states
replicate, and ONE pmean reduces the whole (S,)-batched gradient pytree over
ICI per step (trajectory-equality vs the serial multiscene step is tested on
the virtual 8-device mesh, tests/test_multiscene.py; the driver dryrun
executes the sharded loop). Single-chip multi-scene is already a large
utilization win; the DP wrapper adds ray-axis scale-out on real meshes.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.renderer import RenderSettings
from ..engine.train import StepMetrics, TrainState, make_loss_fn
from ..ops.math import mse2psnr
from .mesh import DATA_AXIS


def create_multiscene_state(
    model_coarse,
    model_fine,
    optimizer: optax.GradientTransformation,
    key: jax.Array,
    num_scenes: int,
) -> TrainState:
    """TrainState whose every leaf has a leading (num_scenes,) axis."""
    keys = jax.random.split(key, num_scenes)

    def init_one(k):
        kc, kf = jax.random.split(k)
        pc = model_coarse.init(kc)
        pf = model_fine.init(kf) if model_fine is not None else None
        opt = optimizer.init({"coarse": pc, "fine": pf})
        return TrainState(jnp.asarray(0, jnp.int32), pc, pf, opt)

    return jax.vmap(init_one)(keys)


def make_multiscene_train_step(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    jit: bool = True,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jax.Array],
              Tuple[TrainState, StepMetrics]]:
    """Build the scene-vmapped training step.

    step(state, ro (S,B,3), rd (S,B,3), target (S,B,3), key)
      -> (state, StepMetrics with (S,)-shaped fields)
    where S = num_scenes. Each scene gets independent params, optimizer
    state, and RNG stream; the whole update is one XLA program.
    """

    loss_fn = make_loss_fn(model_coarse, model_fine, settings)

    def one_scene_step(state: TrainState, ro, rd, target, key):
        trainable = {"coarse": state.params_coarse, "fine": state.params_fine}
        (loss, (closs, floss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, ro, rd, target, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        new_state = TrainState(
            state.step + 1, trainable["coarse"], trainable["fine"], opt_state
        )
        return new_state, StepMetrics(loss, closs, floss, mse2psnr(loss))

    def step(state: TrainState, ro, rd, target, key):
        num_scenes = ro.shape[0]
        keys = jax.random.split(key, num_scenes)
        return jax.vmap(one_scene_step)(state, ro, rd, target, keys)

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def make_multiscene_train_loop(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    steps_per_call: int,
    jit: bool = True,
    sample_mode: str = "gather",
):
    """K-step scan of the vmapped multi-scene step with on-device per-scene
    ray sampling — one host dispatch per K steps x S scenes.

    loop(state, ro (S,N,3), rd (S,N,3), tgt (S,N,3), base_key)
      -> (state, StepMetrics with (steps_per_call, S)-shaped fields)
    """
    step_fn = make_multiscene_train_step(
        model_coarse, model_fine, settings, optimizer, jit=False
    )

    def loop(state: TrainState, ro_store, rd_store, tgt_store, base_key):
        def body(carry, _):
            st = carry
            step0 = st.step[0]
            key = jax.random.fold_in(base_key, step0)
            k_sample, k_step = jax.random.split(key)
            batch = sample_multiscene_batch(
                k_sample, ro_store, rd_store, tgt_store, batch_size,
                mode=sample_mode,
            )
            return step_fn(st, *batch, k_step)

        return jax.lax.scan(body, state, None, length=steps_per_call)

    return jax.jit(loop, donate_argnums=(0,)) if jit else loop


# ---------------------------------------------------------------------------
# Multiscene x data parallelism: vmap over scenes INSIDE, shard_map over the
# ray axis OUTSIDE. Per-scene params/optimizer state replicate across the
# mesh; each scene's ray batch splits over the data axis; one pmean reduces
# the whole (S,)-batched gradient pytree per step.


def shard_multiscene_stores(mesh: Mesh, *arrays, axis: str = DATA_AXIS):
    """Place (S, N, ...) per-scene ray stores with the RAY axis (1) sharded
    across the mesh and the scene axis replicated-in-layout (each device
    holds every scene's local ray shard).

    Multi-host: a bare ``device_put`` to a sharding spanning non-addressable
    devices round-trips a cross-process assert_equal (a Gloo allgather that
    deadlines when processes reach it at skewed times — seen as a 30 s
    ``cpu:gloo`` timeout in the 2-process test); build the global array from
    each process's local ray slices instead, as ``shard_batch`` does."""
    sharding = NamedSharding(mesh, P(None, axis))
    if jax.process_count() > 1:
        import numpy as np

        from .distributed import process_local_rows

        out = tuple(
            jax.make_array_from_process_local_data(
                sharding, process_local_rows(a, sharding, axis=1),
                np.shape(a),
            )
            for a in arrays
        )
    else:
        # device_put straight from the host array (like shard_batch):
        # jnp.asarray first would materialize the whole (S, N, 3) store on
        # device 0 before resharding — a transient 2x HBM copy per store.
        out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def _make_multiscene_shard_step(model_coarse, model_fine, settings, optimizer, axis):
    """One DP multiscene step on a single ray shard: per-scene local grads
    (vmap over scenes) -> ONE pmean of the (S,)-batched gradient pytree over
    the mesh -> per-scene update. The dp._make_shard_step structure with the
    scene axis vmapped inside; same shared loss definition (make_loss_fn)."""
    loss_fn = make_loss_fn(model_coarse, model_fine, settings)

    def scene_grads(state: TrainState, ro, rd, target, key):
        trainable = {"coarse": state.params_coarse, "fine": state.params_fine}
        return jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, ro, rd, target, key
        )

    def scene_update(state: TrainState, grads):
        trainable = {"coarse": state.params_coarse, "fine": state.params_fine}
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return TrainState(
            state.step + 1, trainable["coarse"], trainable["fine"], opt_state
        )

    def shard_step(state: TrainState, ro, rd, target, key):
        num_scenes = ro.shape[0]
        keys = jax.random.split(key, num_scenes)
        (loss, (closs, floss)), grads = jax.vmap(scene_grads)(
            state, ro, rd, target, keys
        )
        # The DP allreduce: one pmean over the whole (S,)-batched pytree.
        loss, closs, floss, grads = jax.lax.pmean((loss, closs, floss, grads), axis)
        new_state = jax.vmap(scene_update)(state, grads)
        return new_state, StepMetrics(loss, closs, floss, mse2psnr(loss))

    return shard_step


def make_parallel_multiscene_train_step(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = DATA_AXIS,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jax.Array],
              Tuple[TrainState, StepMetrics]]:
    """Sharded scene-vmapped training step.

    step(state, ro (S,B,3), rd (S,B,3), target (S,B,3), key)
      -> (state, StepMetrics with (S,)-shaped fields)
    with B (the per-scene GLOBAL ray batch) divisible by the mesh's data-axis
    size and sharded on axis 1 (``shard_multiscene_stores``); state
    replicated. With perturb/noise off this matches the serial multiscene
    step on the same batch exactly (allreduce-of-shard-means == global mean;
    tested on the virtual 8-device mesh)."""
    shard_step = _make_multiscene_shard_step(
        model_coarse, model_fine, settings, optimizer, axis
    )

    def keyed_step(state, ro, rd, target, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return shard_step(state, ro, rd, target, key)

    sharded = jax.shard_map(
        keyed_step,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_parallel_multiscene_train_loop(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch_size: int,
    steps_per_call: int,
    axis: str = DATA_AXIS,
    sample_mode: str = "gather",
):
    """Sharded K-step multiscene scan: per-device per-scene ray sampling from
    the local shard of each scene's store, gradient pmean over ICI every step
    inside the compiled loop.

    loop(state, ro (S,N,3), rd, tgt, base_key)
      -> (state, StepMetrics with (steps_per_call, S)-shaped fields)
    with the stores sharded on the RAY axis (1) across the mesh
    (``shard_multiscene_stores``), state replicated, and ``batch_size`` the
    per-scene GLOBAL batch (split evenly across devices)."""
    if batch_size % mesh.shape[axis] != 0:
        raise ValueError(
            f"per-scene batch {batch_size} not divisible by mesh axis "
            f"{mesh.shape[axis]}"
        )
    local_batch = batch_size // mesh.shape[axis]
    shard_step = _make_multiscene_shard_step(
        model_coarse, model_fine, settings, optimizer, axis
    )

    def shard_loop(state: TrainState, ro_store, rd_store, tgt_store, base_key):
        shard_id = jax.lax.axis_index(axis)

        def body(carry, _):
            st = carry
            key = jax.random.fold_in(
                jax.random.fold_in(base_key, st.step[0]), shard_id
            )
            k_sample, k_step = jax.random.split(key)
            batch = sample_multiscene_batch(
                k_sample, ro_store, rd_store, tgt_store, local_batch,
                mode=sample_mode,
            )
            return shard_step(st, *batch, k_step)

        return jax.lax.scan(body, state, None, length=steps_per_call)

    sharded = jax.shard_map(
        shard_loop,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def sample_multiscene_batch(
    key: jax.Array,
    ray_origins: jnp.ndarray,     # (S, N, 3) per-scene ray stores
    ray_directions: jnp.ndarray,  # (S, N, 3)
    targets: jnp.ndarray,         # (S, N, 3)
    batch_size: int,
    mode: str = "gather",
):
    """Per-scene independent ray batches.

    mode="gather": one uniform row-gather per scene (exact
    with-replacement). mode="sliced": one uniform offset + contiguous
    dynamic_slice per scene — the TPU-fast path; requires pre-shuffled
    stores (data.rays_store.shuffle_ray_store). See
    engine.train.sample_ray_batch for the trade-off.
    """
    num_scenes, n = ray_origins.shape[:2]
    if mode == "sliced":
        if n < batch_size:
            # Static shapes: see engine.train.sample_ray_batch — avoids
            # undefined randint values + a silently clamped degenerate slice.
            raise ValueError(
                f"sliced sampling needs store size >= batch ({n} < {batch_size})"
            )
        off = jax.random.randint(key, (num_scenes,), 0, n - batch_size + 1)
        take = jax.vmap(
            lambda a, o: jax.lax.dynamic_slice_in_dim(a, o, batch_size)
        )
        return (
            take(ray_origins, off),
            take(ray_directions, off),
            take(targets, off),
        )
    if mode != "gather":
        raise ValueError(f"unknown ray-sampling mode {mode!r}")
    idx = jax.random.randint(key, (num_scenes, batch_size), 0, n)
    take = jax.vmap(lambda a, i: a[i])
    return (
        take(ray_origins, idx),
        take(ray_directions, idx),
        take(targets, idx),
    )
