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
outside (not wired by default; single-chip multi-scene is already a large
utilization win).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from ..engine.renderer import RenderSettings
from ..engine.train import StepMetrics, TrainState, make_loss_fn
from ..ops.math import mse2psnr


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
