"""Data-parallel (ray-parallel) training and rendering over a device mesh.

TPU-native scale-out (the reference has none — SURVEY.md §2): rays are
sharded across the mesh's "data" axis with ``jax.shard_map``; parameters and
optimizer state are replicated. Each device renders/backprops its ray shard,
gradients and scalar metrics are reduced with ``lax.pmean`` over ICI, and the
(replicated) optimizer update is applied identically everywhere — classic
DP with XLA collectives instead of NCCL allreduce.

Full-image rendering shards the pixel rays the same way; the out_spec
re-concatenates shards into the image, i.e. the all-gather is expressed by
the sharding system rather than hand-written collectives.

RNG: each shard folds ``lax.axis_index("data")`` into the step key so
stratified jitter / sigma noise differ across shards but stay reproducible.

The loss definition is shared with the serial engine (engine.train
.make_loss_fn), as are the NaN-guard helpers, so DP runs have identical
semantics including failure protection.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.renderer import RenderSettings, render_maps_dict, render_rays
from ..engine.train import (
    StepMetrics,
    TrainState,
    all_finite,
    guard_non_finite,
    make_loss_fn,
    sample_ray_batch,
)
from ..ops.math import mse2psnr
from .mesh import DATA_AXIS


def _make_shard_step(
    model_coarse, model_fine, settings, optimizer, axis: str, nan_guard: bool
):
    """One DP step for a single shard: local grads -> pmean -> update."""
    loss_fn = make_loss_fn(model_coarse, model_fine, settings)

    def shard_step(state: TrainState, ro, rd, target, key):
        trainable = {"coarse": state.params_coarse, "fine": state.params_fine}
        (loss, (closs, floss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, ro, rd, target, key
        )
        # The DP allreduce: mean over the ray shards via ICI.
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        closs = jax.lax.pmean(closs, axis)
        floss = jax.lax.pmean(floss, axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        if nan_guard:
            new_trainable, opt_state = guard_non_finite(
                all_finite(loss, grads), new_trainable, trainable,
                opt_state, state.opt_state,
            )
        new_state = TrainState(
            state.step + 1, new_trainable["coarse"], new_trainable["fine"], opt_state
        )
        return new_state, StepMetrics(loss, closs, floss, mse2psnr(loss))

    return shard_step


def make_parallel_train_step(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    nan_guard: bool = False,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jax.Array],
              Tuple[TrainState, StepMetrics]]:
    """Build the sharded training step.

    step(state, ro (B,3), rd (B,3), target (B,3), key) -> (state, metrics)
    with B divisible by the mesh's data-axis size. State is replicated;
    ray arrays are sharded on axis 0.
    """
    shard_step = _make_shard_step(
        model_coarse, model_fine, settings, optimizer, axis, nan_guard
    )

    def keyed_step(state, ro, rd, target, key):
        # Distinct per-shard randomness, deterministic in (key, shard index).
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return shard_step(state, ro, rd, target, key)

    sharded = jax.shard_map(
        keyed_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_parallel_train_loop(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch_size: int,
    steps_per_call: int,
    axis: str = DATA_AXIS,
    nan_guard: bool = False,
    sample_mode: str = "gather",
):
    """Sharded multi-step training loop: lax.scan of full DP steps inside
    shard_map, with per-device on-device ray sampling from the local shard.

    loop(state, ro_store, rd_store, tgt_store, base_key) -> (state, metrics)
    with the ray stores sharded on axis 0 across the mesh, state replicated,
    ``batch_size`` the GLOBAL batch (split evenly across devices), and
    metrics fields shaped (steps_per_call,). One host dispatch per K steps;
    gradients psum over ICI every step inside the compiled loop.
    """
    if batch_size % mesh.shape[axis] != 0:
        raise ValueError(
            f"global batch {batch_size} not divisible by mesh axis {mesh.shape[axis]}"
        )
    local_batch = batch_size // mesh.shape[axis]
    shard_step = _make_shard_step(
        model_coarse, model_fine, settings, optimizer, axis, nan_guard
    )

    def shard_loop(state: TrainState, ro_store, rd_store, tgt_store, base_key):
        shard_id = jax.lax.axis_index(axis)

        def body(carry, _):
            st = carry
            key = jax.random.fold_in(jax.random.fold_in(base_key, st.step), shard_id)
            k_sample, k_step = jax.random.split(key)
            ro, rd, tgt = sample_ray_batch(
                k_sample, ro_store, rd_store, tgt_store, local_batch,
                mode=sample_mode,
            )
            return shard_step(st, ro, rd, tgt, k_step)

        return jax.lax.scan(body, state, None, length=steps_per_call)

    sharded = jax.shard_map(
        shard_loop,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_parallel_render_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    mesh: Mesh,
    axis: str = DATA_AXIS,
):
    """Sharded flat-ray renderer: rays split over the mesh, outputs re-assembled.

    render(params_coarse, params_fine, ro (N,3), rd (N,3)) -> rgb maps dict.
    N must be divisible by the data-axis size (use parallel.mesh.pad_to_devices).
    Deterministic (eval) settings — for validation/eval rendering.
    """
    eval_settings = settings.eval_variant()

    def shard_render(params_coarse, params_fine, ro, rd):
        out = render_rays(
            model_coarse, params_coarse, model_fine, params_fine,
            ro, rd, eval_settings, None,
        )
        return render_maps_dict(out)

    sharded = jax.shard_map(
        shard_render,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def _make_shard_chunk_render(model_coarse, model_fine, eval_settings):
    """Device-local half of the sharded renderers: scan this shard's rays in
    ``chunksize``-ray megabatches (lax.map, like the single-device
    engine.renderer path) and return the flat per-ray maps."""

    def shard_render(params_coarse, params_fine, ro, rd):
        n = ro.shape[0]
        chunk = min(eval_settings.chunksize, n)
        num_chunks = -(-n // chunk)
        pad = num_chunks * chunk - n
        if pad:
            ro = jnp.concatenate([ro, jnp.repeat(ro[-1:], pad, 0)])
            rd = jnp.concatenate([rd, jnp.repeat(rd[-1:], pad, 0)])

        def render_chunk(args):
            ro_c, rd_c = args
            out = render_rays(
                model_coarse, params_coarse, model_fine, params_fine,
                ro_c, rd_c, eval_settings, None,
            )
            return render_maps_dict(out)

        maps = jax.lax.map(
            render_chunk,
            (ro.reshape(num_chunks, chunk, 3), rd.reshape(num_chunks, chunk, 3)),
        )
        return {
            k: v.reshape((num_chunks * chunk,) + v.shape[2:])[:n]
            for k, v in maps.items()
        }

    return shard_render


def make_parallel_image_render_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    mesh: Mesh,
    axis: str = DATA_AXIS,
):
    """Sharded full-image renderer: the H*W pixel rays are split across the
    mesh's data axis; each device scans its shard in ``chunksize``-ray
    megabatches (lax.map, like the single-device engine.renderer path); the
    out-spec sharding reassembles the image — the all-gather the reference's
    host-side chunk+concat loop (train_utils.py:170-200) becomes.

    render(params_coarse, params_fine, ray_origins (H,W,3),
           ray_directions (H,W,3)) -> dict of (H,W[,3]) maps.
    """
    eval_settings = settings.eval_variant()
    n_shards = mesh.shape[axis]
    shard_render = _make_shard_chunk_render(
        model_coarse, model_fine, eval_settings
    )

    sharded = jax.shard_map(
        shard_render,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    def render_image(params_coarse, params_fine, ray_origins, ray_directions):
        h, w = ray_origins.shape[0], ray_origins.shape[1]
        ro = ray_origins.reshape(-1, 3)
        rd = ray_directions.reshape(-1, 3)
        n = ro.shape[0]
        padded = -(-n // n_shards) * n_shards
        if padded != n:
            ro = jnp.concatenate([ro, jnp.repeat(ro[-1:], padded - n, 0)])
            rd = jnp.concatenate([rd, jnp.repeat(rd[-1:], padded - n, 0)])
        maps = sharded(params_coarse, params_fine, ro, rd)
        return {
            k: v[:n].reshape((h, w) + v.shape[1:]) for k, v in maps.items()
        }

    return jax.jit(render_image)


def make_parallel_pose_render_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    height: int,
    width: int,
    focal: float,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    output: str = "maps",
):
    """Sharded pose -> image renderer: the mesh analog of
    ``engine.renderer.make_pose_render_fn``, with its relay-transfer tricks
    intact — only a (3, 4) pose crosses the host->device boundary, and each
    shard GENERATES its own slice of pixel rays on-device (pinhole math is
    per-pixel independent, so ray generation shards for free; no H*W*24-byte
    ray upload, no host-side ray build). The out-spec sharding reassembles
    the image; ``output`` selects maps/u8/f32 like the serial factory.

    This is serve_nerf.py's multi-device path: one compiled program renders
    each requested frame across every device in the mesh.
    """
    if output not in ("maps", "u8", "f32"):
        raise ValueError(f"unknown output mode {output!r}")
    eval_settings = settings.eval_variant()
    n_shards = mesh.shape[axis]
    n = height * width
    shard_n = -(-n // n_shards)  # ceil; pad rays re-render the last pixel
    chunk_render = _make_shard_chunk_render(
        model_coarse, model_fine, eval_settings
    )

    def shard_render(params_coarse, params_fine, pose34):
        # This shard's flat pixel indices -> camera-frame directions ->
        # world rays (same math as ops.rays.get_ray_bundle, reference
        # nerf_helpers.py:89-110, restricted to the shard's index range).
        start = jax.lax.axis_index(axis) * shard_n
        idx = jnp.minimum(start + jnp.arange(shard_n), n - 1)
        ii = (idx % width).astype(pose34.dtype)
        jj = (idx // width).astype(pose34.dtype)
        directions = jnp.stack(
            [
                (ii - width * 0.5) / focal,
                -(jj - height * 0.5) / focal,
                -jnp.ones_like(ii),
            ],
            axis=-1,
        )
        rd = jnp.sum(directions[..., None, :] * pose34[:3, :3], axis=-1)
        ro = jnp.broadcast_to(pose34[:3, -1], rd.shape)
        return chunk_render(params_coarse, params_fine, ro, rd)

    sharded = jax.shard_map(
        shard_render,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    def render(params_coarse, params_fine, pose34):
        maps = {
            k: v[:n].reshape((height, width) + v.shape[1:])
            for k, v in sharded(params_coarse, params_fine, pose34).items()
        }
        rgb = maps.get("rgb_fine", maps["rgb_coarse"])
        if output == "f32":
            return jnp.clip(rgb, 0.0, 1.0)
        u8 = (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        if output == "u8":
            return u8
        maps["rgb_u8"] = u8
        return maps

    return jax.jit(render)
