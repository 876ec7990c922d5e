"""Data-parallel camera-pose refinement over a device mesh.

Pose refinement (engine/pose_opt.py) is embarrassingly parallel over images:
each image's sampled rays touch only its own se(3) twist. Scale-out follows
the DP training pattern (parallel/dp.py): images and their base poses shard
across the mesh's "data" axis with ``jax.shard_map``; the camera parameters
(all N twists + the shared log-focal) and their Adam state stay REPLICATED.
Each device differentiates the photometric loss of its image shard — the
twist gradient is zero outside the shard's slice (``dynamic_slice``
transpose) — and one ``lax.pmean`` over ICI assembles the full gradient:
the per-image twist rows sum across exactly one shard each, and the shared
focal correction averages across all of them (the one genuinely global
parameter). The replicated update then applies identically everywhere.

Serial equivalence is exact up to float reduction order: per-image pixel
RNG is keyed by GLOBAL image index (pose_opt._sample_pixel_rays's
``image_index_offset``), so shard d draws the same pixels for image i as the
serial loop does, and ``pmean`` of equal-size shard means equals the global
mean. ``tests/test_pose_dp.py`` asserts trajectory-level agreement on the
8-virtual-device mesh.

The reference has no distributed anything (SURVEY.md §2); this exists
because a framework-level capability (pose refinement) must scale the same
way the trainer and renderer do.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.pose_opt import (
    JointTrainState,
    PoseOptState,
    joint_update,
    make_photometric_loss_fn,
)
from ..engine.renderer import RenderSettings
from .mesh import DATA_AXIS


def make_parallel_pose_opt_loop(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    height: int,
    width: int,
    focal_length: float,
    rays_per_image: int,
    optimizer: optax.GradientTransformation,
    steps_per_loop: int,
    mesh: Mesh,
    num_images: int,
    axis: str = DATA_AXIS,
    refine_focal: bool = False,
):
    """Build the sharded K-step refinement loop.

    ``loop(state, base_poses (N,4,4), images (N,H,W,3), params_coarse,
    params_fine, base_key) -> (new_state, losses[K])`` with ``base_poses``
    and ``images`` sharded on axis 0 across the mesh, ``state`` and both
    frozen NeRF param pytrees replicated, and ``num_images`` divisible by
    the mesh's data-axis size. Key schedule matches the serial
    ``make_pose_opt_loop`` (``fold_in(base_key, i)`` per step), so serial
    and sharded runs follow the same trajectory.
    """
    n_dev = mesh.shape[axis]
    if num_images % n_dev != 0:
        raise ValueError(
            f"num_images {num_images} not divisible by mesh axis {n_dev}"
        )
    local_n = num_images // n_dev

    loss_fn = make_photometric_loss_fn(
        model_coarse, model_fine, settings, height, width, focal_length,
        rays_per_image, refine_focal=refine_focal,
    )

    def local_loss(opt_params, base44, images, params_coarse, params_fine,
                   key, offset, shard):
        # Slice the replicated twists down to this shard's images; the
        # transpose of dynamic_slice zero-pads the gradient back to (N, 6).
        local_params = {
            "xi": jax.lax.dynamic_slice_in_dim(
                opt_params["xi"], offset, local_n
            ),
            "log_focal": opt_params["log_focal"],
        }
        return loss_fn(
            local_params, base44, images, params_coarse, params_fine, key,
            image_index_offset=offset, render_key_fold=shard,
        )

    def shard_loop(state: PoseOptState, base44, images, params_coarse,
                   params_fine, base_key):
        shard = jax.lax.axis_index(axis)
        offset = shard * local_n

        def body(carry, i):
            key = jax.random.fold_in(base_key, i)
            loss, grads = jax.value_and_grad(local_loss)(
                carry.opt_params, base44, images, params_coarse, params_fine,
                key, offset, shard,
            )
            # One collective assembles the global gradient: each twist row is
            # non-zero on exactly one shard (pmean = row / n_dev, the global
            # 1/D sum-of-shard-means factor); log_focal genuinely averages.
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            updates, opt_state = optimizer.update(
                grads, carry.opt_state, carry.opt_params
            )
            new = optax.apply_updates(carry.opt_params, updates)
            return (
                PoseOptState(new["xi"], new["log_focal"], opt_state),
                loss,
            )

        return jax.lax.scan(body, state, jnp.arange(steps_per_loop))

    sharded = jax.shard_map(
        shard_loop,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_joint_train_loop(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    height: int,
    width: int,
    focal_length: float,
    rays_per_image: int,
    nerf_optimizer: optax.GradientTransformation,
    pose_optimizer: optax.GradientTransformation,
    steps_per_loop: int,
    mesh: Mesh,
    num_images: int,
    axis: str = DATA_AXIS,
    refine_focal: bool = False,
    anchor_first: bool = True,
):
    """Sharded joint NeRF + camera training (the DP form of
    ``engine.pose_opt.make_joint_train_loop``).

    Images and base poses shard across the mesh; the NeRF params, the camera
    params, and BOTH optimizer states stay replicated. Each device
    differentiates its shard's photometric loss with respect to both pytrees
    in one backward, then a single ``pmean`` per pytree assembles the global
    gradients over ICI: the NeRF gradient genuinely averages across shards
    (every shard's rays hit the shared scene), while each twist row is
    non-zero on exactly one shard (pmean = the serial global-mean factor),
    exactly like the frozen-model loop above. The replicated updates then
    apply identically everywhere — no parameter resharding, ever.

    ``loop(state: JointTrainState, base_poses (N,4,4), images, base_key)
    -> (new_state, losses[K])`` with ``base_poses``/``images`` sharded on
    axis 0 and ``num_images`` divisible by the mesh's data-axis size. Same
    key schedule as the serial joint loop; trajectory-equality (up to float
    reduction order, deterministic settings) is asserted by
    ``tests/test_pose_dp.py``.
    """
    n_dev = mesh.shape[axis]
    if num_images % n_dev != 0:
        raise ValueError(
            f"num_images {num_images} not divisible by mesh axis {n_dev}"
        )
    local_n = num_images // n_dev

    loss_fn = make_photometric_loss_fn(
        model_coarse, model_fine, settings, height, width, focal_length,
        rays_per_image, refine_focal=refine_focal,
    )

    def local_loss(opt_params, nerf_params, base44, images, key, offset,
                   shard):
        local_params = {
            "xi": jax.lax.dynamic_slice_in_dim(
                opt_params["xi"], offset, local_n
            ),
            "log_focal": opt_params["log_focal"],
        }
        return loss_fn(
            local_params, base44, images, nerf_params["coarse"],
            nerf_params.get("fine"), key, image_index_offset=offset,
            render_key_fold=shard,
        )

    def shard_loop(state: JointTrainState, base44, images, base_key):
        shard = jax.lax.axis_index(axis)
        offset = shard * local_n

        def grad_reduce(g_pose, g_nerf, loss):
            return (
                jax.lax.pmean(g_pose, axis),
                jax.lax.pmean(g_nerf, axis),
                jax.lax.pmean(loss, axis),
            )

        def body(carry: JointTrainState, i):
            key = jax.random.fold_in(base_key, i)

            def full_loss(opt_params, nerf_params):
                return local_loss(
                    opt_params, nerf_params, base44, images, key, offset,
                    shard,
                )

            return joint_update(
                carry, full_loss, nerf_optimizer, pose_optimizer,
                anchor_first, grad_reduce=grad_reduce,
            )

        return jax.lax.scan(body, state, jnp.arange(steps_per_loop))

    sharded = jax.shard_map(
        shard_loop,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
