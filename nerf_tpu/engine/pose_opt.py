"""Camera-pose refinement through the frozen differentiable renderer.

The reference ships ``lieutils.py`` — 799 lines of SO(3)/SE(3) machinery
"for pose optimization experiments" — but never imports it anywhere
(SURVEY.md §2.9; reference lieutils.py:453-799). This module completes the
capability the reference only gestured at: per-image se(3) twists are
left-composed onto initial camera-to-world poses and optimized against the
photometric loss with the NeRF weights FROZEN, differentiating through ray
synthesis, positional encoding, both MLPs, hierarchical resampling, and
volume compositing (the BARF/iNeRF-style registration setup).

TPU-native design: one refinement step — per-image pixel sampling, ray
synthesis from the *current* refined poses, the full coarse→fine render,
and the Adam update on the twists — is a single jitted program, and
``make_pose_opt_loop`` wraps K steps in one ``lax.scan`` so a single host
dispatch amortizes the relay latency exactly like the training loop
(engine/train.py make_train_loop). Only the (N, 6) twist vector and a
scalar loss cross the host<->device boundary per K steps.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..lie import se3_exp, so3_log
from .renderer import RenderSettings, render_rays

Params = Dict[str, Any]


class PoseOptState(NamedTuple):
    """Refined camera parameters + their optimizer state (NeRF params stay
    frozen). ``log_focal`` is a shared log-scale intrinsics correction
    (refined focal = focal * exp(log_focal)); it only moves when the loss was
    built with ``refine_focal=True`` — otherwise its gradient is identically
    zero and Adam leaves it at exactly 0."""

    xi: jnp.ndarray  # (N, 6) se(3) twists [v, omega], zeros = initial poses
    log_focal: jnp.ndarray  # () shared focal correction, 0 = initial focal
    opt_state: Any

    @property
    def opt_params(self) -> Dict[str, jnp.ndarray]:
        return {"xi": self.xi, "log_focal": self.log_focal}


def as_homogeneous(poses: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 4) or (N, 4, 4) camera-to-world -> (N, 4, 4)."""
    if poses.shape[-2] == 4:
        return poses
    bottom = jnp.zeros_like(poses[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([poses, bottom], axis=-2)


def twists_to_poses(xi: jnp.ndarray, base_poses: jnp.ndarray) -> jnp.ndarray:
    """Left-compose per-image twists onto base poses.

    ``T_i = Exp(xi_i) @ base_i`` — the tangent-space parameterization keeps
    the estimate exactly on SE(3) for any xi (no re-orthonormalization), and
    xi = 0 reproduces the base poses bit-for-bit.

    Args:
      xi:         (N, 6) twists.
      base_poses: (N, 3, 4) or (N, 4, 4) camera-to-world matrices.
    Returns:
      (N, 3, 4) refined camera-to-world matrices.
    """
    base = as_homogeneous(base_poses)
    return jax.vmap(lambda x, p: (se3_exp(x) @ p)[:3, :4])(xi, base)


def pose_errors(
    poses_a: jnp.ndarray, poses_b: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Per-pose geodesic rotation error (degrees) and translation L2.

    rot_deg_i = ||Log(R_a_i^T R_b_i)|| in degrees — the bi-invariant SO(3)
    distance; trans_i = ||t_a_i - t_b_i||.
    """
    Ra, Rb = poses_a[..., :3, :3], poses_b[..., :3, :3]
    rel = jnp.swapaxes(Ra, -1, -2) @ Rb
    rot_rad = jnp.linalg.norm(jax.vmap(so3_log)(rel), axis=-1)
    trans = jnp.linalg.norm(
        poses_a[..., :3, 3] - poses_b[..., :3, 3], axis=-1
    )
    return {"rot_deg": jnp.degrees(rot_rad), "trans": trans}


def _sample_pixel_rays(
    poses34: jnp.ndarray,
    images: jnp.ndarray,
    key: jax.Array,
    height: int,
    width: int,
    focal_length,
    rays_per_image: int,
    image_index_offset=0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample ``rays_per_image`` random pixels from EVERY image and build
    their world-frame rays from the current (differentiable) poses.

    Rays are synthesized per sampled pixel with the exact ``get_ray_bundle``
    camera convention (ops/rays.py:24-58; reference nerf_helpers.py:89-110)
    — only R rays per image are materialized, never the full H*W bundle.
    Returns flat (N*R, 3) origins/directions/targets.

    Per-image randomness is keyed by GLOBAL image index
    (``fold_in(key, image_index_offset + i)``), so a shard holding images
    [offset, offset+n) reproduces exactly the serial sampling stream for its
    slice (parallel/pose_dp.py passes the shard offset).
    """
    n = images.shape[0]
    keys = jax.vmap(
        lambda i: jax.random.fold_in(key, i)
    )(image_index_offset + jnp.arange(n))

    def per_image(pose, img, k):
        idx = jax.random.randint(k, (rays_per_image,), 0, height * width)
        x = (idx % width).astype(pose.dtype)
        y = (idx // width).astype(pose.dtype)
        dirs = jnp.stack(
            [
                (x - width * 0.5) / focal_length,
                -(y - height * 0.5) / focal_length,
                -jnp.ones_like(x),
            ],
            axis=-1,
        )
        rd = jnp.sum(dirs[..., None, :] * pose[:3, :3], axis=-1)
        ro = jnp.broadcast_to(pose[:3, -1], rd.shape)
        tgt = img.reshape(-1, img.shape[-1])[idx]
        return ro, rd, tgt

    ro, rd, tgt = jax.vmap(per_image)(poses34, images, keys)
    return ro.reshape(-1, 3), rd.reshape(-1, 3), tgt.reshape(-1, 3)


def make_photometric_loss_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    height: int,
    width: int,
    focal_length: float,
    rays_per_image: int,
    refine_focal: bool = False,
):
    """Build ``loss(opt_params, base_poses, images, params_coarse,
    params_fine, key)`` where ``opt_params = {"xi": (N, 6), "log_focal": ()}``
    (``PoseOptState.opt_params``).

    The training objective restricted to camera variables: coarse MSE + fine
    MSE (reference train_nerf.py:190-196) over ``rays_per_image`` pixels
    sampled per image with ``key``, so coarse and fine stages must both
    explain the image from the refined camera. With a fixed key it doubles
    as a deterministic before/after evaluation metric (optimize_poses.py).

    ``refine_focal=True`` additionally differentiates through a shared
    intrinsics correction (ray directions built from
    ``focal * exp(log_focal)`` — self-calibration). Rejected for NDC scenes:
    the static ``settings.focal_length`` is baked into the NDC projection
    inside ``render_rays``, so a refined focal there would silently apply to
    ray synthesis but not to the projection.
    """
    if refine_focal and settings.use_ndc:
        raise ValueError(
            "refine_focal is not supported for NDC scenes: the NDC projection "
            "uses the static settings.focal_length. Refine poses only, or "
            "disable NDC."
        )
    needs_rng = settings.perturb or settings.radiance_field_noise_std > 0.0

    def photometric_loss(
        opt_params, base_poses, images, params_coarse, params_fine, key,
        image_index_offset=0, render_key_fold=None,
    ):
        k_pix, k_render = jax.random.split(key)
        if render_key_fold is not None:
            # Decorrelate the sigma-noise/z-perturb stream across shards:
            # pixel sampling is already shard-unique via image_index_offset,
            # but k_render would otherwise draw IDENTICAL noise tensors on
            # every device (parallel/pose_dp.py passes the shard index).
            k_render = jax.random.fold_in(k_render, render_key_fold)
        poses34 = twists_to_poses(opt_params["xi"], base_poses)
        focal = (
            focal_length * jnp.exp(opt_params["log_focal"])
            if refine_focal
            else focal_length
        )
        ro, rd, tgt = _sample_pixel_rays(
            poses34, images, k_pix, height, width, focal, rays_per_image,
            image_index_offset,
        )
        out = render_rays(
            model_coarse,
            params_coarse,
            model_fine,
            params_fine,
            ro,
            rd,
            settings,
            k_render if needs_rng else None,
        )
        loss = jnp.mean((out.coarse.rgb - tgt) ** 2)
        if out.fine is not None:
            loss = loss + jnp.mean((out.fine.rgb - tgt) ** 2)
        return loss

    return photometric_loss


def make_pose_opt_step(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    height: int,
    width: int,
    focal_length: float,
    rays_per_image: int,
    optimizer: optax.GradientTransformation,
    refine_focal: bool = False,
):
    """Build one jitted pose-refinement step.

    ``step(state, base_poses, images, params_coarse, params_fine, key)
    -> (new_state, loss)`` where ``base_poses`` is (N, 4, 4) (use
    ``as_homogeneous`` once outside), ``images`` is (N, H, W, 3) and both
    params pytrees are frozen (no gradients flow into them).

    Pass a deterministic ``settings`` (``settings.eval_variant()`` with
    ``use_pallas=False``): the fused Pallas kernel is forward-only and
    z-perturbation only adds sampling noise to the pose gradient.
    """
    photometric_loss = make_photometric_loss_fn(
        model_coarse, model_fine, settings, height, width, focal_length,
        rays_per_image, refine_focal=refine_focal,
    )

    def step(state: PoseOptState, base_poses, images, params_coarse,
             params_fine, key):
        loss, grads = jax.value_and_grad(photometric_loss)(
            state.opt_params, base_poses, images, params_coarse, params_fine,
            key,
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.opt_params
        )
        new_params = optax.apply_updates(state.opt_params, updates)
        return (
            PoseOptState(new_params["xi"], new_params["log_focal"], opt_state),
            loss,
        )

    return step


def make_pose_opt_loop(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    height: int,
    width: int,
    focal_length: float,
    rays_per_image: int,
    optimizer: optax.GradientTransformation,
    steps_per_loop: int,
    jit: bool = True,
    refine_focal: bool = False,
):
    """K refinement steps in one ``lax.scan`` — one dispatch per K steps.

    ``loop(state, base_poses, images, params_coarse, params_fine, base_key)
    -> (new_state, losses[K])``. Keys are derived per step by folding the
    step index into ``base_key``.
    """
    step = make_pose_opt_step(
        model_coarse, model_fine, settings, height, width, focal_length,
        rays_per_image, optimizer, refine_focal=refine_focal,
    )

    def loop(state, base_poses, images, params_coarse, params_fine, base_key):
        def body(carry, i):
            new_state, loss = step(
                carry, base_poses, images, params_coarse, params_fine,
                jax.random.fold_in(base_key, i),
            )
            return new_state, loss

        return jax.lax.scan(body, state, jnp.arange(steps_per_loop))

    return jax.jit(loop) if jit else loop


def init_pose_opt_state(
    num_poses: int, optimizer: optax.GradientTransformation
) -> PoseOptState:
    """Zero twists + zero focal correction (= the initial cameras) + fresh
    optimizer state over both."""
    params = {
        "xi": jnp.zeros((num_poses, 6), jnp.float32),
        "log_focal": jnp.zeros((), jnp.float32),
    }
    return PoseOptState(
        params["xi"], params["log_focal"], optimizer.init(params)
    )


def align_poses_umeyama(
    poses_a: jnp.ndarray, poses_b: jnp.ndarray, with_scale: bool = True
) -> jnp.ndarray:
    """Gauge-align camera set ``a`` to ``b`` with one global Sim(3)/SE(3).

    Joint scene+camera optimization has a gauge freedom: a rigid (plus
    scale) transform applied to every camera AND the scene leaves the
    photometric loss unchanged, so raw pose error against ground truth is
    meaningless after joint training. This solves the Umeyama similarity
    ``min_{s,R,t} sum_i ||s R c_a_i + t - c_b_i||^2`` over the camera
    CENTERS in closed form (SVD) and applies ``(s, R, t)`` to ``a``'s poses
    (the one global R also rotates the orientations); errors of the aligned
    set against ``b`` are then gauge-invariant.

    Args: (N, 3, 4)-or-(N, 4, 4) camera-to-world pose sets, N >= 3.
    Returns: aligned copy of ``poses_a``, shape (N, 3, 4).
    """
    ca, cb = poses_a[..., :3, 3], poses_b[..., :3, 3]
    mu_a, mu_b = ca.mean(0), cb.mean(0)
    da, db = ca - mu_a, cb - mu_b
    cov = db.T @ da / ca.shape[0]
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    flip = jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * d
    R = (u * flip) @ vt
    if with_scale:
        var_a = (da**2).sum() / ca.shape[0]
        scale = (s * flip).sum() / var_a
    else:
        scale = jnp.float32(1.0)
    t = mu_b - scale * (R @ mu_a)
    new_R = R @ poses_a[..., :3, :3]
    new_c = scale * (ca @ R.T) + t
    return jnp.concatenate([new_R, new_c[..., :, None]], axis=-1)


class JointTrainState(NamedTuple):
    """NeRF params + camera params, each with its own optimizer state."""

    params_coarse: Params
    params_fine: Any  # Params or None (single-stage)
    nerf_opt_state: Any
    pose: PoseOptState


def init_joint_train_state(
    model_coarse,
    model_fine,
    key: jax.Array,
    num_poses: int,
    nerf_optimizer: optax.GradientTransformation,
    pose_optimizer: optax.GradientTransformation,
) -> JointTrainState:
    kc, kf = jax.random.split(key)
    params_coarse = model_coarse.init(kc)
    params_fine = model_fine.init(kf) if model_fine is not None else None
    trainable = {"coarse": params_coarse}
    if params_fine is not None:
        trainable["fine"] = params_fine
    return JointTrainState(
        params_coarse,
        params_fine,
        nerf_optimizer.init(trainable),
        init_pose_opt_state(num_poses, pose_optimizer),
    )


def joint_update(
    carry: "JointTrainState",
    loss,
    nerf_optimizer: optax.GradientTransformation,
    pose_optimizer: optax.GradientTransformation,
    anchor_first: bool,
    grad_reduce=None,
) -> Tuple["JointTrainState", jnp.ndarray]:
    """One joint scene+camera update, shared by the serial loop and the DP
    loop (parallel/pose_dp.py) so the two trajectories can never diverge by
    code drift.

    ``loss(opt_params, nerf_params_dict) -> scalar`` closes over this step's
    data/key; ``grad_reduce(g_pose, g_nerf, loss)`` is the cross-device hook
    (identity when None; one pmean per pytree in DP). The anchor mask is
    applied AFTER reduction — masking row 0 commutes with pmean.
    """
    trainable = {"coarse": carry.params_coarse}
    if carry.params_fine is not None:
        trainable["fine"] = carry.params_fine

    loss_val, (g_pose, g_nerf) = jax.value_and_grad(loss, argnums=(0, 1))(
        carry.pose.opt_params, trainable
    )
    if grad_reduce is not None:
        g_pose, g_nerf, loss_val = grad_reduce(g_pose, g_nerf, loss_val)
    if anchor_first:
        g_pose = {**g_pose, "xi": g_pose["xi"].at[0].set(0.0)}

    nerf_updates, nerf_opt_state = nerf_optimizer.update(
        g_nerf, carry.nerf_opt_state, trainable
    )
    new_nerf = optax.apply_updates(trainable, nerf_updates)
    pose_updates, pose_opt_state = pose_optimizer.update(
        g_pose, carry.pose.opt_state, carry.pose.opt_params
    )
    new_pose = optax.apply_updates(carry.pose.opt_params, pose_updates)

    return JointTrainState(
        new_nerf["coarse"],
        new_nerf.get("fine"),
        nerf_opt_state,
        PoseOptState(new_pose["xi"], new_pose["log_focal"], pose_opt_state),
    ), loss_val


def make_joint_train_loop(
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
    refine_focal: bool = False,
    anchor_first: bool = True,
    jit: bool = True,
):
    """Joint NeRF + camera training (the BARF/NeRF-- problem setting): the
    scene and the cameras that observed it are optimized simultaneously,
    so a NeRF can be trained from scratch with miscalibrated poses.

    One ``jax.value_and_grad`` differentiates the shared photometric loss
    with respect to BOTH pytrees; the NeRF params take the ``nerf_optimizer``
    update (typically the config's Adam + lr schedule) and the camera params
    (twists + optional log-focal) take the usually-slower ``pose_optimizer``.
    K steps run per dispatch via ``lax.scan`` exactly like the frozen-model
    refinement loop and the production trainer.

    ``anchor_first`` pins camera 0 (its twist gradient is masked to zero),
    removing most of the rigid gauge freedom — without an anchor the scene
    and ALL cameras drift together and only gauge-aligned errors
    (``align_poses_umeyama``) are meaningful.

    ``loop(state, base_poses (N,4,4), images, base_key)
    -> (new_state, losses[K])``.
    """
    loss_fn = make_photometric_loss_fn(
        model_coarse, model_fine, settings, height, width, focal_length,
        rays_per_image, refine_focal=refine_focal,
    )

    def loop(state: JointTrainState, base_poses, images, base_key):
        def body(carry: JointTrainState, i):
            key = jax.random.fold_in(base_key, i)

            def full_loss(opt_params, nerf_params):
                return loss_fn(
                    opt_params, base_poses, images, nerf_params["coarse"],
                    nerf_params.get("fine"), key,
                )

            return joint_update(
                carry, full_loss, nerf_optimizer, pose_optimizer, anchor_first
            )

        return jax.lax.scan(body, state, jnp.arange(steps_per_loop))

    return jax.jit(loop) if jit else loop


def perturb_poses(
    poses: jnp.ndarray,
    key: jax.Array,
    rot_deg: float,
    trans: float,
) -> jnp.ndarray:
    """Apply a random rigid perturbation of KNOWN magnitude to every pose.

    Rotation: left-multiply R by Exp(axis * rot_rad) with a uniformly random
    unit axis (conjugation preserves the geodesic angle, so ``pose_errors``
    reads back exactly ``rot_deg``). Translation: add a random unit direction
    scaled by ``trans`` (kept additive — NOT folded into the twist — so the
    translation error is exactly ``trans``, independent of the camera's
    distance from the origin). Used by optimize_poses.py's demo mode to
    create a registration problem with known ground truth.
    """
    from ..lie import so3_exp

    n = poses.shape[0]
    k_axis, k_dir = jax.random.split(key)
    axis = jax.random.normal(k_axis, (n, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    tdir = jax.random.normal(k_dir, (n, 3))
    tdir = tdir / jnp.linalg.norm(tdir, axis=-1, keepdims=True)
    R = jax.vmap(lambda a, p: so3_exp(a) @ p[:3, :3])(
        axis * jnp.radians(rot_deg), poses
    )
    t = poses[..., :3, 3] + tdir * trans
    return jnp.concatenate([R, t[..., :, None]], axis=-1)
