"""Sharded pose refinement (parallel/pose_dp.py) on the virtual 8-device
CPU mesh: the data-parallel loop must follow the SAME trajectory as the
serial engine loop — per-image pixel RNG is keyed by global image index and
the pmean-assembled gradient equals the serial one, so agreement is exact
up to float reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_tpu.data.poses import pose_spherical
from nerf_tpu.engine import (
    RenderSettings,
    init_pose_opt_state,
    make_pose_opt_loop,
    perturb_poses,
)
from nerf_tpu.engine.pose_opt import as_homogeneous
from nerf_tpu.engine.renderer import make_pose_render_fn
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.parallel import (
    make_mesh,
    make_parallel_pose_opt_loop,
    replicate_tree,
    shard_batch,
)


def _setup(n_images=8, h=16, w=16):
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=32, num_encoding_fn_xyz=4,
        num_encoding_fn_dir=2, use_viewdirs=True,
    )
    params = model.init(jax.random.PRNGKey(3))
    params = jax.tree.map(lambda x: x * 3.0, params)
    params["fc_alpha"]["bias"] = params["fc_alpha"]["bias"] + 2.0
    settings = RenderSettings(
        num_coarse=12, num_fine=0, perturb=False,
        radiance_field_noise_std=0.0, white_background=False,
        near=2.0, far=6.0, use_viewdirs=True,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    focal = 15.0
    true_poses = jnp.stack(
        [
            jnp.asarray(
                pose_spherical(45.0 * i, -30.0, 4.0)[:3, :4], jnp.float32
            )
            for i in range(n_images)
        ]
    )
    render = make_pose_render_fn(model, model, settings, h, w, focal,
                                 output="f32")
    images = jnp.stack([render(params, params, p) for p in true_poses])
    noisy = perturb_poses(true_poses, jax.random.PRNGKey(5), 1.5, 0.03)
    return model, params, settings, as_homogeneous(noisy), images, h, w, focal


def test_sharded_pose_opt_matches_serial():
    model, params, settings, base44, images, h, w, focal = _setup()
    n = images.shape[0]
    opt = optax.adam(3e-3)
    steps = 6
    # The optimizer is also told a wrong focal so both halves of the
    # replicated pytree (sharded-per-image twists, globally-shared focal)
    # get non-trivial gradients.
    wrong_focal = focal * 1.05

    serial_loop = make_pose_opt_loop(
        model, model, settings, h, w, wrong_focal, 16, opt,
        steps_per_loop=steps, refine_focal=True,
    )
    s_state, s_losses = serial_loop(
        init_pose_opt_state(n, opt), base44, images, params, params,
        jax.random.PRNGKey(11),
    )

    mesh = make_mesh()
    par_loop = make_parallel_pose_opt_loop(
        model, model, settings, h, w, wrong_focal, 16, opt,
        steps_per_loop=steps, mesh=mesh, num_images=n, refine_focal=True,
    )
    state0 = replicate_tree(mesh, init_pose_opt_state(n, opt))
    base_s, images_s = shard_batch(mesh, base44, images)
    params_rep = replicate_tree(mesh, params)
    p_state, p_losses = par_loop(
        state0, base_s, images_s, params_rep, params_rep,
        jax.random.PRNGKey(11),
    )

    np.testing.assert_allclose(
        np.asarray(p_losses), np.asarray(s_losses), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_state.xi), np.asarray(s_state.xi), atol=3e-5
    )
    np.testing.assert_allclose(
        float(p_state.log_focal), float(s_state.log_focal), atol=3e-6
    )
    # The trajectory went somewhere (this is not a zeros-equal-zeros pass).
    assert float(jnp.abs(s_state.xi).max()) > 1e-4
    assert float(jnp.abs(s_state.log_focal)) > 1e-6


def test_sharded_pose_opt_rejects_indivisible():
    model, params, settings, base44, images, h, w, focal = _setup(n_images=8)
    mesh = make_mesh()
    try:
        make_parallel_pose_opt_loop(
            model, model, settings, h, w, focal, 16, optax.adam(1e-3),
            steps_per_loop=2, mesh=mesh, num_images=6,
        )
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for 6 images on 8 devices")


def test_sharded_joint_train_matches_serial():
    """The DP joint loop (scene + cameras trained together, images sharded)
    must follow the serial joint trajectory: NeRF grads genuinely pmean
    across shards, twist rows assemble from exactly one shard each.
    Deterministic settings (no sigma noise / z-perturb) so the only
    divergence is float reduction order."""
    from nerf_tpu.engine.pose_opt import (
        init_joint_train_state, make_joint_train_loop,
    )
    from nerf_tpu.parallel import make_parallel_joint_train_loop

    model, _, settings, base44, images, h, w, focal = _setup()
    n = images.shape[0]
    nerf_opt = optax.adam(5e-3)
    pose_opt_ = optax.adam(3e-3)
    steps = 6

    state0 = init_joint_train_state(
        model, model, jax.random.PRNGKey(7), n, nerf_opt, pose_opt_,
    )
    serial_loop = make_joint_train_loop(
        model, model, settings, h, w, focal, 16, nerf_opt, pose_opt_,
        steps_per_loop=steps,
    )
    s_state, s_losses = serial_loop(
        state0, base44, images, jax.random.PRNGKey(11)
    )

    mesh = make_mesh()
    par_loop = make_parallel_joint_train_loop(
        model, model, settings, h, w, focal, 16, nerf_opt, pose_opt_,
        steps_per_loop=steps, mesh=mesh, num_images=n,
    )
    base_s, images_s = shard_batch(mesh, base44, images)
    p_state, p_losses = par_loop(
        replicate_tree(mesh, state0), base_s, images_s, jax.random.PRNGKey(11)
    )

    np.testing.assert_allclose(
        np.asarray(p_losses), np.asarray(s_losses), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_state.pose.xi), np.asarray(s_state.pose.xi), atol=3e-5
    )
    for sp, pp in zip(
        jax.tree.leaves(s_state.params_coarse),
        jax.tree.leaves(p_state.params_coarse),
    ):
        np.testing.assert_allclose(np.asarray(pp), np.asarray(sp), atol=1e-5)
    # Both pytrees actually moved, and the anchored camera stayed pinned.
    assert float(jnp.abs(s_state.pose.xi[1:]).max()) > 1e-4
    assert float(jnp.abs(p_state.pose.xi[0]).max()) == 0.0
