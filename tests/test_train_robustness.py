"""Failure-handling features: NaN guard and gradient clipping."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from nerf_tpu.models import FlexibleNeRFModel


def _setup(nan_guard):
    # sigma noise keeps relu(sigma) from being uniformly dead at init
    # (otherwise the whole model can have exactly-zero gradients)
    settings = RenderSettings(
        num_coarse=4, num_fine=0, perturb=False,
        radiance_field_noise_std=0.5,
        num_encoding_fn_xyz=2, num_encoding_fn_dir=2,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=8, num_encoding_fn_xyz=2, num_encoding_fn_dir=2
    )
    opt = make_optimizer("adam", 1e-2)
    state = create_train_state(model, None, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, None, settings, opt, nan_guard=nan_guard)
    return state, step


def test_nan_guard_skips_bad_update():
    state, step = _setup(nan_guard=True)
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (8, 1))
    bad_target = jnp.full((8, 3), jnp.nan)  # poisons the loss/grads
    before = np.asarray(state.params_coarse["layer1"]["kernel"]).copy()
    state2, metrics = step(state, ro, rd, bad_target, jax.random.PRNGKey(1))
    assert not np.isfinite(float(metrics.loss))
    # params unchanged, step still advanced
    np.testing.assert_array_equal(
        np.asarray(state2.params_coarse["layer1"]["kernel"]), before
    )
    assert int(state2.step) == 1
    # and a good batch afterwards still updates (check an output-side layer —
    # with degenerate test rays an input layer's grads can be legitimately 0)
    rgb_before = np.asarray(state2.params_coarse["fc_rgb"]["kernel"]).copy()
    good_target = jnp.full((8, 3), 0.5)
    state3, m3 = step(state2, ro, rd, good_target, jax.random.PRNGKey(2))
    assert np.isfinite(float(m3.loss))
    assert not np.allclose(
        np.asarray(state3.params_coarse["fc_rgb"]["kernel"]), rgb_before
    )


def test_without_guard_nan_propagates():
    state, step = _setup(nan_guard=False)
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (8, 1))
    state2, _ = step(state, ro, rd, jnp.full((8, 3), jnp.nan), jax.random.PRNGKey(1))
    assert not np.isfinite(
        np.asarray(state2.params_coarse["layer1"]["kernel"])
    ).all()


def test_grad_clip_norm():
    opt = make_optimizer("adam", 1e-2, grad_clip_norm=1.0)
    params = {"w": jnp.ones((4,))}
    opt_state = opt.init(params)
    huge_grads = {"w": jnp.full((4,), 1e6)}
    updates, _ = opt.update(huge_grads, opt_state, params)
    # adam normalizes anyway; just confirm the chain runs and is finite
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_parallel_nan_guard():
    """DP steps must honor nan_guard too (code-review finding)."""
    from nerf_tpu.parallel import make_mesh, replicate_tree, shard_batch
    from nerf_tpu.parallel.dp import make_parallel_train_step

    settings = RenderSettings(
        num_coarse=4, num_fine=0, perturb=False, radiance_field_noise_std=0.5,
        num_encoding_fn_xyz=2, num_encoding_fn_dir=2,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=8, num_encoding_fn_xyz=2, num_encoding_fn_dir=2
    )
    opt = make_optimizer("adam", 1e-2)
    mesh = make_mesh()
    state = replicate_tree(mesh, create_train_state(model, None, opt, jax.random.PRNGKey(0)))
    step = make_parallel_train_step(model, None, settings, opt, mesh, nan_guard=True)
    ro = jnp.zeros((16, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (16, 1))
    bad = jnp.full((16, 3), jnp.nan)
    before = np.asarray(state.params_coarse["layer1"]["kernel"]).copy()
    state2, metrics = step(state, *shard_batch(mesh, ro, rd, bad), jax.random.PRNGKey(1))
    assert not np.isfinite(float(metrics.loss))
    np.testing.assert_array_equal(
        np.asarray(state2.params_coarse["layer1"]["kernel"]), before
    )
