"""Multi-step scan training loop: equivalence with per-step calls + the
sharded variant on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_train_loop,
)
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.parallel import make_mesh, replicate_tree, shard_batch
from nerf_tpu.parallel.dp import make_parallel_train_loop


def _setup():
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=True, radiance_field_noise_std=0.1,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    opt = make_optimizer("adam", 1e-3)
    return settings, model, opt


def _stores(n=256, seed=0):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    rd = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32) - [0, 0, 1.5])
    tgt = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return ro, rd, tgt


def test_train_loop_runs_k_steps_and_learns():
    settings, model, opt = _setup()
    state = create_train_state(model, model, opt, jax.random.PRNGKey(0))
    loop = make_train_loop(model, model, settings, opt, batch_size=32, steps_per_call=10)
    ro, rd, _ = _stores()
    tgt = jnp.full_like(ro, 0.3)  # learnable: the model can fit a constant
    state, metrics = loop(state, ro, rd, tgt, jax.random.PRNGKey(1))
    assert int(state.step) == 10
    assert metrics.loss.shape == (10,)
    for _ in range(8):
        state, metrics2 = loop(state, ro, rd, tgt, jax.random.PRNGKey(2))
    assert int(state.step) == 90
    # averaged over a call, the loss must have come down from the start
    assert float(jnp.mean(metrics2.loss)) < float(jnp.mean(metrics.loss))


def test_train_loop_rng_depends_on_step():
    """fold_in(base_key, state.step) must give different batches per step —
    losses within a scan should not be constant."""
    settings, model, opt = _setup()
    state = create_train_state(model, model, opt, jax.random.PRNGKey(0))
    loop = make_train_loop(model, model, settings, opt, batch_size=32, steps_per_call=5)
    ro, rd, tgt = _stores()
    _, metrics = loop(state, ro, rd, tgt, jax.random.PRNGKey(1))
    losses = np.asarray(metrics.loss)
    assert len(np.unique(np.round(losses, 8))) > 1


def test_parallel_train_loop_on_mesh():
    settings, model, opt = _setup()
    mesh = make_mesh()
    state = replicate_tree(
        mesh, create_train_state(model, model, opt, jax.random.PRNGKey(0))
    )
    loop = make_parallel_train_loop(
        model, model, settings, opt, mesh, batch_size=64, steps_per_call=6
    )
    ro, rd, tgt = _stores(n=512)
    ro, rd, tgt = shard_batch(mesh, ro, rd, tgt)
    state, metrics = loop(state, ro, rd, tgt, jax.random.PRNGKey(1))
    assert int(state.step) == 6
    assert metrics.loss.shape == (6,)
    assert np.isfinite(np.asarray(metrics.loss)).all()
    # another call continues
    state, _ = loop(state, ro, rd, tgt, jax.random.PRNGKey(2))
    assert int(state.step) == 12


def test_parallel_loop_batch_divisibility():
    import pytest

    settings, model, opt = _setup()
    mesh = make_mesh()
    with pytest.raises(ValueError):
        make_parallel_train_loop(
            model, model, settings, opt, mesh, batch_size=30, steps_per_call=2
        )

def test_parallel_train_loop_sliced_sampling():
    """DP loop with sliced sampling: per-shard contiguous windows of the
    local store shard; runs, steps, stays finite on the virtual mesh."""
    settings, model, opt = _setup()
    mesh = make_mesh()
    state = replicate_tree(
        mesh, create_train_state(model, model, opt, jax.random.PRNGKey(0))
    )
    loop = make_parallel_train_loop(
        model, model, settings, opt, mesh, batch_size=64, steps_per_call=6,
        sample_mode="sliced",
    )
    ro, rd, tgt = _stores(n=512)
    ro, rd, tgt = shard_batch(mesh, ro, rd, tgt)
    state, metrics = loop(state, ro, rd, tgt, jax.random.PRNGKey(1))
    assert int(state.step) == 6
    assert np.isfinite(np.asarray(metrics.loss)).all()
