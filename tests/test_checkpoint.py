"""Native checkpoint save/restore roundtrip, including optax state and the
resume path used by train_nerf.py."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from nerf_tpu.engine.train import TrainState, create_train_state, make_optimizer
from nerf_tpu.models import FlexibleNeRFModel


def test_full_train_state_roundtrip(tmp_path):
    model = FlexibleNeRFModel(num_layers=2, hidden_size=16,
                              num_encoding_fn_xyz=4, num_encoding_fn_dir=2)
    opt = make_optimizer("adam", 1e-3, 250.0, 0.1)
    state = create_train_state(model, model, opt, jax.random.PRNGKey(0))

    path = str(tmp_path / "checkpoint00042.ntc")
    save_checkpoint(
        path,
        {
            "step": 42,
            "params_coarse": state.params_coarse,
            "params_fine": state.params_fine,
            "opt_state": state.opt_state,
            "loss": 0.5,
            "psnr": 20.0,
        },
    )
    restored = load_checkpoint(path)
    assert restored["step"] == 42
    assert restored["psnr"] == 20.0
    np.testing.assert_array_equal(
        restored["params_coarse"]["layer1"]["kernel"],
        np.asarray(state.params_coarse["layer1"]["kernel"]),
    )
    # optax state restores through the leaves+structure template path
    template = state.opt_state
    leaves = jax.tree.leaves(restored["opt_state"])
    rebuilt = jax.tree.unflatten(
        jax.tree.structure(template), [jnp.asarray(x) for x in leaves]
    )
    orig_leaves = jax.tree.leaves(template)
    for a, b in zip(jax.tree.leaves(rebuilt), orig_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored state can drive a train step
    from nerf_tpu.engine.renderer import RenderSettings
    from nerf_tpu.engine.train import make_train_step

    settings = RenderSettings(num_coarse=4, num_fine=4, perturb=False,
                              num_encoding_fn_xyz=4, num_encoding_fn_dir=2)
    step = make_train_step(model, model, settings, opt)
    new_state = TrainState(
        jnp.asarray(restored["step"], jnp.int32),
        jax.tree.map(jnp.asarray, restored["params_coarse"]),
        jax.tree.map(jnp.asarray, restored["params_fine"]),
        rebuilt,
    )
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (8, 1))
    out_state, metrics = step(new_state, ro, rd, jnp.full((8, 3), 0.5), jax.random.PRNGKey(1))
    assert int(out_state.step) == 43
    assert np.isfinite(float(metrics.loss))


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    for step in [10, 5, 20]:
        save_checkpoint(str(tmp_path / f"checkpoint{step:05d}.ntc"), {"step": step})
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint00020.ntc")
