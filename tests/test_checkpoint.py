"""Native checkpoint save/restore roundtrip, including optax state and the
resume path used by train_nerf.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_reference_optimizer_state_export(tmp_path):
    """Exported .ckpt optimizer_state_dict must be loadable by torch Adam over
    a reference-ordered parameter list and carry our Adam moments (VERDICT r1
    item 9: the reference's resume, train_nerf.py:157-163, must not crash).
    The torch model here is an independent executable spec of the reference's
    FlexibleNeRFModel registration order (nerf/models.py:185-230)."""
    import torch

    from nerf_tpu.engine.checkpoint import (
        export_reference_checkpoint,
        reference_optimizer_state_dict,
    )
    from nerf_tpu.engine.train import make_train_step
    from nerf_tpu.engine.renderer import RenderSettings

    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    opt = make_optimizer("adam", 5e-3, 250.0, 0.1)
    state = create_train_state(model, model, opt, jax.random.PRNGKey(0))
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=True, radiance_field_noise_std=0.2,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
    )
    step = make_train_step(model, model, settings, opt, jit=False)
    key = jax.random.PRNGKey(1)
    ro = jax.random.uniform(key, (16, 3), minval=-1, maxval=1)
    rd = ro - jnp.array([0.0, 0.0, 2.0])
    tgt = jax.random.uniform(key, (16, 3))
    for i in range(2):
        state, _ = step(state, ro, rd, tgt, jax.random.fold_in(key, i))

    sd = reference_optimizer_state_dict(
        state.opt_state, state.params_coarse, state.params_fine, lr=5e-3
    )

    # Independent torch spec: Linears registered in the reference's order.
    class TorchFlexible(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layer1 = torch.nn.Linear(63, 128)
            self.layers_xyz = torch.nn.ModuleList(
                [torch.nn.Linear(128, 128) for _ in range(3)]
            )
            self.layers_dir = torch.nn.ModuleList(
                [torch.nn.Linear(128 + 27, 64)]
            )
            self.fc_alpha = torch.nn.Linear(128, 1)
            self.fc_rgb = torch.nn.Linear(64, 3)
            self.fc_feat = torch.nn.Linear(128, 128)

    coarse_t, fine_t = TorchFlexible(), TorchFlexible()
    params = list(coarse_t.parameters()) + list(fine_t.parameters())
    torch_opt = torch.optim.Adam(params, lr=5e-3)
    torch_opt.load_state_dict(sd)  # the reference's exact resume call

    # Moment 0 of param 0 must be our coarse layer1 mu, transposed to (out,in).
    # (make_optimizer wraps in optax.flatten, so mu is one raveled vector —
    # unravel with the trainable template exactly as the exporter does.)
    from jax.flatten_util import ravel_pytree

    from nerf_tpu.engine.checkpoint import _find_adam_moments

    count, mu, nu = _find_adam_moments(state.opt_state)
    if not isinstance(mu, dict):
        _, unravel = ravel_pytree(
            jax.tree.map(
                np.asarray,
                {"coarse": state.params_coarse, "fine": state.params_fine},
            )
        )
        mu = unravel(np.asarray(mu))
    got = torch_opt.state_dict()["state"][0]["exp_avg"].numpy()
    want = np.asarray(mu["coarse"]["layer1"]["kernel"]).T
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert int(torch_opt.state_dict()["state"][0]["step"]) == 2

    # And a torch step must run (shapes all line up).
    for p in params:
        p.grad = torch.zeros_like(p)
    torch_opt.step()

    # Weights-only export (no opt_state) still yields a loadable state dict.
    sd_empty = reference_optimizer_state_dict(
        None, state.params_coarse, state.params_fine
    )
    torch.optim.Adam(params, lr=5e-3).load_state_dict(sd_empty)

    # Full-file roundtrip through export_reference_checkpoint.
    path = str(tmp_path / "export.ckpt")
    export_reference_checkpoint(
        path, step=2, params_coarse=state.params_coarse,
        params_fine=state.params_fine, loss=0.1, psnr=10.0,
        opt_state=state.opt_state,
    )
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    assert len(ckpt["optimizer_state_dict"]["state"]) == len(params)
