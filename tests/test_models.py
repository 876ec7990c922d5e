"""Model family tests: shapes, registry, and forward parity against the
shipped pretrained torch checkpoints (real weights, torch functional spec)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.engine.checkpoint import (
    convert_torch_state_dict,
    load_reference_checkpoint,
    to_torch_state_dict,
)
from nerf_tpu.models import (
    MODEL_REGISTRY,
    FlexibleNeRFModel,
    MultiHeadNeRFModel,
    PaperNeRFModel,
    ReplicateNeRFModel,
    VeryTinyNeRFModel,
    get_model,
)

PRETRAINED = "/root/reference/pretrained/lego-lowres/checkpoint199999.ckpt"


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_init_apply_shapes(name):
    model = get_model(name)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.ones((10, model.input_dim))
    out = model.apply(params, x)
    assert out.shape == (10, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_registry_rejects_unknown():
    with pytest.raises(ValueError):
        get_model("NoSuchModel")


def test_flexible_model_size_params_take_effect():
    """Unlike the reference (SURVEY.md §5 quirk 1), size hyperparams must work."""
    model = FlexibleNeRFModel(num_layers=6, hidden_size=256, skip_connect_every=2)
    params = model.init(jax.random.PRNGKey(0))
    assert params["layer1"]["kernel"].shape == (model.dim_xyz, 256)
    assert len(params["layers_xyz"]) == 5
    # layers_xyz[2] and [4]: i%2==0, i>0; i=4 is excluded only if == num_layers-1=5
    assert params["layers_xyz"][2]["kernel"].shape == (model.dim_xyz + 256, 256)
    out = model.apply(params, jnp.ones((3, model.input_dim)))
    assert out.shape == (3, 4)


def test_flexible_no_viewdirs():
    model = FlexibleNeRFModel(use_viewdirs=False)
    params = model.init(jax.random.PRNGKey(0))
    assert "fc_out" in params and "layers_dir" not in params
    out = model.apply(params, jnp.ones((3, model.input_dim)))
    assert out.shape == (3, 4)


def test_init_matches_torch_linear_bounds():
    model = VeryTinyNeRFModel()
    params = model.init(jax.random.PRNGKey(0))
    w = np.asarray(params["layer1"]["kernel"])
    bound = 1.0 / np.sqrt(model.input_dim)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range


# ---------------------------------------------------------------------------
# Parity against the real pretrained checkpoint
# ---------------------------------------------------------------------------

def _torch_flexible_forward(state_dict, x):
    """Reference FlexibleNeRFModel default-config forward as a torch functional
    spec (nerf/models.py:233-254, 4 layers / 128 hidden / viewdirs, no skip)."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x)
    dim_xyz = 63
    xyz, view = t[..., :dim_xyz], t[..., dim_xyz:]

    def lin(name, inp):
        return F.linear(inp, state_dict[f"{name}.weight"], state_dict[f"{name}.bias"])

    h = lin("layer1", xyz)
    for i in range(3):
        h = F.relu(lin(f"layers_xyz.{i}", h))
    feat = F.relu(lin("fc_feat", h))
    alpha = lin("fc_alpha", h)
    h = torch.cat([feat, view], -1)
    h = F.relu(lin("layers_dir.0", h))
    rgb = lin("fc_rgb", h)
    return torch.cat([rgb, alpha], -1).numpy()


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="pretrained ckpt absent")
def test_forward_parity_with_pretrained_checkpoint(rng):
    import torch

    ckpt = torch.load(PRETRAINED, map_location="cpu", weights_only=True)
    sd = ckpt["model_fine_state_dict"]

    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    assert model.dim_xyz == 63 and model.dim_dir == 27
    params = convert_torch_state_dict(sd)

    x = rng.standard_normal((64, model.input_dim)).astype(np.float32)
    ours = np.asarray(model.apply(params, jnp.array(x)))
    theirs = _torch_flexible_forward(sd, x)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="pretrained ckpt absent")
def test_checkpoint_roundtrip_and_loader():
    loaded = load_reference_checkpoint(PRETRAINED)
    assert loaded["step"] == 199999
    assert abs(loaded["psnr"] - 21.400112721807083) < 1e-6
    params = loaded["params_coarse"]
    assert params["layer1"]["kernel"].shape == (63, 128)
    # roundtrip through torch layout
    sd = to_torch_state_dict(params)
    back = convert_torch_state_dict(sd)
    np.testing.assert_array_equal(
        params["layers_xyz"][1]["kernel"], back["layers_xyz"][1]["kernel"]
    )


def test_paper_model_no_viewdirs():
    """PaperNeRFModel(use_viewdirs=False) must build matching shapes
    (code-review finding: the dir layer was sized 256+dim_dir but fed 256)."""
    model = PaperNeRFModel(use_viewdirs=False)
    params = model.init(jax.random.PRNGKey(0))
    assert params["layers_dir"][0]["kernel"].shape == (256, 128)
    out = model.apply(params, jnp.ones((5, model.input_dim)))
    assert out.shape == (5, 4)


def test_use_pallas_falls_back_on_non_tpu_backend():
    """eval/serve default to --renderer pallas; on a CPU-only host with a
    default-shaped (reference) checkpoint the TPU Mosaic kernels can't lower
    — the renderer must fall back to the XLA path, not crash (regression:
    'Only interpret mode is supported on CPU backend')."""
    import jax
    import jax.numpy as jnp

    from nerf_tpu.engine.renderer import RenderSettings, make_render_fn
    from nerf_tpu.models import FlexibleNeRFModel

    assert jax.default_backend() == "cpu"  # conftest forces CPU
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    pc = model.init(jax.random.PRNGKey(0))
    pf = model.init(jax.random.PRNGKey(1))
    s = RenderSettings(
        num_coarse=4, num_fine=4, perturb=False, near=2.0, far=6.0,
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4, use_pallas=True,
    )
    render = make_render_fn(model, model, s)
    ro = jnp.zeros((8, 3))
    rd = jnp.concatenate([jnp.zeros((8, 2)), -jnp.ones((8, 1))], -1)
    out = render(pc, pf, ro, rd)
    assert out.fine.rgb.shape == (8, 3)
