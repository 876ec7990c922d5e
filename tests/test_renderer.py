"""Tests for the hierarchical render engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.data.poses import pose_spherical
from nerf_tpu.data.synthetic import render_analytic_image
from nerf_tpu.engine.renderer import (
    RenderSettings,
    make_image_render_fn,
    make_render_fn,
    render_rays,
)
from nerf_tpu.models import FlexibleNeRFModel, VeryTinyNeRFModel
from nerf_tpu.ops import get_ray_bundle


def _tiny_setup(num_fine=8, use_viewdirs=True, **kw):
    settings = RenderSettings(
        num_coarse=8,
        num_fine=num_fine,
        chunksize=64,
        perturb=False,
        use_viewdirs=use_viewdirs,
        num_encoding_fn_xyz=4,
        num_encoding_fn_dir=2,
        **kw,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
        use_viewdirs=use_viewdirs,
    )
    params = model.init(jax.random.PRNGKey(0))
    return settings, model, params


def test_render_rays_shapes_coarse_fine():
    settings, model, params = _tiny_setup()
    ro = jnp.zeros((10, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (10, 1))
    out = render_rays(model, params, model, params, ro, rd, settings)
    assert out.coarse.rgb.shape == (10, 3)
    assert out.coarse.weights.shape == (10, 8)
    assert out.fine.rgb.shape == (10, 3)
    assert out.fine.weights.shape == (10, 16)  # coarse + fine samples sorted together
    assert out.rgb is out.fine.rgb


def test_render_rays_no_fine():
    settings, model, params = _tiny_setup(num_fine=0)
    ro = jnp.zeros((4, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (4, 1))
    out = render_rays(model, params, None, None, ro, rd, settings)
    assert out.fine is None
    assert out.rgb is out.coarse.rgb


def test_render_rays_requires_key_when_stochastic():
    settings, model, params = _tiny_setup()
    settings = settings.__class__(**{**settings.__dict__, "perturb": True})
    ro = jnp.zeros((4, 3))
    rd = jnp.ones((4, 3))
    with pytest.raises(ValueError):
        render_rays(model, params, None, None, ro, rd, settings, key=None)


def test_render_fn_jits_and_is_deterministic():
    settings, model, params = _tiny_setup()
    render = make_render_fn(model, model, settings)
    ro = jnp.zeros((16, 3))
    rd = jnp.tile(jnp.array([0.3, -0.2, -1.0]), (16, 1))
    a = render(params, params, ro, rd)
    b = render(params, params, ro, rd)
    np.testing.assert_array_equal(np.asarray(a.fine.rgb), np.asarray(b.fine.rgb))


def test_render_maps_dict_canonical_keys():
    """The shared output-dict assembly (engine.renderer.render_maps_dict —
    used by the serial image renderer, both sharded renderers, and the
    driver check) exposes rgb/disp/acc/depth for both stages, and depth is
    consistent with disp (disp ~ 1/(depth/acc) per ops/volume.py)."""
    from nerf_tpu.engine.renderer import render_maps_dict

    settings, model, params = _tiny_setup()
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.array([0.1, 0.2, -1.0]), (8, 1))
    out = render_rays(model, params, model, params, ro, rd, settings, None)
    maps = render_maps_dict(out)
    assert set(maps) == {
        "rgb_coarse", "disp_coarse", "acc_coarse", "depth_coarse",
        "rgb_fine", "disp_fine", "acc_fine", "depth_fine",
    }
    assert maps["depth_fine"].shape == (8,)
    np.testing.assert_array_equal(
        np.asarray(maps["depth_fine"]), np.asarray(out.fine.depth)
    )
    # weights stay out of the dict by design (S-times larger than any map).
    assert not any("weight" in k for k in maps)


def test_eval_variant_disables_stochasticity():
    s = RenderSettings(perturb=True, radiance_field_noise_std=1.0)
    e = s.eval_variant()
    assert e.perturb is False and e.radiance_field_noise_std == 0.0
    assert s.perturb is True  # original untouched


@pytest.mark.slow
def test_image_render_chunking_matches_unchunked():
    """lax.map chunked rendering must be numerically identical to one big batch."""
    settings, model, params = _tiny_setup()
    H, W, focal = 6, 9, 10.0  # 54 rays, chunk 64 -> padding path exercised too
    pose = jnp.asarray(pose_spherical(30.0, -30.0, 4.0))
    ro, rd = get_ray_bundle(H, W, focal, pose)

    render_image = make_image_render_fn(model, model, settings)
    img = render_image(params, params, ro, rd)
    assert img["rgb_fine"].shape == (H, W, 3)
    assert img["disp_coarse"].shape == (H, W)

    flat = render_rays(
        model, params, model, params, ro.reshape(-1, 3), rd.reshape(-1, 3), settings
    )
    np.testing.assert_allclose(
        np.asarray(img["rgb_fine"]),
        np.asarray(flat.fine.rgb).reshape(H, W, 3),
        rtol=1e-5,
        atol=1e-6,
    )


def test_ndc_settings_path_runs():
    settings, model, params = _tiny_setup(
        use_ndc=True, height=8, width=8, focal_length=10.0, near=0.0, far=1.0
    )
    pose = jnp.asarray(pose_spherical(0.0, -5.0, 1.0))
    ro, rd = get_ray_bundle(8, 8, 10.0, pose)
    out = render_rays(
        model, params, None, None, ro.reshape(-1, 3), rd.reshape(-1, 3), settings
    )
    assert np.isfinite(np.asarray(out.coarse.rgb)).all()


def test_analytic_scene_renders_a_sphere():
    img = render_analytic_image(24, 24, 20.0, pose_spherical(0.0, -30.0, 4.0))
    assert img.shape == (24, 24, 3)
    # white background at corners, object in the middle
    assert img[0, 0].mean() > 0.98
    assert img[12, 12].mean() < 0.95


def test_make_pose_render_fn_output_modes():
    """The shared pose->image wrapper (relay-transfer tricks) matches the
    underlying image renderer in every output mode."""
    from nerf_tpu.engine.renderer import make_pose_render_fn

    settings, model, params = _tiny_setup()
    h = w = 8
    focal = 4.0
    pose = jnp.asarray(pose_spherical(30.0, -30.0, 4.0), jnp.float32)[:3, :4]

    base = make_image_render_fn(model, model, settings)
    ro, rd = get_ray_bundle(h, w, focal, pose)
    expected = base(params, params, ro, rd)
    exp_rgb = np.clip(np.asarray(expected["rgb_fine"]), 0.0, 1.0)

    f32 = make_pose_render_fn(model, model, settings, h, w, focal, output="f32")
    got = np.asarray(f32(params, params, pose))
    assert got.shape == (h, w, 3)
    np.testing.assert_allclose(got, exp_rgb, atol=1e-6)

    u8 = make_pose_render_fn(model, model, settings, h, w, focal, output="u8")
    got_u8 = np.asarray(u8(params, params, pose))
    assert got_u8.dtype == np.uint8
    np.testing.assert_array_equal(
        got_u8, (exp_rgb * 255.0).astype(np.uint8)
    )

    maps = make_pose_render_fn(model, model, settings, h, w, focal, output="maps")(
        params, params, pose
    )
    assert set(maps) >= {"rgb_fine", "rgb_coarse", "disp_fine", "rgb_u8"}
    np.testing.assert_array_equal(np.asarray(maps["rgb_u8"]), got_u8)

    with pytest.raises(ValueError):
        make_pose_render_fn(model, model, settings, h, w, focal, output="png")
