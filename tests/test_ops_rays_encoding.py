"""Golden tests for ray generation, NDC projection, and positional encoding.

Expected values are computed by independent numpy specs written here (the
reference's published math), not by importing the reference.
"""

import jax.numpy as jnp
import numpy as np

from nerf_tpu.ops import (
    encoding_dim,
    get_ray_bundle,
    meshgrid_xy,
    ndc_rays,
    positional_encoding,
)


def test_meshgrid_xy():
    ii, jj = meshgrid_xy(jnp.arange(3.0), jnp.arange(4.0, 7.0))
    ei, ej = np.meshgrid(np.arange(3.0), np.arange(4.0, 7.0), indexing="xy")
    np.testing.assert_array_equal(np.asarray(ii), ei)
    np.testing.assert_array_equal(np.asarray(jj), ej)


def _numpy_ray_bundle(H, W, focal, c2w):
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def test_get_ray_bundle_matches_numpy_spec(rng):
    H, W, focal = 5, 7, 11.0
    # A random rigid-ish pose.
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = rng.standard_normal((3, 3)).astype(np.float32)
    c2w[:3, 3] = rng.standard_normal(3).astype(np.float32)
    ro, rd = get_ray_bundle(H, W, focal, jnp.array(c2w))
    ero, erd = _numpy_ray_bundle(H, W, focal, c2w)
    assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
    np.testing.assert_allclose(np.asarray(ro), ero, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), erd, rtol=1e-5, atol=1e-6)


def test_ndc_rays_near_plane_and_bounds(rng):
    H, W, focal = 10, 12, 15.0
    rays_o = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
    rays_d = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5  # forward-facing
    rays_o[:, 2] = np.abs(rays_o[:, 2]) + 2.0
    no, nd = ndc_rays(H, W, focal, 1.0, jnp.array(rays_o), jnp.array(rays_d))
    no, nd = np.asarray(no), np.asarray(nd)
    # Spec: after shifting to the near plane, o2 = 1 + 2*near/oz and
    # d2 = -2*near/oz, so o2 + d2 == 1 (the far plane maps to z=1 in NDC).
    np.testing.assert_allclose(no[:, 2] + nd[:, 2], 1.0, rtol=1e-4)
    # And the origin z equals 1 + 2*near/oz for the shifted origin.
    t = -(1.0 + rays_o[:, 2]) / rays_d[:, 2]
    shifted = rays_o + t[:, None] * rays_d
    np.testing.assert_allclose(no[:, 2], 1.0 + 2.0 / shifted[:, 2], rtol=1e-4)


def test_positional_encoding_layout(rng):
    x = rng.standard_normal((4, 3)).astype(np.float32)
    n = 4
    out = np.asarray(positional_encoding(jnp.array(x), n, include_input=True, log_sampling=True))
    assert out.shape == (4, encoding_dim(3, n))
    freqs = 2.0 ** np.linspace(0.0, n - 1, n)
    expected = [x]
    for f in freqs:
        expected.append(np.sin(x * f))
        expected.append(np.cos(x * f))
    np.testing.assert_allclose(out, np.concatenate(expected, -1), rtol=1e-5, atol=1e-6)


def test_positional_encoding_options(rng):
    x = rng.standard_normal((4, 3)).astype(np.float32)
    # linear sampling
    out = np.asarray(positional_encoding(jnp.array(x), 3, include_input=False, log_sampling=False))
    freqs = np.linspace(1.0, 4.0, 3)
    expected = []
    for f in freqs:
        expected.append(np.sin(x * f))
        expected.append(np.cos(x * f))
    np.testing.assert_allclose(out, np.concatenate(expected, -1), rtol=1e-5, atol=1e-6)
    # zero encoding functions -> passthrough (nerf_helpers.py:153-155)
    out = positional_encoding(jnp.array(x), 0, include_input=True)
    np.testing.assert_array_equal(np.asarray(out), x)


class TestCoarseToFineWindow:
    """BARF eq. 14 window (ops/encoding.py) used by joint pose+scene
    training (engine/pose_opt.make_joint_train_loop)."""

    def test_window_endpoints_and_ramp(self):
        from nerf_tpu.ops.encoding import coarse_to_fine_window

        w0 = np.asarray(coarse_to_fine_window(6, 0.0))
        np.testing.assert_array_equal(w0, np.zeros(6))
        wfull = np.asarray(coarse_to_fine_window(6, 6.0))
        np.testing.assert_array_equal(wfull, np.ones(6))
        wmid = np.asarray(coarse_to_fine_window(6, 2.5))
        np.testing.assert_allclose(wmid[:2], 1.0)
        np.testing.assert_allclose(wmid[2], 0.5)
        np.testing.assert_allclose(wmid[3:], 0.0)

    def test_encode_points_windowing(self):
        """pe_alpha_xyz masks exactly the xyz frequency blocks: alpha=0
        zeroes every band (raw xyz + dir encoding pass through); alpha=F
        reproduces the unwindowed encoding bit-for-bit."""
        import dataclasses

        from nerf_tpu.engine.renderer import RenderSettings, encode_points

        pts = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4, 3)),
                          jnp.float32)
        dirs = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)),
                           jnp.float32)
        s = RenderSettings(num_encoding_fn_xyz=4, num_encoding_fn_dir=2)
        base = np.asarray(encode_points(pts, dirs, s))
        full = np.asarray(encode_points(
            pts, dirs, dataclasses.replace(s, pe_alpha_xyz=4.0)))
        np.testing.assert_array_equal(full, base)
        closed = np.asarray(encode_points(
            pts, dirs, dataclasses.replace(s, pe_alpha_xyz=0.0)))
        xyz_dim = 3 + 2 * 3 * 4
        np.testing.assert_array_equal(closed[..., :3], base[..., :3])
        np.testing.assert_array_equal(closed[..., 3:xyz_dim], 0.0)
        np.testing.assert_array_equal(closed[..., xyz_dim:],
                                      base[..., xyz_dim:])
