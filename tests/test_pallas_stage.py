"""Whole-stage fused kernel (encode+MLP+composite) vs the XLA pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.renderer import RenderSettings, encode_points
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops import volume_render_radiance_field
from nerf_tpu.ops.pallas.stage import fused_render_stage


def test_fused_stage_matches_xla_pipeline(rng):
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    R, S = 20, 8  # padding path exercised (20 % 16 != 0)
    ro = jnp.asarray(rng.uniform(-1, 1, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.uniform(-1, 1, (R, 3)).astype(np.float32) - [0, 0, 1.5])
    viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(
        jnp.asarray(rng.uniform(2, 6, (R, S)).astype(np.float32)), axis=-1
    )
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]

    settings = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    rf = model.apply(params, encode_points(pts, viewdirs, settings))
    ref = volume_render_radiance_field(rf, z, rd, white_background=True)

    out = fused_render_stage(
        params, pts, viewdirs, z, rd,
        white_background=True, rays_per_tile=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref.rgb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]), np.asarray(ref.weights), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc"]), np.asarray(ref.acc), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), np.asarray(ref.depth), rtol=1e-3, atol=1e-3)


def test_fused_stage_opaque_samples(rng):
    """alpha == 1 (opaque / far-sentinel samples) must not produce NaN
    (regression: -inf logs entering the prefix matmul gave -inf * 0 = NaN)."""
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    # bias fc_alpha way up so relu(sigma) is large -> alpha saturates at 1
    params["fc_alpha"]["bias"] = params["fc_alpha"]["bias"] + 100.0
    R, S = 16, 8
    ro = jnp.zeros((R, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (R, 1))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    out = fused_render_stage(params, pts, rd, z, rd, rays_per_tile=16, interpret=True)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(out["weights"])).all()
    # first sample absorbs (nearly) everything
    w = np.asarray(out["weights"])
    assert w[:, 0].min() > 0.99
