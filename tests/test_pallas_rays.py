"""Ray-major fused kernel (hoisted dir branch) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.renderer import RenderSettings, encode_points
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops.pallas.mlp import fused_flexible_mlp_rays


def test_ray_major_kernel_matches_xla(rng):
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    R, S = 20, 8  # R not a tile multiple -> padding path
    pts = jnp.asarray(rng.uniform(-2, 2, (R, S, 3)).astype(np.float32))
    dirs = rng.standard_normal((R, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))

    settings = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    expected = np.asarray(model.apply(params, encode_points(pts, dirs, settings)))

    out = fused_flexible_mlp_rays(
        params, pts, dirs, rays_per_tile=16, interpret=True
    )
    assert out.shape == (R, S, 4)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)
