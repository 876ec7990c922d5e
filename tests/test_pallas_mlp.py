"""Fused Pallas encode+MLP kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles natively on TPU — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.renderer import RenderSettings, encode_points
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops.pallas.mlp import fused_flexible_mlp, supports_fused


def _default_model_and_params():
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_supports_fused_detection():
    model, params = _default_model_and_params()
    assert supports_fused(model, params)
    other = FlexibleNeRFModel(num_layers=6, num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    assert not supports_fused(other, other.init(jax.random.PRNGKey(0)))


def test_fused_mlp_matches_xla_path(rng):
    model, params = _default_model_and_params()
    n = 300  # deliberately not a tile multiple -> padding path
    pts = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))

    settings = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    # XLA reference: encode then apply, via the same public helpers the
    # renderer uses (pts get a samples axis of 1).
    enc = encode_points(pts[:, None, :], dirs, settings)[:, 0, :]
    expected = np.asarray(model.apply(params, enc))

    out = fused_flexible_mlp(params, pts, dirs, tile=256, interpret=True)
    assert out.shape == (n, 4)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)
