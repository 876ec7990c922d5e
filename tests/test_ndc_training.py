"""End-to-end training through the NDC ray parameterization (the LLFF/fern
path: forward-facing cameras, near 0 / far 1 in NDC space)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # convergence run

from nerf_tpu.data.synthetic import render_analytic_image
from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_train_loop,
)
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops import get_ray_bundle


def _forward_facing_dataset(n_views=5, size=16, focal=20.0):
    """Cameras on a small grid at z=4 looking down -z at the analytic sphere."""
    images, origins, directions = [], [], []
    offsets = np.linspace(-0.4, 0.4, n_views)
    for dx in offsets:
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = dx
        c2w[2, 3] = 4.0
        img = render_analytic_image(size, size, focal, c2w, num_samples=96)
        ro, rd = get_ray_bundle(size, size, focal, jnp.asarray(c2w))
        images.append(img.reshape(-1, 3))
        origins.append(np.asarray(ro).reshape(-1, 3))
        directions.append(np.asarray(rd).reshape(-1, 3))
    return (
        jnp.asarray(np.concatenate(origins)),
        jnp.asarray(np.concatenate(directions)),
        jnp.asarray(np.concatenate(images)),
    )


def test_ndc_training_converges():
    size, focal = 16, 20.0
    ro, rd, tgt = _forward_facing_dataset(size=size, focal=focal)

    settings = RenderSettings(
        num_coarse=24, num_fine=0, perturb=True,
        white_background=True, radiance_field_noise_std=0.2,
        use_ndc=True, near=0.0, far=1.0,
        height=size, width=size, focal_length=focal,
        num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
    )
    model = FlexibleNeRFModel(
        num_layers=3, hidden_size=32, num_encoding_fn_xyz=6, num_encoding_fn_dir=4
    )
    opt = make_optimizer("adam", 5e-3)
    state = create_train_state(model, None, opt, jax.random.PRNGKey(0))
    loop = make_train_loop(model, None, settings, opt, batch_size=256, steps_per_call=50)

    state, m0 = loop(state, ro, rd, tgt, jax.random.PRNGKey(1))  # state donated
    m = m0
    for c in range(5):
        state, m = loop(state, ro, rd, tgt, jax.random.PRNGKey(2 + c))
    first = float(jnp.mean(m0.loss[:10]))
    last = float(jnp.mean(m.loss))
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)
