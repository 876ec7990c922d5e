"""Fused PaperNeRF (8x256) feature-major kernel (interpret mode) vs XLA.

Real-TPU Mosaic parity + perf: tests/test_tpu_kernels.py and
docs/PARITY.md's PaperNeRF kernel row.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.engine.renderer import RenderSettings, encode_points
from nerf_tpu.models import PaperNeRFModel
from nerf_tpu.ops.pallas.paper_t import (
    _sample_tile,
    fused_paper_mlp_t,
    supports_fused_paper,
)


@pytest.fixture(scope="module")
def paper():
    model = PaperNeRFModel()  # 6/4 encodings — the reference default
    return model, model.init(jax.random.PRNGKey(0))


def test_sample_tile_divisors():
    assert _sample_tile(64) == 16   # 128 rays x 16 samples = 2048 lanes
    assert _sample_tile(128) == 16
    assert _sample_tile(8) == 8
    assert _sample_tile(7) == 7
    assert _sample_tile(33) == 11


@pytest.mark.parametrize("n,s", [(33, 64), (128, 16), (5, 128), (140, 7)])
def test_matches_xla_radiance_field(paper, n, s):
    """Covers multi-sample-chunk tiles (s=64/128 -> s_t=16: the per-ray dc
    block is reused across chunks), ragged ray counts, and odd sample
    counts."""
    model, params = paper
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (n, s, 3), minval=-1.3, maxval=1.3)
    vd = jax.random.normal(key, (n, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    st = RenderSettings(num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
    want = np.asarray(model.apply(params, encode_points(pts, vd, st)))
    got = np.asarray(fused_paper_mlp_t(params, pts, vd, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_xla_wider_encoding():
    """Parameterized over encoding widths (10/4, the lego-protocol widths)."""
    model = PaperNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(3))
    assert supports_fused_paper(model, params)
    key = jax.random.PRNGKey(4)
    pts = jax.random.uniform(key, (17, 32, 3), minval=-2.0, maxval=2.0)
    vd = jax.random.normal(key, (17, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    st = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    want = np.asarray(model.apply(params, encode_points(pts, vd, st)))
    got = np.asarray(
        fused_paper_mlp_t(params, pts, vd, num_freq_xyz=10, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_supports_fused_paper_gates(paper):
    model, params = paper
    assert supports_fused_paper(model, params)
    assert not supports_fused_paper(
        dataclasses.replace(model, use_viewdirs=False), params
    )
    from nerf_tpu.models import FlexibleNeRFModel

    flex = FlexibleNeRFModel()
    assert not supports_fused_paper(flex, flex.init(jax.random.PRNGKey(0)))


def test_renderer_dispatches_to_paper_kernel(paper, monkeypatch):
    """use_pallas=True routes PaperNeRF radiance-field eval through the
    fused kernel, and the rendered output matches the XLA path."""
    import nerf_tpu.ops.pallas.paper_t as paper_t_mod
    from nerf_tpu.engine.renderer import render_rays

    model, params = paper
    calls = {"n": 0}
    real = paper_t_mod.fused_paper_mlp_t

    def spy(*args, **kwargs):
        calls["n"] += 1
        kwargs["interpret"] = True  # CPU backend in tests
        return real(*args, **kwargs)

    monkeypatch.setattr(paper_t_mod, "fused_paper_mlp_t", spy)
    # The production gate only dispatches Mosaic kernels on a TPU backend
    # (tests/test_models.py covers the CPU fallback); mock it so the
    # dispatch contract itself is what this test exercises.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    key = jax.random.PRNGKey(2)
    ro = jax.random.uniform(key, (16, 3), minval=-1, maxval=1)
    rd = ro - jnp.array([0.0, 0.0, 2.0])
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=False, radiance_field_noise_std=0.0,
        near=2.0, far=6.0, num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
        use_pallas=True,
    )
    out = render_rays(model, params, model, params, ro, rd, settings, None)
    assert calls["n"] == 2  # coarse + fine stages
    assert np.isfinite(np.asarray(out.fine.rgb)).all()

    xla = render_rays(
        model, params, model, params, ro, rd,
        dataclasses.replace(settings, use_pallas=False), None,
    )
    np.testing.assert_allclose(
        np.asarray(out.fine.rgb), np.asarray(xla.fine.rgb), rtol=1e-4, atol=1e-4
    )
