"""Empty-space acceleration: per-ray AABB-tightened sample intervals.

No reference equivalent (the reference samples the full [near, far] on
every ray, train_utils.py:45-56) — this is the TPU build's opt-in
accelerator (``RenderSettings.aabb`` + ``ops.rays.ray_aabb_interval`` +
``engine.geometry.density_aabb``). Specs here are independent numpy
implementations written in-test, per the repo convention.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.engine.geometry import density_aabb
from nerf_tpu.engine.renderer import RenderSettings, render_rays
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops import ray_aabb_interval


def _numpy_slab_spec(ro, rd, lo, hi, near, far):
    """Independent per-ray slab intersection (loop + IEEE inf semantics)."""
    out_n, out_f = [], []
    for o, d in zip(ro, rd):
        t_enter, t_exit = -np.inf, np.inf
        miss = False
        for k in range(3):
            if abs(d[k]) <= 1e-9:
                if o[k] < lo[k] or o[k] > hi[k]:
                    miss = True
                continue
            a, b = (lo[k] - o[k]) / d[k], (hi[k] - o[k]) / d[k]
            t_enter = max(t_enter, min(a, b))
            t_exit = min(t_exit, max(a, b))
        if miss or t_exit < t_enter or t_exit <= 0:
            out_n.append(near)
            out_f.append(far)
        else:
            tn = float(np.clip(t_enter, near, far))
            tf = float(np.clip(t_exit, near, far))
            out_n.append(tn)
            out_f.append(max(tf, tn + 1e-6))
    return np.array(out_n), np.array(out_f)


def test_ray_aabb_interval_matches_numpy_spec():
    rng = np.random.default_rng(7)
    ro = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    rd = rng.normal(size=(256, 3)).astype(np.float32)
    rd[:7, 0] = 0.0  # exercise the parallel-slab branch
    rd[3:5, 1] = 0.0
    lo, hi = (-1.0, -0.8, -1.2), (1.0, 1.1, 0.9)
    tn, tf = ray_aabb_interval(jnp.asarray(ro), jnp.asarray(rd), lo, hi, 2.0, 6.0)
    sn, sf = _numpy_slab_spec(ro, rd, lo, hi, 2.0, 6.0)
    np.testing.assert_allclose(np.asarray(tn), sn, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), sf, rtol=1e-5, atol=1e-5)
    assert bool(jnp.all(tf > tn))


def _rays(n, seed=0, radius=4.0):
    rng = np.random.default_rng(seed)
    ro = np.tile([[0.0, 0.0, radius]], (n, 1)).astype(np.float32)
    # Directions fanning toward the origin region.
    rd = rng.uniform(-0.25, 0.25, (n, 3)).astype(np.float32)
    rd[:, 2] = -1.0
    return jnp.asarray(ro), jnp.asarray(rd)


def test_covering_aabb_renders_identically():
    """A box containing the whole [near, far] frustum must be a no-op:
    every ray hits, and the clipped interval is exactly [near, far]."""
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    params = model.init(jax.random.PRNGKey(0))
    base = RenderSettings(
        num_coarse=16, num_fine=16, perturb=False,
        radiance_field_noise_std=0.0,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    tight = dataclasses.replace(base, aabb=(-10.0,) * 3 + (10.0,) * 3)
    ro, rd = _rays(64)
    out_a = render_rays(model, params, model, params, ro, rd, base, None)
    out_b = render_rays(model, params, model, params, ro, rd, tight, None)
    np.testing.assert_array_equal(np.asarray(out_a.fine.rgb),
                                  np.asarray(out_b.fine.rgb))


class _BlobModel:
    """Analytic radiance field: a compactly-supported density bump
    ``sigma = peak * (1 - (d/r)^2)^2`` for d < r (exactly 0 outside, like a
    trained field's sharp surfaces — a Gaussian's infinite tails would put
    real mass outside ANY bounding box and bias the comparison), constant
    color. ``apply`` sees the positional encoding; with include_input_xyz
    the first 3 features are the raw coordinates."""

    use_viewdirs = False
    dim_dir = 0

    def __init__(self, center=(0.0, 0.0, 0.0), r=0.5, sigma_peak=4.0):
        self.center = jnp.asarray(center)
        self.r = r
        self.sigma_peak = sigma_peak

    def init(self, key):
        return {}

    def apply(self, params, enc):
        xyz = enc[..., :3]
        d2 = jnp.sum((xyz - self.center) ** 2, axis=-1)
        sigma = self.sigma_peak * jax.nn.relu(1.0 - d2 / self.r ** 2) ** 2
        rgb_logit = jnp.full(enc.shape[:-1] + (3,), 2.0, enc.dtype)
        return jnp.concatenate([rgb_logit, sigma[..., None]], axis=-1)


def _blob_settings(num_coarse, num_fine=0, aabb=None):
    return RenderSettings(
        num_coarse=num_coarse, num_fine=num_fine, perturb=False,
        radiance_field_noise_std=0.0, white_background=True,
        near=2.0, far=6.0, use_viewdirs=False,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=0,
        include_input_dir=False, aabb=aabb,
    )


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def test_tightened_few_samples_beat_untightened():
    """The accelerator's value proposition: with the interval tightened to
    the occupied box, 8 coarse samples must reproduce a dense 256-sample
    gold render better than 8 untightened samples do. The blob is
    semi-transparent (peak sigma 2 -> ray opacity ~0.7) so the rendered
    color tracks the quadrature accuracy of the transmittance integral —
    an opaque blob would saturate to alpha 1 at any sample density and
    hide the difference."""
    model = _BlobModel()
    ro, rd = _rays(128, seed=3)
    gold = render_rays(model, {}, None, None, ro, rd,
                       _blob_settings(256), None).rgb
    base8 = render_rays(model, {}, None, None, ro, rd,
                        _blob_settings(8), None).rgb
    # The production recipe: bound the tau-superlevel set of the field.
    box = density_aabb(model, {}, _blob_settings(8), resolution=33,
                       bbox_min=(-1.5,) * 3, bbox_max=(1.5,) * 3, tau=0.1)
    tight8 = render_rays(model, {}, None, None, ro, rd,
                         _blob_settings(8, aabb=box), None).rgb
    psnr_base, psnr_tight = _psnr(base8, gold), _psnr(tight8, gold)
    assert psnr_tight > psnr_base + 6.0, (psnr_base, psnr_tight)
    assert psnr_tight > 30.0, psnr_tight


def test_density_aabb_bounds_the_blob():
    model = _BlobModel(center=(0.2, -0.1, 0.0), r=0.3)
    box = density_aabb(
        model, {}, _blob_settings(8), resolution=33,
        bbox_min=(-1.5,) * 3, bbox_max=(1.5,) * 3, tau=0.1,
    )
    lo, hi = np.array(box[:3]), np.array(box[3:])
    center = np.array([0.2, -0.1, 0.0])
    # Contains the dense core (sigma > tau out to ~3 r) with voxel padding...
    assert np.all(lo < center - 0.2) and np.all(hi > center + 0.2)
    # ...but is far tighter than the sweep volume.
    assert np.all(lo > -1.2) and np.all(hi < 1.2), box


class _ConstModel:
    """Constant density + color everywhere: makes the FINAL sample's dist
    (bin width vs 1e10 sentinel) visible in the composited color."""

    use_viewdirs = False
    dim_dir = 0

    def __init__(self, sigma=0.4):
        self.sigma = sigma

    def init(self, key):
        return {}

    def apply(self, params, enc):
        sigma = jnp.full(enc.shape[:-1] + (1,), self.sigma, enc.dtype)
        rgb_logit = jnp.full(enc.shape[:-1] + (3,), 1.0, enc.dtype)
        return jnp.concatenate([rgb_logit, sigma], axis=-1)


def test_near_only_tightening_keeps_far_sentinel():
    """A ray whose box crossing extends PAST the far plane gets near-only
    tightening: its interval still ends at the reference far plane, where
    space beyond the last sample is NOT known-empty — so it must keep the
    reference's 1e10 sentinel dist. Equivalent formulation: the render must
    equal an aabb-free render over the same (tightened-near, far) interval,
    which uses exact reference semantics."""
    model = _ConstModel()
    n = 8
    ro = jnp.tile(jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32), (n, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    # near=2, far=6 => z in [2, -2]. Box z-range [-10, 1]: enter at t=3,
    # exit at t=14 > far. Near tightens 2 -> 3; far stays 6.
    box = (-5.0, -5.0, -10.0, 5.0, 5.0, 1.0)
    s_box = dataclasses.replace(_blob_settings(16), aabb=box)
    s_ref = dataclasses.replace(_blob_settings(16), near=3.0, far=6.0)
    out_box = render_rays(model, {}, None, None, ro, rd, s_box, None)
    out_ref = render_rays(model, {}, None, None, ro, rd, s_ref, None)
    np.testing.assert_allclose(
        np.asarray(out_box.coarse.rgb), np.asarray(out_ref.coarse.rgb),
        rtol=1e-6, atol=1e-6,
    )
    # And the sentinel genuinely matters for this field: replacing it with
    # the local bin width would change the composited color.
    assert float(jnp.max(jnp.abs(out_box.coarse.weights[..., -1]))) > 0.1


def test_aabb_requires_two_coarse_samples():
    import pytest

    model = _ConstModel()
    ro, rd = _rays(4)
    s = dataclasses.replace(
        _blob_settings(1), aabb=(-1.0,) * 3 + (1.0,) * 3
    )
    with pytest.raises(ValueError, match="num_coarse >= 2"):
        render_rays(model, {}, None, None, ro, rd, s, None)


def test_density_aabb_warns_when_occupied_touches_sweep_bounds():
    import pytest

    # Blob hugging the +x sweep face: its sigma > tau region reaches the
    # boundary vertex, so the sweep must warn that geometry may be clipped.
    model = _BlobModel(center=(1.5, 0.0, 0.0), r=0.4)
    with pytest.warns(UserWarning, match="touches the sweep bounds"):
        box = density_aabb(
            model, {}, _blob_settings(8), resolution=17,
            bbox_min=(-1.5,) * 3, bbox_max=(1.5,) * 3, tau=0.1,
        )
    assert box[3] == 1.5  # clipped at the sweep face


def test_density_aabb_interior_blob_does_not_warn():
    import warnings

    model = _BlobModel(center=(0.0, 0.0, 0.0), r=0.3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        density_aabb(
            model, {}, _blob_settings(8), resolution=17,
            bbox_min=(-1.5,) * 3, bbox_max=(1.5,) * 3, tau=0.1,
        )


def test_density_aabb_empty_field_falls_back_to_sweep_bounds():
    model = _BlobModel(sigma_peak=0.0)
    box = density_aabb(
        model, {}, _blob_settings(8), resolution=9,
        bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3, tau=1.0,
    )
    assert box == (-1.0,) * 3 + (1.0,) * 3
