"""REAL-TPU Pallas kernel parity tests (Mosaic-compiled, not interpret mode).

Interpret mode diverges from Mosaic in exactly the bug classes that have
bitten this repo (arithmetic reassociation, -inf*0 in matmuls, unsupported
shape casts surface only at compile time — CLAUDE.md hazards), so CI's
interpret-mode tests cannot stand in for hardware runs. This file compiles
and executes the production kernels on the actual chip.

Run (claims the single TPU — serialize with other TPU work):
    NERF_TPU_TESTS_ON_TPU=1 python -m pytest tests/test_tpu_kernels.py -q

Skipped automatically under the normal CPU-mesh suite.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("NERF_TPU_TESTS_ON_TPU") != "1",
    reason="real-TPU kernel tests run only under NERF_TPU_TESTS_ON_TPU=1",
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture(scope="module")
def tpu_backend():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"no TPU backend (have {jax.default_backend()})")
    return jax.default_backend()


@pytest.fixture(scope="module")
def flagship(tpu_backend):
    from nerf_tpu.models import FlexibleNeRFModel

    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    return model, model.init(jax.random.PRNGKey(0))


def test_mlp_t_matches_xla_on_chip(flagship):
    """Feature-major fused encode+MLP (the production eval path) vs the XLA
    radiance-field evaluation, Mosaic-compiled, f32."""
    from nerf_tpu.engine.renderer import RenderSettings, encode_points
    from nerf_tpu.ops.pallas.mlp_t import fused_mlp_t

    model, params = flagship
    key = jax.random.PRNGKey(1)
    n, s = 333, 64  # non-multiple of the 128-ray tile: exercises padding
    pts = jax.random.uniform(key, (n, s, 3), minval=-1.3, maxval=1.3)
    vd = jax.random.normal(key, (n, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    st = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    with jax.default_matmul_precision("highest"):
        want = np.asarray(
            jax.jit(lambda p, e: model.apply(p, e))(
                params, encode_points(pts, vd, st)
            )
        )
    got = np.asarray(fused_mlp_t(params, pts, vd))
    # The kernel's sinusoid arguments are exact f32 (VPU multiplies), but its
    # hidden-layer dots run at the MXU's DEFAULT precision — bf16 inputs with
    # f32 accumulation — exactly like XLA's default f32 matmuls on TPU
    # (CLAUDE.md: "TPU default matmul precision is already bf16"). vs a
    # HIGHEST-precision XLA reference that leaves ~1e-3 absolute rounding;
    # anything beyond (e.g. the 1.5e-2 phase error when the sin args went
    # through a default-precision matmul) is a real bug this test catches.
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_mlp_t_bf16_close_on_chip(flagship):
    from nerf_tpu.engine.renderer import RenderSettings, encode_points
    from nerf_tpu.ops.pallas.mlp_t import fused_mlp_t

    model, params = flagship
    key = jax.random.PRNGKey(2)
    pts = jax.random.uniform(key, (256, 64, 3), minval=-1.3, maxval=1.3)
    vd = jax.random.normal(key, (256, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    st = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    want = np.asarray(model.apply(params, encode_points(pts, vd, st)))
    got = np.asarray(fused_mlp_t(params, pts, vd, compute_dtype="bfloat16"))
    # bf16 matmul inputs, f32 accumulate: ~1e-2 relative class.
    err = np.abs(got - want) / (np.abs(want) + 1.0)
    assert np.quantile(err, 0.99) < 2e-2


def test_paper_t_matches_xla_on_chip(tpu_backend):
    """Fused PaperNeRF (8x256) kernel vs the XLA radiance-field evaluation,
    Mosaic-compiled, f32 — covers the multi-sample-chunk grid (s=64 ->
    s_t=16) and ragged ray padding on hardware."""
    from nerf_tpu.engine.renderer import RenderSettings, encode_points
    from nerf_tpu.models import PaperNeRFModel
    from nerf_tpu.ops.pallas.paper_t import fused_paper_mlp_t

    model = PaperNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    n, s = 333, 64
    pts = jax.random.uniform(key, (n, s, 3), minval=-1.3, maxval=1.3)
    vd = jax.random.normal(key, (n, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    st = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    with jax.default_matmul_precision("highest"):
        want = np.asarray(
            jax.jit(lambda p, e: model.apply(p, e))(
                params, encode_points(pts, vd, st)
            )
        )
    got = np.asarray(fused_paper_mlp_t(params, pts, vd, num_freq_xyz=10))
    # Same tolerance class as the Flexible kernel test above: the 8-layer
    # 256-wide trunk accumulates a little more default-precision rounding.
    np.testing.assert_allclose(got, want, atol=4e-3, rtol=4e-3)


def test_resample_kernel_matches_xla_on_chip(tpu_backend):
    """Fused inverse-CDF resampling, Mosaic-compiled (the interpret-mode
    tests in test_pallas_resample.py can't catch Mosaic reassociation)."""
    from nerf_tpu.ops.pallas.resample import fused_sample_pdf
    from nerf_tpu.ops.sampling import sample_pdf

    rng = np.random.default_rng(0)
    n, m, s = 200, 63, 128
    z = np.sort(rng.uniform(2.0, 6.0, (n, m)).astype(np.float32), axis=-1)
    w = rng.uniform(0.0, 1.0, (n, m - 1)).astype(np.float32)
    w[0, :] = 0.0
    want = np.asarray(sample_pdf(jnp.asarray(z), jnp.asarray(w), s, det=True))
    got = np.asarray(
        fused_sample_pdf(jnp.asarray(z), jnp.asarray(w), s, det=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-4)


def test_full_pallas_image_path_on_chip(tpu_backend):
    """End-to-end: the pallas image render path (MLP kernel + XLA composite
    + XLA resample) vs the pure-XLA f32 path at image scale on the REAL
    lego-lowres weights — divergence must stay in the boundary-pixel class
    (a real scene is mostly smooth; random weights would put resample flips
    everywhere and measure nothing)."""
    import dataclasses

    from nerf_tpu.data import pose_spherical
    from nerf_tpu.engine.checkpoint import load_reference_checkpoint
    from nerf_tpu.engine.renderer import RenderSettings, make_image_render_fn
    from nerf_tpu.models import FlexibleNeRFModel
    from nerf_tpu.ops import get_ray_bundle
    from nerf_tpu.utils import psnr

    ckpt_path = "/root/reference/pretrained/lego-lowres/checkpoint199999.ckpt"
    if not os.path.exists(ckpt_path):
        pytest.skip("pretrained checkpoint absent")
    ckpt = load_reference_checkpoint(ckpt_path)
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    pc = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    pf = jax.tree.map(jnp.asarray, ckpt["params_fine"])
    side = 100
    focal = 0.5 * side / np.tan(0.5 * 0.6911112070083618)
    base = RenderSettings(
        num_coarse=64, num_fine=64, perturb=False, white_background=True,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        chunksize=side * side,
    )
    pose = jnp.asarray(pose_spherical(45.0, -30.0, 4.0))
    ro, rd = get_ray_bundle(side, side, focal, pose)
    xla = make_image_render_fn(model, model, base)(pc, pf, ro, rd)
    pal = make_image_render_fn(
        model, model, dataclasses.replace(base, use_pallas=True)
    )(pc, pf, ro, rd)
    a, b = np.asarray(pal["rgb_fine"]), np.asarray(xla["rgb_fine"])
    assert np.isfinite(a).all()
    # Trained-checkpoint Pallas-vs-XLA agreement measured ~53 dB across
    # poses/resolutions (tools/guard_floor_probe.py, PARITY "Numerics-guard
    # floor"); 48 leaves 5 dB for compiler-version drift while still
    # catching any real Mosaic regression (tens-of-dB drops).
    assert psnr(a, b) > 48.0, f"pallas vs xla image PSNR {psnr(a, b):.1f} dB"
