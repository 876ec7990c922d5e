"""Fused PaperNeRF TRAINING kernels (custom-VJP fwd+bwd, interpret mode).

Forward parity and full parameter-gradient parity vs XLA autodiff of the
same model (reference nerf/models.py:123-183 semantics). Real-TPU Mosaic
parity + the adopt-or-retire perf data: tools/paper_train_kernel_bench.py
and docs/PARITY.md's width-256 custom-VJP row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.engine.renderer import RenderSettings, encode_points
from nerf_tpu.models import PaperNeRFModel
from nerf_tpu.ops.pallas.paper_train import (
    _regroup_gather_indices,
    _sample_tile_train,
    _unregroup_rows,
    fused_paper_mlp_train,
)


@pytest.fixture(scope="module")
def paper():
    model = PaperNeRFModel()  # 6/4 encodings — the reference default
    return model, model.init(jax.random.PRNGKey(0))


def _inputs(n, s, seed=1):
    key = jax.random.PRNGKey(seed)
    pts = jax.random.uniform(key, (n, s, 3), minval=-1.3, maxval=1.3)
    vd = jax.random.normal(key, (n, 3))
    return pts, vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)


def test_sample_tile_train_divisors():
    assert _sample_tile_train(64) == 4    # 128 rays x 4 samples = 512 lanes
    assert _sample_tile_train(128) == 4
    assert _sample_tile_train(3) == 3
    assert _sample_tile_train(7) == 1     # no divisor <= 4 beyond 1


def test_unregroup_inverts_regroup():
    g = _regroup_gather_indices(6)
    w = jnp.arange(39.0)[:, None] * jnp.ones((1, 2))
    grouped = w[g]
    np.testing.assert_array_equal(np.asarray(_unregroup_rows(grouped, 6)),
                                  np.asarray(w))


@pytest.mark.parametrize("n,s", [(33, 8), (128, 4), (140, 12)])
def test_forward_matches_xla(paper, n, s):
    """Ragged ray counts (padding) and multi-chunk tiles."""
    model, params = paper
    pts, vd = _inputs(n, s)
    st = RenderSettings(num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
    want = np.asarray(model.apply(params, encode_points(pts, vd, st)))
    got = np.asarray(fused_paper_mlp_train(params, pts, vd, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_param_grads_match_xla_autodiff(paper):
    """EVERY parameter gradient matches XLA autodiff of the same loss —
    the custom-VJP backward kernel is a full hand-derived backward (trunk
    with the layer-4 encoding skip, un-ReLU'd fc_feat, alpha-from-feat,
    the dir branch with its host-side dcontrib split, dead layers_dir[3])."""
    model, params = paper
    n, s = 65, 8  # n not a multiple of 128: zero-padded cotangent rays
    pts, vd = _inputs(n, s)
    st = RenderSettings(num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
    cot = jax.random.normal(jax.random.PRNGKey(2), (n, s, 4))

    g_fused = jax.grad(
        lambda p: jnp.sum(fused_paper_mlp_train(p, pts, vd, interpret=True)
                          * cot)
    )(params)
    g_xla = jax.grad(
        lambda p: jnp.sum(model.apply(p, encode_points(pts, vd, st)) * cot)
    )(params)

    flat_fused, tree_fused = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_xla, tree_xla = jax.tree_util.tree_flatten_with_path(g_xla)
    assert tree_fused == tree_xla
    for (path, a), (_, b) in zip(flat_fused, flat_xla):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_dead_dir_layer_grad_is_zero(paper):
    model, params = paper
    pts, vd = _inputs(16, 4)
    g = jax.grad(
        lambda p: jnp.sum(fused_paper_mlp_train(p, pts, vd, interpret=True))
    )(params)
    assert float(np.abs(np.asarray(g["layers_dir"][3]["kernel"])).max()) == 0.0
    assert float(np.abs(np.asarray(g["layers_dir"][3]["bias"])).max()) == 0.0


def test_data_grads_are_zero_by_design(paper):
    """The training-kernel contract: pts/viewdirs are data; their cotangents
    are zero (so this path must never serve pose optimization — the
    dispatch gate is RenderSettings.use_pallas_train)."""
    model, params = paper
    pts, vd = _inputs(16, 4)
    g_pts, g_vd = jax.grad(
        lambda pt, v: jnp.sum(fused_paper_mlp_train(params, pt, v,
                                                    interpret=True)),
        argnums=(0, 1),
    )(pts, vd)
    assert float(np.abs(np.asarray(g_pts)).max()) == 0.0
    assert float(np.abs(np.asarray(g_vd)).max()) == 0.0


def test_wider_encoding_grads(paper):
    """The lego-protocol widths (10/4) exercise dim_xyz=63 un-regrouping."""
    model = PaperNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    params = model.init(jax.random.PRNGKey(3))
    pts, vd = _inputs(40, 4, seed=4)
    st = RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    cot = jax.random.normal(jax.random.PRNGKey(5), (40, 4, 4))
    g_fused = jax.grad(
        lambda p: jnp.sum(
            fused_paper_mlp_train(p, pts, vd, num_freq_xyz=10,
                                  interpret=True) * cot
        )
    )(params)
    g_xla = jax.grad(
        lambda p: jnp.sum(model.apply(p, encode_points(pts, vd, st)) * cot)
    )(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        # Looser than the 6-frequency test: at 10 frequencies the kernel's
        # double-angle sinusoid recurrence carries the documented f32 phase
        # floor (error doubles per octave — ops/pallas/mlp_t.py), which the
        # encoding-row gradients see directly.
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4)


def test_renderer_dispatches_training_kernels(paper, monkeypatch):
    """use_pallas_train=True routes radiance-field eval (and its VJP)
    through fused_paper_mlp_train inside the production training loss, and
    the resulting gradients match the XLA path (interpret kernels are
    bit-faithful). A non-Paper model falls back silently."""
    import nerf_tpu.ops.pallas.paper_train as pt_mod
    from nerf_tpu.engine.train import make_loss_fn
    from nerf_tpu.models import FlexibleNeRFModel

    model, params = paper
    calls = {"n": 0}
    real = pt_mod.fused_paper_mlp_train

    def spy(*args, **kwargs):
        calls["n"] += 1
        kwargs["interpret"] = True  # CPU backend in tests
        return real(*args, **kwargs)

    monkeypatch.setattr(pt_mod, "fused_paper_mlp_train", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    key = jax.random.PRNGKey(6)
    ro = jax.random.uniform(key, (16, 3), minval=-1, maxval=1)
    rd = ro - jnp.array([0.0, 0.0, 2.0])
    tgt = jax.random.uniform(key, (16, 3))
    kw = dict(
        num_coarse=8, num_fine=8, perturb=False, radiance_field_noise_std=0.0,
        near=2.0, far=6.0, num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
    )
    trainable = {"coarse": params, "fine": params}

    loss_k = make_loss_fn(model, model,
                          RenderSettings(use_pallas_train=True, **kw))
    (lk, _), gk = jax.value_and_grad(loss_k, has_aux=True)(
        trainable, ro, rd, tgt, jax.random.PRNGKey(7))
    assert calls["n"] == 2  # coarse + fine

    loss_x = make_loss_fn(model, model, RenderSettings(**kw))
    (lx, _), gx = jax.value_and_grad(loss_x, has_aux=True)(
        trainable, ro, rd, tgt, jax.random.PRNGKey(7))
    assert calls["n"] == 2  # XLA path never touches the kernel
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)

    # Unsupported family: silent XLA fallback, no dispatch.
    flex = FlexibleNeRFModel(num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
    fparams = flex.init(jax.random.PRNGKey(8))
    loss_f = make_loss_fn(flex, flex,
                          RenderSettings(use_pallas_train=True, **kw))
    loss_f({"coarse": fparams, "fine": fparams}, ro, rd, tgt,
           jax.random.PRNGKey(9))
    assert calls["n"] == 2
