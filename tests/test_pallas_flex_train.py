"""Fused FlexibleNeRF TRAINING kernels (custom-VJP fwd+bwd, interpret mode).

Forward parity and full parameter-gradient parity vs XLA autodiff of the
same model (reference nerf/models.py:185-256 semantics: un-ReLU'd layer1,
ReLU'd fc_feat, alpha from the last trunk activation, one 64-wide dir
layer). Real-TPU Mosaic parity + the adopt-or-retire perf data:
tests/test_tpu_kernels.py and docs/PARITY.md's width-128 custom-VJP row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.engine.renderer import RenderSettings, encode_points
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops.pallas.flex_train import (
    _sample_tile_train,
    fused_flex_mlp_train,
)


@pytest.fixture(scope="module")
def flex():
    # The lego protocol's 10/4 encodings — the only shape the dispatch gate
    # (supports_fused_flex_train) admits.
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    return model, model.init(jax.random.PRNGKey(0))


def _inputs(n, s, seed=1):
    key = jax.random.PRNGKey(seed)
    pts = jax.random.uniform(key, (n, s, 3), minval=-1.3, maxval=1.3)
    vd = jax.random.normal(key, (n, 3))
    return pts, vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)


def _settings():
    return RenderSettings(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)


def test_sample_tile_train_divisors():
    assert _sample_tile_train(64) == 8    # 128 rays x 8 samples = 1024 lanes
    assert _sample_tile_train(128) == 8
    assert _sample_tile_train(64, "float32") == 4
    assert _sample_tile_train(7) == 7
    assert _sample_tile_train(11) == 1    # no divisor <= 8 beyond 1


@pytest.mark.parametrize("n,s", [(33, 8), (128, 4), (140, 24)])
def test_forward_matches_xla(flex, n, s):
    """Ragged ray counts (padding) and multi-chunk tiles."""
    model, params = flex
    pts, vd = _inputs(n, s)
    want = np.asarray(model.apply(params, encode_points(pts, vd, _settings())))
    got = np.asarray(fused_flex_mlp_train(params, pts, vd, interpret=True))
    # 10-frequency double-angle sinusoid recurrence carries the documented
    # f32 phase floor (ops/pallas/mlp_t.py) — matches test_pallas_mlp_t's
    # tolerance class.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_param_grads_match_xla_autodiff(flex):
    """EVERY parameter gradient matches XLA autodiff of the same loss —
    the custom-VJP backward kernel is a full hand-derived backward
    (unmasked layer1 propagation, fused [dfeat; dsigma] head contraction,
    the dir branch with its host-side dcontrib split)."""
    model, params = flex
    n, s = 65, 8  # n not a multiple of 128: zero-padded cotangent rays
    pts, vd = _inputs(n, s)
    cot = jax.random.normal(jax.random.PRNGKey(2), (n, s, 4))

    g_fused = jax.grad(
        lambda p: jnp.sum(fused_flex_mlp_train(p, pts, vd, interpret=True)
                          * cot)
    )(params)
    g_xla = jax.grad(
        lambda p: jnp.sum(model.apply(p, encode_points(pts, vd, _settings()))
                          * cot)
    )(params)

    flat_fused, tree_fused = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_xla, tree_xla = jax.tree_util.tree_flatten_with_path(g_xla)
    assert tree_fused == tree_xla
    for (path, a), (_, b) in zip(flat_fused, flat_xla):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        # Encoding-row gradients see the 10-frequency recurrence floor
        # directly (same tolerance as test_pallas_paper_train's
        # wider-encoding test).
        np.testing.assert_allclose(
            a / scale, b / scale, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_data_grads_are_zero_by_design(flex):
    """The training-kernel contract: pts/viewdirs are data; their cotangents
    are zero (so this path must never serve pose optimization — the
    dispatch gate is RenderSettings.use_pallas_train)."""
    model, params = flex
    pts, vd = _inputs(16, 4)
    g_pts, g_vd = jax.grad(
        lambda pt, v: jnp.sum(fused_flex_mlp_train(params, pt, v,
                                                   interpret=True)),
        argnums=(0, 1),
    )(pts, vd)
    assert float(np.abs(np.asarray(g_pts)).max()) == 0.0
    assert float(np.abs(np.asarray(g_vd)).max()) == 0.0


def test_renderer_dispatches_flex_training_kernels(flex, monkeypatch):
    """use_pallas_train=True routes radiance-field eval (and its VJP)
    through fused_flex_mlp_train inside the production training loss, and
    the resulting gradients match the XLA path (interpret kernels are
    numerically faithful). A non-default Flexible shape falls back."""
    import nerf_tpu.ops.pallas.flex_train as ft_mod
    from nerf_tpu.engine.train import make_loss_fn

    model, params = flex
    calls = {"n": 0}
    real = ft_mod.fused_flex_mlp_train

    def spy(*args, **kwargs):
        calls["n"] += 1
        kwargs["interpret"] = True  # CPU backend in tests
        return real(*args, **kwargs)

    monkeypatch.setattr(ft_mod, "fused_flex_mlp_train", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    key = jax.random.PRNGKey(6)
    ro = jax.random.uniform(key, (16, 3), minval=-1, maxval=1)
    rd = ro - jnp.array([0.0, 0.0, 2.0])
    tgt = jax.random.uniform(key, (16, 3))
    kw = dict(
        num_coarse=8, num_fine=8, perturb=False, radiance_field_noise_std=0.0,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
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
    np.testing.assert_allclose(float(lk), float(lx), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        # 3e-4 (vs the raw-kernel test's 2e-4): compositing's weights
        # multiply the recurrence floor through the whole ray transmittance
        # chain before the loss reduces it.
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-4)

    # Unsupported shape (6/4 encodings): silent XLA fallback, no dispatch.
    small = FlexibleNeRFModel(num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
    sparams = small.init(jax.random.PRNGKey(8))
    kw6 = dict(kw, num_encoding_fn_xyz=6)
    loss_f = make_loss_fn(small, small,
                          RenderSettings(use_pallas_train=True, **kw6))
    loss_f({"coarse": sparams, "fine": sparams}, ro, rd, tgt,
           jax.random.PRNGKey(9))
    assert calls["n"] == 2


def test_multiscene_step_composes_with_training_kernels(flex, monkeypatch):
    """vmap over scenes composes with the custom-VJP kernels: inside the
    vmap trace the dispatch gate sees UNBATCHED per-scene params (so it
    admits the default shape), and JAX's pallas batching rule adds the
    scene axis as a leading grid dimension — the whole multiscene update
    stays one program. Trajectory parity vs the XLA multiscene path."""
    import optax

    import nerf_tpu.ops.pallas.flex_train as ft_mod
    from nerf_tpu.parallel.multiscene import (
        create_multiscene_state,
        make_multiscene_train_step,
    )

    model, _ = flex
    real = ft_mod.fused_flex_mlp_train
    calls = {"n": 0}

    def spy(*args, **kwargs):
        calls["n"] += 1
        kwargs["interpret"] = True  # CPU backend in tests
        return real(*args, **kwargs)

    monkeypatch.setattr(ft_mod, "fused_flex_mlp_train", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    num_scenes, batch = 3, 32
    key = jax.random.PRNGKey(20)
    ro = jax.random.uniform(key, (num_scenes, batch, 3), minval=-1, maxval=1)
    rd = ro - jnp.asarray([0.0, 0.0, 2.0])
    tgt = jax.random.uniform(key, (num_scenes, batch, 3))
    opt = optax.adam(5e-4)
    kw = dict(
        num_coarse=8, num_fine=8, perturb=True,
        radiance_field_noise_std=0.0, near=2.0, far=6.0,
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
    )

    losses = {}
    for use_kernel in (True, False):
        settings = RenderSettings(use_pallas_train=use_kernel, **kw)
        state = create_multiscene_state(model, model, opt,
                                        jax.random.PRNGKey(0), num_scenes)
        step = make_multiscene_train_step(model, model, settings, opt,
                                          jit=False)
        trace = []
        for i in range(2):
            state, m = step(state, ro, rd, tgt, jax.random.PRNGKey(30 + i))
            trace.append(np.asarray(m.loss))
        losses[use_kernel] = np.stack(trace)
    assert calls["n"] == 4  # (coarse + fine) x 2 steps, fused path only
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-3, atol=2e-5)
