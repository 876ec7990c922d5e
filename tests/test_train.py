"""Training engine tests: LR schedule parity, step mechanics, and a real
end-to-end convergence run on the synthetic scene (tiny-NeRF analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.data.synthetic import flatten_rays, make_synthetic_dataset
from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.engine.train import (
    create_train_state,
    exponential_lr_schedule,
    make_optimizer,
    make_train_loop,
    make_train_step,
    sample_ray_batch,
)
from nerf_tpu.models import FlexibleNeRFModel


def test_lr_schedule_matches_reference_formula():
    """lr * factor^(i / (lr_decay*1000)) — reference train_nerf.py:264-270."""
    sched = exponential_lr_schedule(5e-3, 250.0, 0.1)
    for step in [0, 1000, 125_000, 250_000]:
        expected = 5e-3 * 0.1 ** (step / 250_000)
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)


def test_make_optimizer_names():
    import pytest

    for name in ["adam", "Adam", "SGD", "RMSprop"]:
        make_optimizer(name, 1e-3)
    with pytest.raises(ValueError):
        make_optimizer("LBFGS", 1e-3)


def _setup(num_fine=8):
    settings = RenderSettings(
        num_coarse=8, num_fine=num_fine, perturb=True,
        radiance_field_noise_std=0.1,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
        white_background=True,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    opt = make_optimizer("adam", 5e-3, 250.0, 0.1)
    state = create_train_state(model, model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, model, settings, opt)
    return settings, model, opt, state, step


def test_train_step_updates_params_and_counts():
    _, _, _, state, step = _setup()
    ro = jnp.zeros((32, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (32, 1))
    target = jnp.ones((32, 3)) * 0.5
    before = np.asarray(state.params_coarse["layer1"]["kernel"]).copy()
    state2, metrics = step(state, ro, rd, target, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert float(metrics.loss) > 0
    assert float(metrics.coarse_loss) > 0 and float(metrics.fine_loss) > 0
    after = np.asarray(state2.params_coarse["layer1"]["kernel"])
    assert not np.allclose(before, after)


def test_sample_ray_batch_shapes_and_determinism():
    ro = jnp.arange(300.0).reshape(100, 3)
    rd = ro + 1
    t = ro + 2
    a = sample_ray_batch(jax.random.PRNGKey(7), ro, rd, t, 16)
    b = sample_ray_batch(jax.random.PRNGKey(7), ro, rd, t, 16)
    assert a[0].shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # consistency: the (ro, rd, target) triplets stay aligned
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(a[0]) + 1)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(a[0]) + 2)


@pytest.mark.slow
def test_end_to_end_convergence_on_synthetic_scene():
    """The tiny-NeRF integration test (SURVEY.md §4): loss must drop and PSNR
    must climb well above the initial value within a few hundred steps."""
    dataset = make_synthetic_dataset(num_views=6, height=24, width=24)
    ro, rd, targets = map(jnp.asarray, flatten_rays(dataset))

    settings = RenderSettings(
        num_coarse=48, num_fine=0, perturb=True,
        white_background=True, near=dataset.near, far=dataset.far,
        num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
    )
    model = FlexibleNeRFModel(
        num_layers=3, hidden_size=64, num_encoding_fn_xyz=6, num_encoding_fn_dir=4
    )
    opt = make_optimizer("adam", 5e-3)
    state = create_train_state(model, None, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, None, settings, opt)

    key = jax.random.PRNGKey(42)
    first_psnr = None
    for i in range(600):
        key, k_sample, k_step = jax.random.split(key, 3)
        b_ro, b_rd, b_t = sample_ray_batch(k_sample, ro, rd, targets, 512)
        state, metrics = step(state, b_ro, b_rd, b_t, k_step)
        if first_psnr is None:
            first_psnr = float(metrics.psnr)
    final_psnr = float(metrics.psnr)
    assert final_psnr > first_psnr + 10.0, (first_psnr, final_psnr)
    assert final_psnr > 25.0, final_psnr


def test_sample_ray_batch_sliced():
    """Sliced mode: a contiguous window of the store, aligned across the
    three arrays, deterministic in the key, uniform marginals."""
    ro = jnp.arange(300.0).reshape(100, 3)
    rd = ro + 1
    t = ro + 2
    a = sample_ray_batch(jax.random.PRNGKey(7), ro, rd, t, 16, mode="sliced")
    b = sample_ray_batch(jax.random.PRNGKey(7), ro, rd, t, 16, mode="sliced")
    assert a[0].shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(a[0]) + 1)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(a[0]) + 2)
    # contiguity: rows are consecutive store rows
    rows = np.asarray(a[0])[:, 0] / 3.0
    np.testing.assert_allclose(np.diff(rows), 1.0)
    # every slot's marginal is uniform enough to cover the whole store
    firsts = [
        float(
            sample_ray_batch(
                jax.random.PRNGKey(i), ro, rd, t, 16, mode="sliced"
            )[0][0, 0]
        )
        for i in range(64)
    ]
    assert min(firsts) < 30.0 and max(firsts) > 220.0

    with pytest.raises(ValueError):
        sample_ray_batch(jax.random.PRNGKey(0), ro, rd, t, 16, mode="bogus")


def test_shuffle_ray_store_alignment():
    from nerf_tpu.data import shuffle_ray_store

    ro = np.arange(300.0, dtype=np.float32).reshape(100, 3)
    rd = ro + 1
    t = ro + 2
    sro, srd, st = shuffle_ray_store(ro, rd, t, seed=3)
    assert not np.array_equal(sro, ro)  # actually permuted
    np.testing.assert_array_equal(np.sort(sro[:, 0]), ro[:, 0])  # same rows
    np.testing.assert_array_equal(srd, sro + 1)  # triplets stay aligned
    np.testing.assert_array_equal(st, sro + 2)
    sro2, _, _ = shuffle_ray_store(ro, rd, t, seed=3)
    np.testing.assert_array_equal(sro, sro2)  # seed-deterministic


@pytest.mark.slow
def test_train_loop_sliced_sampling_converges():
    """The K-step scan loop with sliced sampling trains as well as gather
    on a (shuffled) synthetic store."""
    from nerf_tpu.data import shuffle_ray_store

    dataset = make_synthetic_dataset(num_views=6, height=24, width=24)
    ro, rd, targets = flatten_rays(dataset)
    ro, rd, targets = map(
        jnp.asarray, shuffle_ray_store(np.asarray(ro), np.asarray(rd),
                                       np.asarray(targets), seed=1)
    )

    settings = RenderSettings(
        num_coarse=32, num_fine=0, perturb=True,
        white_background=True, near=dataset.near, far=dataset.far,
        num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
    )
    model = FlexibleNeRFModel(
        num_layers=3, hidden_size=64, num_encoding_fn_xyz=6,
        num_encoding_fn_dir=4,
    )
    opt = make_optimizer("adam", 5e-3)
    state = create_train_state(model, None, opt, jax.random.PRNGKey(0))
    loop = make_train_loop(
        model, None, settings, opt, batch_size=512, steps_per_call=100,
        sample_mode="sliced",
    )
    psnrs = []
    for c in range(4):
        state, metrics = loop(state, ro, rd, targets, jax.random.PRNGKey(c))
        psnrs.append(float(np.asarray(metrics.psnr)[-1]))
    assert psnrs[-1] > psnrs[0] + 8.0, psnrs
    assert psnrs[-1] > 22.0, psnrs
