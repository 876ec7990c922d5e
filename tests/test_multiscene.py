"""Multi-scene vmapped training: per-scene independence + equivalence to
running each scene's step alone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.engine.train import create_train_state, make_optimizer, make_train_step
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.parallel.multiscene import (
    create_multiscene_state,
    make_multiscene_train_step,
    sample_multiscene_batch,
)


def _setup():
    settings = RenderSettings(
        num_coarse=8, num_fine=0, perturb=False,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    opt = make_optimizer("adam", 1e-3)
    return settings, model, opt


@pytest.mark.slow
def test_multiscene_state_shapes():
    settings, model, opt = _setup()
    state = create_multiscene_state(model, model, opt, jax.random.PRNGKey(0), 3)
    assert state.params_coarse["layer1"]["kernel"].shape[0] == 3
    assert state.step.shape == (3,)
    # scenes start with different random params
    k = np.asarray(state.params_coarse["layer1"]["kernel"])
    assert not np.allclose(k[0], k[1])


def test_multiscene_step_runs_and_is_per_scene(rng):
    settings, model, opt = _setup()
    S, B = 3, 16
    state = create_multiscene_state(model, model, opt, jax.random.PRNGKey(0), S)
    step = make_multiscene_train_step(model, None, settings, opt)

    ro = jnp.zeros((S, B, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (S, B, 1))
    # different target per scene -> different losses
    target = jnp.stack([jnp.full((B, 3), v) for v in (0.1, 0.5, 0.9)])
    state2, metrics = step(state, ro, rd, target, jax.random.PRNGKey(1))
    assert metrics.loss.shape == (S,)
    losses = np.asarray(metrics.loss)
    assert len(set(np.round(losses, 6))) == S  # per-scene independence
    assert (np.asarray(state2.step) == 1).all()


@pytest.mark.slow
def test_multiscene_matches_singlescene():
    """Scene s of the vmapped step must equal a solo step with scene s's state."""
    settings, model, opt = _setup()
    S, B = 2, 8
    ms_state = create_multiscene_state(model, None, opt, jax.random.PRNGKey(0), S)
    ms_step = make_multiscene_train_step(model, None, settings, opt, jit=False)

    ro = jnp.zeros((S, B, 3))
    rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (S, B, 1))
    target = jnp.stack([jnp.full((B, 3), 0.2), jnp.full((B, 3), 0.7)])
    key = jax.random.PRNGKey(9)
    new_ms, ms_metrics = ms_step(ms_state, ro, rd, target, key)

    solo_step = make_train_step(model, None, settings, opt, jit=False)
    keys = jax.random.split(key, S)
    from nerf_tpu.engine.train import TrainState

    for s in range(S):
        solo_state = jax.tree.map(lambda x: x[s], ms_state)
        new_solo, solo_metrics = solo_step(
            solo_state, ro[s], rd[s], target[s], keys[s]
        )
        np.testing.assert_allclose(
            float(solo_metrics.loss), float(ms_metrics.loss[s]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_solo.params_coarse["layer1"]["kernel"]),
            np.asarray(new_ms.params_coarse["layer1"]["kernel"])[s],
            rtol=1e-5, atol=1e-7,
        )


def test_sample_multiscene_batch():
    S, N, B = 2, 50, 8
    ro = jnp.arange(S * N * 3, dtype=jnp.float32).reshape(S, N, 3)
    rd, t = ro + 1, ro + 2
    b_ro, b_rd, b_t = sample_multiscene_batch(jax.random.PRNGKey(0), ro, rd, t, B)
    assert b_ro.shape == (S, B, 3)
    np.testing.assert_array_equal(np.asarray(b_rd), np.asarray(b_ro) + 1)
    # scene 0 rows come from scene 0's pool
    assert np.asarray(b_ro)[0].max() < N * 3


def test_sample_multiscene_batch_sliced():
    S, N, B = 2, 50, 8
    ro = jnp.arange(S * N * 3, dtype=jnp.float32).reshape(S, N, 3)
    rd, t = ro + 1, ro + 2
    b_ro, b_rd, b_t = sample_multiscene_batch(
        jax.random.PRNGKey(0), ro, rd, t, B, mode="sliced"
    )
    assert b_ro.shape == (S, B, 3)
    np.testing.assert_array_equal(np.asarray(b_rd), np.asarray(b_ro) + 1)
    np.testing.assert_array_equal(np.asarray(b_t), np.asarray(b_ro) + 2)
    for s in range(S):
        rows = np.asarray(b_ro)[s, :, 0]
        # contiguous window, within the scene's own pool
        np.testing.assert_allclose(np.diff(rows), 3.0)
        assert rows.min() >= s * N * 3 and rows.max() < (s + 1) * N * 3
    # per-scene offsets are independent (different with overwhelming prob.)
    offs = [
        np.asarray(sample_multiscene_batch(
            jax.random.PRNGKey(k), ro, rd, t, B, mode="sliced"
        )[0])[:, 0, 0] for k in range(8)
    ]
    assert any(o[0] != o[1] for o in offs)


def test_multiscene_loop_scans():
    from nerf_tpu.parallel.multiscene import make_multiscene_train_loop

    settings, model, opt = _setup()
    S, N, B = 2, 64, 16
    state = create_multiscene_state(model, None, opt, jax.random.PRNGKey(0), S)
    loop = make_multiscene_train_loop(model, None, settings, opt, B, steps_per_call=5)
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-1, 1, (S, N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.uniform(-1, 1, (S, N, 3)).astype(np.float32) - [0, 0, 1.5])
    tgt = jnp.asarray(rng.uniform(0, 1, (S, N, 3)).astype(np.float32))
    state, metrics = loop(state, ro, rd, tgt, jax.random.PRNGKey(1))
    assert metrics.loss.shape == (5, S)
    assert (np.asarray(state.step) == 5).all()
    assert np.isfinite(np.asarray(metrics.loss)).all()


def test_parallel_multiscene_step_matches_serial():
    """Multiscene x DP composition (vmap over scenes inside, shard_map over
    rays outside): with perturb/noise off, the 8-shard step must reproduce
    the serial multiscene step on the same (S, B, 3) batch exactly
    (allreduce-of-shard-means == per-scene global mean)."""
    from nerf_tpu.parallel import (
        make_mesh,
        make_parallel_multiscene_train_step,
        replicate_tree,
        shard_multiscene_stores,
    )

    settings, model, opt = _setup()
    mesh = make_mesh()
    S, B = 2, 32
    rng = np.random.default_rng(3)
    ro = jnp.asarray(rng.uniform(-1, 1, (S, B, 3)).astype(np.float32))
    rd = jnp.asarray(rng.uniform(-1, 1, (S, B, 3)).astype(np.float32) - [0, 0, 1.5])
    tgt = jnp.asarray(rng.uniform(0, 1, (S, B, 3)).astype(np.float32))

    serial_step = make_multiscene_train_step(model, None, settings, opt)
    par_step = make_parallel_multiscene_train_step(model, None, settings, opt, mesh)

    # Both steps donate their state — build two independent identical states.
    state_a = create_multiscene_state(model, None, opt, jax.random.PRNGKey(0), S)
    state_b = replicate_tree(
        mesh, create_multiscene_state(model, None, opt, jax.random.PRNGKey(0), S)
    )
    ro_s, rd_s, tgt_s = shard_multiscene_stores(mesh, ro, rd, tgt)

    key = jax.random.PRNGKey(7)
    s1, m1 = serial_step(state_a, ro, rd, tgt, key)
    s2, m2 = par_step(state_b, ro_s, rd_s, tgt_s, key)

    np.testing.assert_allclose(
        np.asarray(m1.loss), np.asarray(m2.loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.params_coarse["layer1"]["kernel"]),
        np.asarray(s2.params_coarse["layer1"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )
    assert (np.asarray(s2.step) == 1).all()


def test_parallel_multiscene_loop_runs_and_improves():
    """The sharded K-step multiscene scan: per-device per-scene sampling from
    the ray-axis-sharded stores, (K, S) metrics, loss decreasing."""
    from nerf_tpu.parallel import (
        make_mesh,
        make_parallel_multiscene_train_loop,
        replicate_tree,
        shard_multiscene_stores,
    )

    settings, model, opt = _setup()
    import dataclasses

    settings = dataclasses.replace(
        settings, perturb=True, radiance_field_noise_std=0.1
    )
    mesh = make_mesh()
    S, N, B = 2, 128, 32
    state = replicate_tree(
        mesh, create_multiscene_state(model, None, opt, jax.random.PRNGKey(0), S)
    )
    loop = make_parallel_multiscene_train_loop(
        model, None, settings, opt, mesh, batch_size=B, steps_per_call=20
    )
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-1, 1, (S, N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.uniform(-1, 1, (S, N, 3)).astype(np.float32) - [0, 0, 1.5])
    tgt = jnp.asarray(rng.uniform(0, 1, (S, N, 3)).astype(np.float32))
    ro, rd, tgt = shard_multiscene_stores(mesh, ro, rd, tgt)
    state, metrics = loop(state, ro, rd, tgt, jax.random.PRNGKey(1))
    losses = np.asarray(metrics.loss)
    assert losses.shape == (20, S)
    assert np.isfinite(losses).all()
    assert losses[-1].mean() < losses[0].mean()
    assert (np.asarray(state.step) == 20).all()


def test_parallel_multiscene_loop_rejects_indivisible_batch():
    from nerf_tpu.parallel import make_mesh, make_parallel_multiscene_train_loop

    settings, model, opt = _setup()
    with pytest.raises(ValueError, match="not divisible"):
        make_parallel_multiscene_train_loop(
            model, None, settings, opt, make_mesh(), batch_size=12,
            steps_per_call=2,
        )


@pytest.mark.slow
def test_multiscene_loop_with_ndc_settings():
    """The LLFF/NDC scene group (train_multiscene.py --llff-dirs) compiles
    and trains through the same vmapped loop: NDC warping + near/far 0/1 as
    compile-time constants, per-scene losses finite and distinct."""
    from nerf_tpu.ops import get_ray_bundle
    from nerf_tpu.parallel.multiscene import make_multiscene_train_loop

    settings = RenderSettings(
        num_coarse=8, num_fine=4, perturb=True,
        radiance_field_noise_std=1.0, white_background=False,
        near=0.0, far=1.0, use_ndc=True, height=8, width=8,
        focal_length=10.0, num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    opt = make_optimizer("adam", 1e-3)
    pose = jnp.eye(4)[:3, :4].at[2, 3].set(1.0)  # camera looking down -z
    ro, rd = get_ray_bundle(8, 8, 10.0, pose)
    ro = jnp.stack([ro.reshape(-1, 3)] * 2)
    rd = jnp.stack([rd.reshape(-1, 3)] * 2)
    tgt = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 3))

    state = create_multiscene_state(model, model, opt, jax.random.PRNGKey(1), 2)
    loop = make_multiscene_train_loop(model, model, settings, opt, 16, 2)
    state, metrics = loop(state, ro, rd, tgt, jax.random.PRNGKey(2))
    losses = np.asarray(metrics.loss[-1])
    assert losses.shape == (2,)
    assert np.isfinite(losses).all()
    # Different targets per scene would differ; identical targets but
    # per-scene init keys -> still distinct params/losses.
    assert losses[0] != losses[1]


def test_multiscene_cli_checkpoint_export(tmp_path):
    """train_multiscene.py --save-dir writes one eval-compatible native
    checkpoint per scene (the sliced-vmap export the 6-scene quality sweep
    in docs/QUALITY.md relies on)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    launcher = (
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        "sys.argv = sys.argv[1:]\n"
        "runpy.run_path(sys.argv[0], run_name='__main__')\n"
    )
    savedir = str(tmp_path / "ckpts")
    proc = subprocess.run(
        [sys.executable, "-c", launcher,
         os.path.join(repo, "train_multiscene.py"),
         "--num-scenes", "2", "--iters", "4", "--print-every", "2",
         "--size", "16", "--views", "2", "--batch", "8",
         "--num-coarse", "4", "--num-fine", "4", "--n-xyz", "4",
         "--save-dir", savedir, "--save-every", "2"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    from nerf_tpu.engine.checkpoint import load_checkpoint

    for s in range(2):
        # --save-every 2 wrote an intermediate checkpoint mid-run
        assert os.path.exists(
            os.path.join(savedir, f"scene{s}", "checkpoint00002.ntc")
        ), proc.stdout[-2000:]
        path = os.path.join(savedir, f"scene{s}", "checkpoint00004.ntc")
        assert os.path.exists(path), proc.stdout[-2000:]
        ckpt = load_checkpoint(path)
        assert ckpt["step"] == 4
        # per-scene slices: no leading scene axis on the param leaves
        k = ckpt["params_coarse"]["layer1"]["kernel"]
        assert np.asarray(k).ndim == 2
        assert np.isfinite(ckpt["loss"]) and np.isfinite(ckpt["psnr"])
