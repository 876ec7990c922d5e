"""Multi-device tests on the virtual 8-device CPU mesh: sharded training must
match single-device training, and sharded rendering must match unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.engine.renderer import RenderSettings, render_rays
from nerf_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.parallel import (
    make_mesh,
    make_parallel_render_fn,
    make_parallel_train_step,
    pad_to_devices,
    replicate_tree,
    shard_batch,
)


def _setup(perturb=False, noise=0.0):
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=perturb,
        radiance_field_noise_std=noise,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    opt = make_optimizer("adam", 1e-3)
    state = create_train_state(model, model, opt, jax.random.PRNGKey(0))
    return settings, model, opt, state


def _ray_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    rd = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32) - [0, 0, 1.5])
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return ro, rd, target


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    assert pad_to_devices(100, 8) == 104
    assert pad_to_devices(64, 8) == 64


def test_parallel_train_step_matches_serial_when_deterministic():
    """With perturb/noise off, DP gradients over 8 shards must equal the
    single-device gradient of the same batch (allreduce-of-means == mean)."""
    settings, model, opt, state = _setup(perturb=False, noise=0.0)
    mesh = make_mesh()
    ro, rd, target = _ray_batch(64)

    serial_step = make_train_step(model, model, settings, opt)
    par_step = make_parallel_train_step(model, model, settings, opt, mesh)

    # Both steps donate their state argument; build two independent (but
    # identical) states so the donated buffers don't alias.
    state_b = create_train_state(model, model, opt, jax.random.PRNGKey(0))
    state_rep = replicate_tree(mesh, state_b)
    ro_s, rd_s, t_s = shard_batch(mesh, ro, rd, target)

    key = jax.random.PRNGKey(5)
    s1, m1 = serial_step(state, ro, rd, target, key)
    s2, m2 = par_step(state_rep, ro_s, rd_s, t_s, key)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params_coarse["layer1"]["kernel"]),
        np.asarray(s2.params_coarse["layer1"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )
    assert int(s2.step) == 1


def test_parallel_train_step_stochastic_runs_and_improves():
    settings, model, opt, state = _setup(perturb=True, noise=0.1)
    mesh = make_mesh()
    par_step = make_parallel_train_step(model, model, settings, opt, mesh)
    state = replicate_tree(mesh, state)
    ro, rd, target = _ray_batch(128)
    ro, rd, target = shard_batch(mesh, ro, rd, target)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = par_step(state, ro, rd, target, k)
        losses.append(float(metrics.loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30


@pytest.mark.slow
def test_parallel_render_matches_unsharded():
    settings, model, opt, state = _setup()
    mesh = make_mesh()
    render = make_parallel_render_fn(model, model, settings, mesh)
    ro, rd, _ = _ray_batch(64)
    out = render(
        replicate_tree(mesh, state.params_coarse),
        replicate_tree(mesh, state.params_fine),
        *shard_batch(mesh, ro, rd),
    )
    ref = render_rays(
        model, state.params_coarse, model, state.params_fine,
        ro, rd, settings.eval_variant(), None,
    )
    assert out["rgb_fine"].shape == (64, 3)
    np.testing.assert_allclose(
        np.asarray(out["rgb_fine"]), np.asarray(ref.fine.rgb), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["disp_coarse"]), np.asarray(ref.coarse.disp), rtol=1e-3, atol=1e-5
    )


def test_parallel_image_render_matches_single_device():
    """Sharded full-image render == single-device lax.map renderer, including
    the pad/unpad path (H*W not divisible by the mesh size)."""
    from nerf_tpu.engine.renderer import make_image_render_fn
    from nerf_tpu.ops import get_ray_bundle
    from nerf_tpu.data import pose_spherical
    from nerf_tpu.parallel import make_mesh, make_parallel_image_render_fn

    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    pc = model.init(jax.random.PRNGKey(0))
    pf = model.init(jax.random.PRNGKey(1))
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=False, radiance_field_noise_std=0.0,
        near=2.0, far=6.0, num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
        chunksize=16,
    )
    h = w = 9  # 81 rays: not divisible by 8 devices, nor by chunksize
    pose = jnp.asarray(pose_spherical(30.0, -45.0, 4.0), jnp.float32)[:3, :4]
    ro, rd = get_ray_bundle(h, w, 0.5 * w, pose)

    mesh = make_mesh()
    sharded = make_parallel_image_render_fn(model, model, settings, mesh)
    serial = make_image_render_fn(model, model, settings)
    out_s = sharded(pc, pf, ro, rd)
    out_1 = serial(pc, pf, ro, rd)
    assert set(out_s) == set(out_1)
    for k in out_1:
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_1[k]), rtol=2e-5, atol=2e-6,
            err_msg=k,
        )


def test_distributed_helpers_single_host():
    """maybe_initialize_distributed is a no-op without cluster env vars;
    is_primary is True; process_local_rows round-trips on one process."""
    import os

    from nerf_tpu.parallel import is_primary, maybe_initialize_distributed
    from nerf_tpu.parallel.distributed import process_local_rows
    from nerf_tpu.parallel import make_mesh, data_sharding

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "NERF_TPU_DISTRIBUTED"):
        assert var not in os.environ
    assert maybe_initialize_distributed() is False
    assert is_primary() is True

    # One process owns all devices -> local rows == the full array.
    mesh = make_mesh()
    arr = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    local = process_local_rows(arr, data_sharding(mesh))
    np.testing.assert_array_equal(local, arr)


def test_distributed_initialize_single_process_cluster():
    """maybe_initialize_distributed must actually reach
    jax.distributed.initialize() BEFORE any backend init (regression: a
    jax.process_count() probe used to initialize the backend first, making
    initialize() raise unconditionally on every configured cluster)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from nerf_tpu.parallel import maybe_initialize_distributed, is_primary\n"
        "assert maybe_initialize_distributed() is True\n"
        "assert jax.process_count() == 1\n"
        "assert is_primary() is True\n"
        # idempotent: the client probe short-circuits the second call
        "assert maybe_initialize_distributed() is True\n"
        "print('DIST_OK')\n"
    )
    env = dict(os.environ)
    env.update(
        JAX_COORDINATOR_ADDRESS="localhost:29517",
        JAX_NUM_PROCESSES="1",
        JAX_PROCESS_ID="0",
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DIST_OK" in proc.stdout


def test_dp_compiled_scaling():
    """Compiler-level scaling evidence (tools/dp_scaling_analysis.py's CI
    hook): the compiled SPMD program's per-device FLOPs must drop ~1/N as
    the mesh grows (the ray work shards; only the replicated optimizer
    update and gradient reduction stay constant), and the N>1 program must
    contain the gradient all-reduce."""
    from nerf_tpu.parallel import make_parallel_train_loop

    settings, model, opt, state = _setup(perturb=True, noise=0.2)

    def compile_for(n):
        mesh = make_mesh(n)
        loop = make_parallel_train_loop(
            model, model, settings, opt, mesh, batch_size=256, steps_per_call=4
        )
        ro, rd, tgt = _ray_batch(512)
        ro, rd, tgt = shard_batch(mesh, ro, rd, tgt)
        compiled = loop.lower(
            state, ro, rd, tgt, jax.random.PRNGKey(2)
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)), compiled.as_text()

    flops_1, hlo_1 = compile_for(1)
    flops_8, hlo_8 = compile_for(8)
    # Ideal ray-work scaling is 1/8; the replicated Adam update (+reduce)
    # adds a constant, so allow [1/16, 1/4] — far from 1/8 means DP broke.
    assert flops_1 / 16 < flops_8 < flops_1 / 4, (flops_1, flops_8)
    assert " all-reduce(" in hlo_8


def test_parallel_pose_render_matches_serial_pose_render():
    """Sharded pose->image renderer (serve_nerf's multi-device path): only a
    (3, 4) pose crosses the host boundary, each shard generates its own ray
    slice on-device — must match the serial pose renderer exactly, including
    the pad path (H*W not divisible by the mesh) and the u8 output mode."""
    from nerf_tpu.data import pose_spherical
    from nerf_tpu.engine.renderer import make_pose_render_fn
    from nerf_tpu.parallel import make_mesh, make_parallel_pose_render_fn

    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    pc = model.init(jax.random.PRNGKey(0))
    pf = model.init(jax.random.PRNGKey(1))
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=False, radiance_field_noise_std=0.0,
        near=2.0, far=6.0, num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
        chunksize=16,
    )
    h, w, focal = 9, 7, 5.0  # 63 rays: not divisible by 8 devices
    pose = jnp.asarray(pose_spherical(30.0, -45.0, 4.0), jnp.float32)[:3, :4]

    mesh = make_mesh()
    sharded = make_parallel_pose_render_fn(
        model, model, settings, h, w, focal, mesh, output="maps"
    )
    serial = make_pose_render_fn(
        model, model, settings, h, w, focal, output="maps"
    )
    out_s = sharded(pc, pf, pose)
    out_1 = serial(pc, pf, pose)
    assert set(out_s) == set(out_1)
    for k in out_1:
        np.testing.assert_allclose(
            np.asarray(out_s[k], np.float32), np.asarray(out_1[k], np.float32),
            rtol=2e-5, atol=2e-6, err_msg=k,
        )

    u8 = make_parallel_pose_render_fn(
        model, model, settings, h, w, focal, mesh, output="u8"
    )(pc, pf, pose)
    assert u8.shape == (h, w, 3) and u8.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(u8), np.asarray(out_1["rgb_u8"]))
