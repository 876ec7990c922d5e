"""Tests for metrics (ScalarMetric fixed vs reference dead code, PSNR, SSIM)
and the metric writer."""

import json
import os

import numpy as np

from nerf_tpu.utils import MetricWriter, RateMeter, ScalarMetric, psnr, ssim


def test_scalar_metric():
    m = ScalarMetric()
    assert m.peek() == 0.0
    m.update(2.0)
    m.update(4.0)
    assert m.peek() == 3.0
    m.reset()
    assert m.peek() == 0.0 and m.count == 0
    m2 = ScalarMetric(5.0)
    assert m2.peek() == 5.0


def test_psnr_known_values(rng):
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    assert psnr(a, a) >= 50.0  # identical -> clamped max
    b = np.clip(a + 0.1, 0, 1)
    val = psnr(a, b)
    assert 15 < val < 25


def test_ssim_properties(rng):
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert ssim(a, a) > 0.99
    noise = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    assert ssim(a, noise) < ssim(a, np.clip(a + 0.01, 0, 1).astype(np.float32))


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.scalar("train/loss", 0.5, 1)
    w.scalars({"train/psnr": 20.0}, 2)
    w.image("validation/rgb", np.zeros((4, 4, 3), np.float32), 3)
    w.close()
    lines = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert {rec["tag"] for rec in lines} == {"train/loss", "train/psnr"}
    assert os.path.exists(tmp_path / "images" / "validation_rgb_000003.png")


def test_rate_meter():
    import time

    r = RateMeter()
    assert r.rate() == 0.0
    r.update(100)
    time.sleep(0.02)
    r.update(100)
    assert r.rate() > 0


def test_time_fn_and_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from nerf_tpu.utils.profiling import time_fn, trace

    f = jax.jit(lambda x: jnp.sum(x * x))
    secs, out = time_fn(f, jnp.arange(128.0), warmup=1, reps=2)
    assert secs > 0 and float(out) > 0
    with trace(str(tmp_path)):
        f(jnp.arange(128.0)).block_until_ready()
    # a trace directory with at least one artifact is produced
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found
