"""Unit tests for bench.py's staged, budget-aware driver logic (pure host
logic — no TPU, no jax compute). The perf stages themselves run only on
hardware; what must never regress is the harness contract: the record is
cumulative, budget overruns skip stages instead of killing the run, and
failed headline stages get a second chance before extras spend budget."""

import json
import time

import bench


def _last_json(capsys):
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines, "no JSON emitted"
    return json.loads(lines[-1])


def _with_stages(monkeypatch, headline, extras):
    monkeypatch.setattr(bench, "HEADLINE_STAGES", headline)
    monkeypatch.setattr(bench, "EXTRA_STAGES", extras)
    monkeypatch.setattr(bench, "STAGES", headline + extras)


def test_budget_skips_expensive_extras_but_emits_headline(monkeypatch, capsys):
    def set_value(r):
        r["value"] = 123.0
        r["vs_baseline"] = 1.0

    _with_stages(
        monkeypatch,
        [("warmup", 1, lambda r: None), ("train_f32", 1, set_value)],
        [("huge_extra", 10_000, lambda r: r.update(extra=1))],
    )
    results = bench.main(time.monotonic() + 60)
    out = _last_json(capsys)
    assert out["value"] == 123.0
    assert "extra" not in out
    assert "huge_extra" in results["stages_skipped"]
    assert results["stages_completed"] == ["warmup", "train_f32"]


def test_failed_headline_stage_retried_before_extras(monkeypatch, capsys):
    order = []
    attempts = {"n": 0}

    def flaky_value(r):
        order.append("train_f32")
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("transient")
        r["value"] = 9.0
        r["vs_baseline"] = 1.0

    def extra(r):
        order.append("extra")
        r["extra_metric"] = 7.0

    _with_stages(
        monkeypatch,
        [("train_f32", 1, flaky_value)],
        [("extra", 1, extra)],
    )
    results = bench.main(time.monotonic() + 120)
    # Retry happened, and BEFORE the extra stage spent budget.
    assert order == ["train_f32", "train_f32", "extra"]
    assert "train_f32" not in results.get("stage_errors", {})
    out = _last_json(capsys)
    assert out["value"] == 9.0 and out["extra_metric"] == 7.0


def test_record_is_cumulative_across_stage_failures(monkeypatch, capsys):
    def set_value(r):
        r["value"] = 5.0
        r["vs_baseline"] = 1.0

    def always_fails(r):
        raise RuntimeError("kaboom")

    _with_stages(
        monkeypatch,
        [("train_f32", 1, set_value)],
        [("bad_extra", 1, always_fails)],
    )
    results = bench.main(time.monotonic() + 120)
    out = _last_json(capsys)
    # The last emitted line still carries the headline despite the failure,
    # and names the failed stage.
    assert out["value"] == 5.0
    assert "kaboom" in out["stage_errors"]["bad_extra"]
    assert results["stages_completed"] == ["train_f32"]


def test_corrupted_kernel_never_headlines(monkeypatch, capsys):
    """A deliberately corrupted Pallas kernel (guard PSNR below the gate) can
    never produce a Pallas-path render headline: the render stages must fall
    back to the XLA parity path and mark the record degraded."""
    calls = {}

    monkeypatch.setattr(
        bench, "bench_numerics_guard", lambda: [5.0, 5.4, 4.8]
    )

    def fake_pipelined(side, use_pallas=True):
        calls["sustained_use_pallas"] = use_pallas
        return 1_000_000.0

    def fake_render(side, use_pallas=True):
        calls.setdefault("render_use_pallas", []).append(use_pallas)
        return 500_000.0

    monkeypatch.setattr(bench, "bench_render_pipelined", fake_pipelined)
    monkeypatch.setattr(bench, "bench_render", fake_render)

    def set_value(r):
        r["value"] = 1.0
        r["vs_baseline"] = 1.0

    _with_stages(
        monkeypatch,
        [
            ("train_f32", 1, set_value),
            ("pallas_guard", 1, bench._stage_guard),
            ("render_800_sustained", 1, bench._stage_render_800_sustained),
        ],
        [
            ("render_400", 1, bench._stage_render_400),
            ("render_800", 1, bench._stage_render_800),
        ],
    )
    results = bench.main(time.monotonic() + 120)
    out = _last_json(capsys)
    assert out["pallas_numerics_ok"] is False
    assert out["pallas_degraded"] is True
    assert out["render_path"] == "xla"
    assert calls["sustained_use_pallas"] is False
    assert calls["render_use_pallas"] == [False, False]
    # The (XLA-path) numbers are still recorded — degraded, not dropped.
    assert out["render_rays_per_sec_800px_sustained"] == 1_000_000.0
    assert results["stages_completed"][-1] == "render_800"


def test_missing_guard_degrades_render_to_xla(monkeypatch):
    """If the guard stage never landed (relay error), render stages must be
    conservative: XLA path + degraded marker, never silently Pallas."""
    captured = {}
    monkeypatch.setattr(
        bench, "bench_render_pipelined",
        lambda side, use_pallas=True: captured.setdefault("up", use_pallas) or 1.0,
    )
    r = {}
    bench._stage_render_800_sustained(r)
    assert captured["up"] is False
    assert r["pallas_degraded"] is True and r["render_path"] == "xla"


def test_guard_median_is_robust_to_single_pair_drift(monkeypatch):
    """The gate is on the MEDIAN of the seed-pair readings: one pair's floor
    drifting below the gate (benign Mosaic scheduling change) must not
    degrade the record, while a regression on every pair must."""
    monkeypatch.setattr(
        bench, "bench_numerics_guard", lambda: [35.0, 39.1, 46.4]
    )
    r = {}
    bench._stage_guard(r)
    assert r["pallas_numerics_ok"] is True          # median 39.1 > 37.5
    assert r["pallas_vs_xla_psnr_db"] == 39.1
    assert r["pallas_vs_xla_psnr_db_per_pair"] == [35.0, 39.1, 46.4]

    monkeypatch.setattr(
        bench, "bench_numerics_guard", lambda: [5.0, 6.1, 7.2]
    )
    r2 = {}
    bench._stage_guard(r2)
    assert r2["pallas_numerics_ok"] is False        # real regression: all low
    assert r2["pallas_vs_xla_psnr_db"] == 6.1


def test_healthy_guard_keeps_pallas_path(monkeypatch):
    captured = {}
    monkeypatch.setattr(
        bench, "bench_numerics_guard", lambda: [38.9, 39.1, 46.4]
    )
    monkeypatch.setattr(
        bench, "bench_render_pipelined",
        lambda side, use_pallas=True: captured.setdefault("up", use_pallas) and 2.0,
    )
    r = {}
    bench._stage_guard(r)
    bench._stage_render_800_sustained(r)
    assert r["pallas_numerics_ok"] is True
    assert captured["up"] is True
    assert r["render_path"] == "pallas"
    assert "pallas_degraded" not in r
    # render_vs_reference rides the sustained stage (north-star adjudication).
    assert r["render_vs_reference"] == round(
        2.0 / bench.REFERENCE_RENDER_RAYS_PER_SEC, 1
    )


def test_soft_watchdog_interrupts_python_level_stall(monkeypatch, capsys):
    def set_value(r):
        r["value"] = 1.0
        r["vs_baseline"] = 1.0

    def stalls(r):
        end = time.monotonic() + 60
        while time.monotonic() < end:  # pure-Python stall: SIGALRM can fire
            time.sleep(0.05)
        r["never"] = True

    _with_stages(
        monkeypatch,
        [("train_f32", 1, set_value)],
        # est 1s -> soft watchdog fires at ~2.5s, long before the 60s stall
        # ends; the harness records the timeout and finishes the run.
        [("stall", 1, stalls)],
    )
    t0 = time.monotonic()
    results = bench.main(time.monotonic() + 300)
    assert time.monotonic() - t0 < 30
    assert "StageTimeout" in str(results["stage_errors"]["stall"])
    assert _last_json(capsys)["value"] == 1.0


def test_train_pallas_stage_is_guard_gated(monkeypatch):
    """The FLAGSHIP fused-training-kernel stage (width-128 custom-VJP,
    ops/pallas/flex_train.py) obeys the same numerics gate as its Paper
    sibling below: healthy guard -> kernel path + speedup/MFU keys; failed
    or missing guard -> XLA path recorded under the _degraded_xla key."""
    captured = {}

    def fake_train(batch=1024, steps_per_call=50, calls=4,
                   compute_dtype="float32", family="flexible",
                   use_pallas_train=False):
        captured["use_pallas_train"] = use_pallas_train
        captured["family"] = family
        return 800_000.0

    monkeypatch.setattr(bench, "bench_train", fake_train)

    r = {"pallas_numerics_ok": True, "train_rays_per_sec_bf16": 400_000.0}
    bench._stage_train_pallas_bf16(r)
    assert captured["use_pallas_train"] is True
    assert captured["family"] == "flexible"
    assert r["train_pallas_rays_per_sec_bf16"] == 800_000.0
    assert r["train_pallas_speedup"] == 2.0
    assert "train_pallas_tflops_bf16" in r
    assert "mfu_pct_pallas_bf16" in r

    for bad in ({"pallas_numerics_ok": False}, {}):  # failed / never ran
        bench._stage_train_pallas_bf16(bad)
        assert captured["use_pallas_train"] is False
        assert "train_pallas_rays_per_sec_bf16_degraded_xla" in bad
        assert "train_pallas_rays_per_sec_bf16" not in bad
        assert "train_pallas_speedup" not in bad


def test_multiscene_pallas_stage_is_guard_gated(monkeypatch):
    """The fused multiscene stage obeys the numerics gate and computes its
    speedup against the XLA multiscene stage's number."""
    captured = {}

    def fake_multiscene(num_scenes=6, batch=1024, steps_per_call=50,
                        calls=3, use_pallas_train=False):
        captured["use_pallas_train"] = use_pallas_train
        return 600_000.0

    monkeypatch.setattr(bench, "bench_multiscene", fake_multiscene)

    r = {"pallas_numerics_ok": True,
         "multiscene6_train_rays_per_sec_bf16": 300_000.0}
    bench._stage_multiscene_pallas(r)
    assert captured["use_pallas_train"] is True
    assert r["multiscene6_pallas_train_rays_per_sec_bf16"] == 600_000.0
    assert r["multiscene6_pallas_speedup"] == 2.0

    for bad in ({"pallas_numerics_ok": False}, {}):  # failed / never ran
        bench._stage_multiscene_pallas(bad)
        assert captured["use_pallas_train"] is False
        assert "multiscene6_pallas_train_rays_per_sec_bf16_degraded_xla" in bad
        assert "multiscene6_pallas_train_rays_per_sec_bf16" not in bad
        assert "multiscene6_pallas_speedup" not in bad


def test_train_paper_pallas_stage_is_guard_gated(monkeypatch):
    """The fused-training-kernel stage obeys the same numerics gate as the
    render stages: healthy guard -> kernel path + speedup/MFU keys; failed
    or missing guard -> XLA path recorded under the _degraded_xla key."""
    captured = {}

    def fake_train(batch=1024, steps_per_call=50, calls=4,
                   compute_dtype="float32", family="flexible",
                   use_pallas_train=False):
        captured["use_pallas_train"] = use_pallas_train
        return 500_000.0

    monkeypatch.setattr(bench, "bench_train", fake_train)

    r = {"pallas_numerics_ok": True, "train_paper_rays_per_sec_bf16": 250_000.0}
    bench._stage_train_paper_pallas_bf16(r)
    assert captured["use_pallas_train"] is True
    assert r["train_paper_pallas_rays_per_sec_bf16"] == 500_000.0
    assert r["train_paper_pallas_speedup"] == 2.0
    assert "train_paper_pallas_tflops_bf16" in r
    assert "mfu_pct_paper_pallas_bf16" in r

    for bad in ({"pallas_numerics_ok": False}, {}):  # failed / never ran
        bench._stage_train_paper_pallas_bf16(bad)
        assert captured["use_pallas_train"] is False
        assert "train_paper_pallas_rays_per_sec_bf16_degraded_xla" in bad
        assert "train_paper_pallas_rays_per_sec_bf16" not in bad
        assert "train_paper_pallas_speedup" not in bad
