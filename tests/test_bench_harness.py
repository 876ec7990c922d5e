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
