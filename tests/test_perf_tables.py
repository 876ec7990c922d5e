"""The README perf block must stay in sync with the latest BENCH record
(one source of perf truth — tools/update_perf_tables.py)."""

import importlib.util
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(repo_root):
    spec = importlib.util.spec_from_file_location(
        "update_perf_tables",
        os.path.join(REPO, "tools", "update_perf_tables.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.REPO = str(repo_root)
    return mod


def test_committed_tables_in_sync():
    mod = _load_tool(REPO)
    assert mod.main(["--check"]) == 0


def test_check_detects_stale_block(tmp_path):
    shutil.copy(os.path.join(REPO, "README.md"), tmp_path / "README.md")
    # A newer bench record with a different number must make --check fail.
    with open(os.path.join(REPO, "BENCH_r03.json")) as f:
        rec = json.load(f)
    rec["parsed"]["value"] = 999999.0
    with open(tmp_path / "BENCH_r99.json", "w") as f:
        json.dump(rec, f)
    mod = _load_tool(tmp_path)
    assert mod.main(["--check"]) == 1
    # And rewriting fixes it.
    assert mod.main([]) == 0
    assert mod.main(["--check"]) == 0
    assert "1000k rays/s" in (tmp_path / "README.md").read_text()


def test_degraded_record_renders_degraded_row(tmp_path):
    shutil.copy(os.path.join(REPO, "README.md"), tmp_path / "README.md")
    with open(os.path.join(REPO, "BENCH_r03.json")) as f:
        rec = json.load(f)
    rec["parsed"]["pallas_numerics_ok"] = False
    rec["parsed"]["render_path"] = "xla"
    with open(tmp_path / "BENCH_r99.json", "w") as f:
        json.dump(rec, f)
    mod = _load_tool(tmp_path)
    assert mod.main([]) == 0
    text = (tmp_path / "README.md").read_text()
    assert "FAILED — render stages degraded to XLA" in text
    assert "sustained pipelined (xla path)" in text
