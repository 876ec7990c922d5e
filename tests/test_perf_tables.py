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


def test_check_tolerates_one_round_lag_then_adopts(tmp_path):
    """The driver writes BENCH_r{N}.json AFTER round N ends, so at a round
    boundary the committed README legitimately renders the previous record:
    --check must warn-but-pass (the block is still driver-verified, just one
    round old), and a rewrite must adopt the new record."""
    shutil.copy(os.path.join(REPO, "README.md"), tmp_path / "README.md")
    for rec_path in (
        os.path.join(REPO, p) for p in sorted(os.listdir(REPO))
        if p.startswith("BENCH_r") and p.endswith(".json")
    ):
        shutil.copy(rec_path, tmp_path / os.path.basename(rec_path))
    with open(os.path.join(REPO, "BENCH_r03.json")) as f:
        rec = json.load(f)
    rec["parsed"]["value"] = 999999.0
    with open(tmp_path / "BENCH_r99.json", "w") as f:
        json.dump(rec, f)
    mod = _load_tool(tmp_path)
    assert mod.main(["--check"]) == 0  # stale-but-authentic: warn, pass
    # Rewriting adopts the newest record.
    assert mod.main([]) == 0
    assert mod.main(["--check"]) == 0
    assert "1000k rays/s" in (tmp_path / "README.md").read_text()


def test_check_fails_on_hand_edited_block(tmp_path):
    """The invariant --check enforces: the block must be the generated
    rendering of SOME committed record. A hand-edited number matches none."""
    shutil.copy(os.path.join(REPO, "README.md"), tmp_path / "README.md")
    for rec_path in (
        os.path.join(REPO, p) for p in sorted(os.listdir(REPO))
        if p.startswith("BENCH_r") and p.endswith(".json")
    ):
        shutil.copy(rec_path, tmp_path / os.path.basename(rec_path))
    text = (tmp_path / "README.md").read_text()
    mod = _load_tool(tmp_path)
    assert mod.main(["--check"]) == 0
    # Doctor a number inside the generated block.
    import re

    doctored = re.sub(
        r"(\| Training, f32 \| \*\*)\d+k", r"\g<1>777k", text, count=1
    )
    assert doctored != text
    (tmp_path / "README.md").write_text(doctored)
    assert mod.main(["--check"]) == 1


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
