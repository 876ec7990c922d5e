#!/usr/bin/env python3
"""Run the FULL test suite (slow tier included) and append a one-line health
record to docs/TESTS.md — the committed evidence that the slow tier (the
2-process multihost test, convergence runs) is green at a given sha, since
CI/driver only exercise the fast tier.

    python tools/record_test_health.py            # run + append
    python tools/record_test_health.py --dry-run  # run + print only
"""

from __future__ import annotations

import datetime
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "docs", "TESTS.md")
HEADER = """# Full-suite health record

One line per recorded run of `python -m pytest tests/ -q` (slow tier
included), appended by `tools/record_test_health.py`. The fast tier runs in
CI/driver; this file is the committed evidence the slow tier is green too.

| date (UTC) | sha | result | duration |
|---|---|---|---|
"""


def main(argv) -> int:
    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--no-header"],
        cwd=REPO, capture_output=True, text=True,
    )
    dt = time.time() - t0
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    # e.g. "246 passed, 4 skipped in 1510.22s (0:25:10)"
    summary = re.sub(r"=+|\x1b\[[0-9;]*m", "", tail).strip()
    date = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d")
    line = f"| {date} | {sha} | {summary} | {dt / 60:.1f} min |\n"
    print(line, end="")
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        print("FULL SUITE FAILED — not recording", file=sys.stderr)
        return proc.returncode
    if "--dry-run" not in argv:
        if not os.path.exists(RECORD):
            with open(RECORD, "w") as f:
                f.write(HEADER)
        with open(RECORD, "a") as f:
            f.write(line)
        print(f"appended to {RECORD}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
