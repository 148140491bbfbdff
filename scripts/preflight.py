#!/usr/bin/env python
"""Snapshot-gate sanity check (judge r11 item 7): round 11 committed two
NEW tests without running them and ended with a red suite. This script
is the cheap insurance: run before the end-of-round commit (and ideally
before any commit that touches tests/), it

1. finds every test module added or modified since the last round
   snapshot (plus any uncommitted test edits),
2. runs pytest on exactly those modules + the docs-drift pins
   (tests/test_docs_sync.py) + the registry window pin,
3. exits non-zero on any failure — the commit must not happen on red.

It does NOT replace the full suite (which still runs per-round); it
guarantees the specific failure mode that burned round 11 — committing
a new test that was never executed — cannot recur silently.

Usage: python scripts/preflight.py [--full]   (--full runs all tests/)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def _last_snapshot_commit() -> str:
    """Newest commit that looks like a driver round boundary; falls back
    to the root commit so a short/shallow history without a marker still
    resolves (ADVICE r12: HEAD~10 raises in a <11-commit repo)."""
    import re

    log = _git("log", "--format=%H %s", "-200")
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        # tightened marker (ADVICE r12): "round N:" only, not any
        # subject that happens to start with the word "round"
        if "end-of-round snapshot" in subject or re.match(
            r"^round \d+:", subject
        ):
            return sha
    return _git("rev-list", "--max-parents=0", "HEAD").splitlines()[0]


def changed_test_modules() -> list[str]:
    base = _last_snapshot_commit()
    names: set[str] = set()
    for rng in (
        ("diff", "--name-only", f"{base}..HEAD"),
        ("diff", "--name-only", "HEAD"),  # uncommitted
        ("diff", "--name-only", "--cached"),  # staged
    ):
        for f in _git(*rng).splitlines():
            if f.startswith("tests/") and f.endswith(".py"):
                if os.path.exists(os.path.join(REPO, f)):
                    names.add(f)
    return sorted(names)


def _refresh_staleness_artifact() -> None:
    """Regenerate STALENESS.json from the committed CORRECTNESS history
    (judge r15 item 5: the artifact read latest_round: 14 a full round
    after r15 landed). Part of preflight so any round-start run leaves
    the committed artifact current; tests/test_staleness.py pins the
    freshness. Best-effort: a regeneration failure is loud but must not
    block the test gate itself."""
    rc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "staleness_report.py"),
            "--json",
            os.path.join(REPO, "STALENESS.json"),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).returncode
    print(f"preflight: STALENESS.json {'refreshed' if rc == 0 else 'REFRESH FAILED'}")


def main() -> int:
    _refresh_staleness_artifact()
    if "--full" in sys.argv:
        targets = ["tests/"]
    else:
        targets = changed_test_modules()
        # always-on pins: docs drift + the exactly-full 50-slot window
        for always in (
            "tests/test_docs_sync.py",
            "tests/test_plans.py::test_registry_driver_window_exactly_full",
        ):
            if always.split("::")[0] not in targets:
                targets.append(always)
    print(f"preflight: pytest {' '.join(targets)}", flush=True)
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *targets], cwd=REPO
    ).returncode
    if rc:
        print(
            "\npreflight: RED — do NOT commit the snapshot; fix the "
            "failures above first.",
            file=sys.stderr,
        )
    else:
        print("preflight: green.")
    return rc


if __name__ == "__main__":
    sys.exit(main())
