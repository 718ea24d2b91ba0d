#!/usr/bin/env python
"""Round-start ritual: stamp and commit the driver's round artifacts.

The external driver writes ``CORRECTNESS_r{N}.json`` / ``BENCH_r{N}.json``
AFTER the builder's final commit of round N, so they sit untracked at
the start of round N+1.  At that moment HEAD still IS the tree the
driver verified (it commits any uncommitted work before running
verify, and no round-N+1 commits exist yet), so this script:

1. stamps every untracked real-round CORRECTNESS artifact with
   ``__verified_commit__`` = HEAD — the exact-evidence key
   tests/test_rotation_guard.py prefers over every lifecycle
   heuristic (r9 ADVICE write-side fix: before this, the key was
   read-side only and nothing wrote it); and
2. commits the artifacts, restoring the guard's adding-commit path.

Run as the FIRST action of a round, before any builder commit:
    python tools/commit_round_artifacts.py
Stamping later would record the wrong tree; the script refuses when
HEAD already contains round-newer changes it cannot distinguish, by
simply doing nothing once the artifacts are tracked.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SIM_ROUND_MIN = 90  # tests/test_rotation_guard.py simulation rounds
ARTIFACT_GLOBS = [
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "BENCH_LOCAL_r*.json",
    "VERDICT.md",
    "ADVICE.md",
]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def untracked_artifacts() -> list[str]:
    untracked = set(
        _git("ls-files", "--others", "--exclude-standard").splitlines()
    )
    out: list[str] = []
    for pat in ARTIFACT_GLOBS:
        out.extend(sorted(p.name for p in REPO.glob(pat) if p.name in untracked))
    return out


def stamp_verified_commit(path: Path, head: str) -> bool:
    """Embed ``__verified_commit__`` into an untracked CORRECTNESS
    artifact (idempotent; never overwrites an existing stamp).
    Returns True when the file was modified."""
    m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
    if not m or int(m.group(1)) >= SIM_ROUND_MIN:
        return False
    try:
        rows = json.loads(path.read_text())
    except (OSError, ValueError):
        return False
    if not isinstance(rows, dict) or "__verified_commit__" in rows:
        return False
    rows["__verified_commit__"] = head
    path.write_text(json.dumps(rows, indent=1, sort_keys=True))
    return True


def main() -> int:
    names = untracked_artifacts()
    if not names:
        print("no untracked round artifacts; nothing to do")
        return 0
    head = _git("rev-parse", "HEAD").strip()
    stamped = [n for n in names if stamp_verified_commit(REPO / n, head)]
    # modified-but-tracked bench locals ride along with the same commit
    modified = set(_git("diff", "--name-only").splitlines())
    extra = [
        p.name
        for pat in ARTIFACT_GLOBS
        for p in REPO.glob(pat)
        if p.name in modified
    ]
    _git("add", "--", *names, *extra)
    rounds = sorted(
        {m.group(1) for n in names if (m := re.search(r"_r(\d+)\.", n))}
    )
    label = ",".join(f"r{r}" for r in rounds) or "round"
    _git(
        "commit", "-m",
        f"{label} driver artifacts"
        + (f" (verified_commit stamped: {len(stamped)})" if stamped else ""),
    )
    print(f"committed {len(names) + len(extra)} artifact(s); stamped {stamped}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
