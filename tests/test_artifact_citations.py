"""Doc-lint: every measurement-artifact citation must resolve to a
committed file.

Round 7's one contract breach (VERDICT r7) was prose citing SWEEP_r07
measurements while no SWEEP_r07.json existed in the tree — the sweep
ran but its artifact was never written/committed, so three headline
scale claims were unverifiable. This test makes that class of error
structurally impossible: any token shaped like SWEEP_rN / BENCH_rN /
CORRECTNESS_rN in SCALING.md, COVERAGE.md, BASELINE.md, README.md or a
flink_graph_spark/tools/bench docstring must have the matching .json
at the repo root. Slash shorthand ("SWEEP_r06/r07") expands to every
member.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TOKEN = re.compile(r"\b(SWEEP|BENCH|CORRECTNESS)_r(\d+)((?:/r\d+)+)?\b")

_DOC_FILES = ["SCALING.md", "COVERAGE.md", "BASELINE.md", "README.md"]


def _tracked_root_files() -> set[str] | None:
    """Repo-root files git actually tracks, or None outside a git
    checkout (fall back to os.path.exists there). ADVICE r8: checking
    bare filesystem existence let an artifact that exists only as an
    UNTRACKED working-tree file satisfy the lint while a fresh clone
    of HEAD lacks it — the exact 'cited but never committed' breach
    class this test exists to kill."""
    try:
        out = subprocess.run(
            ["git", "ls-files"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
        if out.returncode != 0:
            return None
        return {l.strip() for l in out.stdout.splitlines() if l.strip()}
    except Exception:
        return None


def _cited(text):
    for kind, first, extra in _TOKEN.findall(text):
        rounds = [first] + re.findall(r"r(\d+)", extra or "")
        for r in rounds:
            yield f"{kind}_r{int(r):02d}.json"


def test_every_cited_artifact_is_committed():
    paths = [os.path.join(REPO, f) for f in _DOC_FILES]
    paths += glob.glob(os.path.join(REPO, "flink_graph_spark/**/*.py"),
                       recursive=True)
    paths += glob.glob(os.path.join(REPO, "tools/*.py"))
    paths += [os.path.join(REPO, "bench.py"),
              os.path.join(REPO, "__spark_entry__.py")]
    tracked = _tracked_root_files()

    def committed(artifact: str) -> bool:
        if tracked is not None:
            return artifact in tracked
        return os.path.exists(os.path.join(REPO, artifact))

    missing = {}
    for p in paths:
        if not os.path.exists(p):
            continue
        with open(p, encoding="utf-8") as fh:
            text = fh.read()
        for artifact in _cited(text):
            if not committed(artifact):
                missing.setdefault(artifact, []).append(os.path.relpath(p, REPO))
    assert not missing, (
        "prose cites measurement artifacts not committed to git "
        f"(git add the artifact or amend the claim): {missing}"
    )
