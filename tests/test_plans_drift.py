"""PLANS.md drift gate: the committed plan artifact must match what
tools/gen_plans.py generates from current source. Any plan-shape
change must regenerate PLANS.md in the same commit (VERDICT r4 #9).

Runs gen_plans in a subprocess (its own JVM/session — the generator's
session config differs from the test fixture's) and diffs normalized
text: AQE Statistics annotations (sizeInBytes varies with layout
noise) and codegen-id NUMBERS (assigned in AQE stage-completion
order, nondeterministic) are stripped; the operator TREE, scan
details, and which nodes are codegen'd at all are the contract.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STATS = re.compile(r", Statistics\([^)]*\)")
_CODEGEN_ID = re.compile(r"\[codegen id : \d+\]")


def _normalize(text: str) -> str:
    return "\n".join(
        _CODEGEN_ID.sub("[codegen]", _STATS.sub("", line)).rstrip()
        for line in text.strip().splitlines()
    )


def test_plans_md_matches_generator(tmp_path):
    committed = open(os.path.join(ROOT, "PLANS.md")).read()

    env = dict(os.environ)
    env["SPARK_GRAFT_PLANS_OUT"] = str(tmp_path / "PLANS.md")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_plans.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    regenerated = open(env["SPARK_GRAFT_PLANS_OUT"]).read()

    left, right = _normalize(committed), _normalize(regenerated)
    if left != right:
        import difflib

        diff = "\n".join(
            difflib.unified_diff(
                left.splitlines(), right.splitlines(),
                "PLANS.md (committed)", "PLANS.md (regenerated)", lineterm="",
            )
        )
        raise AssertionError(
            "PLANS.md is stale — rerun `python tools/gen_plans.py` and "
            "commit it with the plan change:\n" + diff[:8000]
        )
