"""Citation-existence gate: every reference citation must be real.

This repo's evidence discipline rests on checkable ``file:line``
anchors into ``/root/reference/``. Round 9 shipped a fabricated one
(``utils/analyze_db.py`` — no such file; the reference's audits are
``utils/importer/verify_collections.py`` / ``verify_etl_results.py``)
plus two path slips (``utils/ai-helper/pupeeter.py`` for
``utils/html_to_pdf/pupeeter.py``; ``utils/importer/fix_sku_dot_zero
.py`` for ``utils/fix_sku_dot_zero.py``). Same regression-net pattern
as test_plans_drift: extract every citation from source + repo-authored
docs and assert the cited file exists under the reference tree.

Two nets:

1. Path-prefixed citations (``utils/...`` / ``sql_query/...``) must
   exist at EXACTLY that path under ``/root/reference/`` — catches
   wrong-directory slips even when the basename is real.
2. Bare ``name.py:NN`` / ``name.sql:NN`` line-cites and parenthesised
   ``(name.py)`` mentions must have their basename present either in
   the reference tree or in this repo — catches invented files cited
   without a directory.

Judge/driver-authored artifacts (VERDICT/ADVICE/BASELINE/PAPERS/
SNIPPETS/TESTDATA) are excluded: they may legitimately quote phantom
paths while reporting on them.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path("/root/reference")

# Repo-authored docs; external/judge/driver artifacts excluded.
_DOCS = ["README.md", "SURVEY.md", "SCALING.md", "PLANS.md", "COVERAGE.md", "FIXTURES.md"]

_PREFIXED = re.compile(r"\b((?:utils|sql_query)/[A-Za-z0-9_&./-]*[A-Za-z0-9_])")
# name.py:12 / name.sql:12-34 line-cites, or (name.py) parenthesised mention
_BARE_LINECITE = re.compile(r"\b([A-Za-z0-9_&-]+\.(?:py|sql)):\d")
_BARE_PAREN = re.compile(r"\(([A-Za-z0-9_&-]+\.(?:py|sql))\)")


def _scan_targets() -> list[Path]:
    targets = [REPO / d for d in _DOCS if (REPO / d).exists()]
    targets += sorted((REPO / "product_etl_spark").rglob("*.py"))
    targets += sorted((REPO / "tests").rglob("*.py"))
    targets += sorted((REPO / "tools").rglob("*.py"))
    for extra in ("bench.py", "__spark_entry__.py"):
        if (REPO / extra).exists():
            targets.append(REPO / extra)
    # this file quotes the historical phantom paths as documentation
    return [t for t in targets if t.name != "test_citation_integrity.py"]


def _reference_files() -> set[str]:
    return {str(p.relative_to(REFERENCE)) for p in REFERENCE.rglob("*") if p.is_file()}


def test_prefixed_reference_citations_exist():
    ref_files = _reference_files()
    assert ref_files, "reference tree unreadable — gate cannot run"
    bad: list[str] = []
    for path in _scan_targets():
        text = path.read_text(encoding="utf-8", errors="replace")
        for m in _PREFIXED.finditer(text):
            cite = m.group(1)
            # strip a trailing :line / :line-range if the regex grabbed digits
            cite = re.sub(r":[\d,-]+$", "", cite)
            if "." not in cite.rsplit("/", 1)[-1]:
                continue  # directory mention, not a file cite
            if cite not in ref_files:
                bad.append(f"{path.relative_to(REPO)}: {cite}")
    assert not bad, "citations to nonexistent reference paths:\n" + "\n".join(bad)


def test_bare_file_citations_resolve_somewhere():
    ref_files = _reference_files()
    ref_basenames = {f.rsplit("/", 1)[-1] for f in ref_files}
    repo_basenames = {
        p.name
        for p in REPO.rglob("*")
        if p.is_file() and ".git" not in p.parts and p.suffix in (".py", ".sql")
    }
    known = ref_basenames | repo_basenames
    bad: list[str] = []
    for path in _scan_targets():
        text = path.read_text(encoding="utf-8", errors="replace")
        names = {m.group(1) for m in _BARE_LINECITE.finditer(text)}
        names |= {m.group(1) for m in _BARE_PAREN.finditer(text)}
        for name in sorted(names):
            if name not in known:
                bad.append(f"{path.relative_to(REPO)}: {name}")
    assert not bad, (
        "file cites whose basename exists neither in /root/reference "
        "nor in this repo (fabricated anchor?):\n" + "\n".join(bad)
    )
