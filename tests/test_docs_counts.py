"""Docs-vs-registry count gate (VERDICT r9 wrong #1 / next #5): both
r8 and r9 shipped one stale surface-count row because totals were
maintained by diligence. This test makes the README and COVERAGE totals
mechanical: they must equal ``len(all_queries())`` and the oracle-backed
subset, or the suite goes red the moment a new query registers."""

from __future__ import annotations

import re
from pathlib import Path

from clickhouse_realtime_analytics_demo_spark.queries import all_queries

ROOT = Path(__file__).resolve().parent.parent


def _registry_counts() -> tuple[int, int]:
    qs = all_queries()
    return len(qs), sum(1 for q in qs.values() if q.oracle is not None)


def test_readme_counts_match_registry():
    n, n_oracle = _registry_counts()
    text = (ROOT / "README.md").read_text()
    m = re.search(r"(\d+) registered queries \((\d+) with DuckDB oracles\)", text)
    assert m, "README.md lost its registry-count line"
    assert (int(m[1]), int(m[2])) == (n, n_oracle), (
        f"README says {m[1]}/{m[2]} but the registry holds {n}/{n_oracle} — "
        "update README.md:25"
    )


def test_coverage_totals_match_registry():
    n, n_oracle = _registry_counts()
    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(r"\*\*Totals \(r\d+\):\*\* (\d+) registered queries, (\d+) oracle-checked", text)
    assert m, "COVERAGE.md lost its Totals line"
    assert (int(m[1]), int(m[2])) == (n, n_oracle), (
        f"COVERAGE.md Totals says {m[1]}/{m[2]} but the registry holds "
        f"{n}/{n_oracle} — update the Totals line"
    )
