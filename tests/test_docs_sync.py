"""Doc-drift guard: the 'N queries, M DuckDB oracles' line in
README.md and COVERAGE.md must match the live driver registry.

Round-4 ADVICE flagged the counts going stale twice; deriving the
check from ``__spark_entry__`` itself means any future queries()/
oracle_sql() addition fails CI until the docs are bumped.
"""
import re
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent
COUNT_RE = re.compile(r"(\d+)\s+queries,\s+(\d+)\s+DuckDB\s*\n?\s*oracles")


def _doc_counts(path: Path) -> tuple[int, int]:
    m = COUNT_RE.search(path.read_text())
    assert m, f"no 'N queries, M DuckDB oracles' line found in {path.name}"
    return int(m.group(1)), int(m.group(2))


def test_doc_counts_match_registry():
    n_queries = len(entry.queries())
    n_oracles = len(entry.oracle_sql())
    for doc in (REPO / "README.md", REPO / "COVERAGE.md"):
        assert _doc_counts(doc) == (n_queries, n_oracles), (
            f"{doc.name} says {_doc_counts(doc)} but the registry holds "
            f"({n_queries}, {n_oracles}) — bump the doc line"
        )


def test_every_oracle_key_has_a_query():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracle keys without a query: {sorted(o - q)}"
