"""Doc-vs-registry count pin (r8 verdict ask #1).

Twice now (r6 README, r8 COVERAGE.md) a human-maintained registry-size
counter went stale mid-round and shipped. This fence parses the two
count-bearing doc lines and asserts they equal the LIVE registry, so a
registration without the matching doc refresh fails pytest.
"""

from __future__ import annotations

import re
from pathlib import Path

from kol_bigdata_realtime_analytics_spark.plans.registry import (
    get_oracles,
    get_queries,
)

REPO = Path(__file__).resolve().parent.parent


def _live_counts() -> tuple[int, int]:
    return len(get_queries()), len(get_oracles())


def _parse(text: str, pattern: str, where: str) -> tuple[int, int]:
    m = re.search(pattern, text)
    assert m, f"count line not found in {where} (pattern: {pattern})"
    return int(m.group(1)), int(m.group(2))


def test_readme_counts_match_registry():
    n_q, n_o = _live_counts()
    got = _parse(
        (REPO / "README.md").read_text(),
        r"(\d+) named queries \((\d+) with DuckDB",
        "README.md",
    )
    assert got == (n_q, n_o), f"README.md says {got}, registry is {(n_q, n_o)}"


def test_coverage_counts_match_registry():
    n_q, n_o = _live_counts()
    got = _parse(
        (REPO / "COVERAGE.md").read_text(),
        r"(\d+) registered queries; (\d+) with DuckDB oracles",
        "COVERAGE.md",
    )
    assert got == (n_q, n_o), f"COVERAGE.md says {got}, registry is {(n_q, n_o)}"


def test_parse_detects_planted_mismatch():
    # the fence itself must fail on a divergent doc line
    n_q, n_o = _live_counts()
    fake = f"blah {n_q + 1} registered queries; {n_o} with DuckDB oracles blah"
    got = _parse(fake, r"(\d+) registered queries; (\d+) with DuckDB oracles", "fake")
    assert got != (n_q, n_o)
