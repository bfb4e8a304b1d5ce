"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``kol_bigdata_realtime_analytics_spark/plans/`` — this
module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kol_bigdata_realtime_analytics_spark.plans import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: windowed engagement ->
    native trending score -> ranked output (the reference's hot path,
    batch shape)."""
    from kol_bigdata_realtime_analytics_spark.plans.domain import trending_scores

    return trending_scores(spark, "/root/testdata/sf0.001")


def _driver_history() -> tuple[set[str], dict[str, int]]:
    """(verified names, last round each name was sampled in) from past
    driver CORRECTNESS_r*.json reports.

    verified = ever hash-green, or rows-only-by-design with rows observed.
    last_sampled = max round whose report contains the name at all.
    """
    verified: set[str] = set()
    last_sampled: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                report = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in report.items():
            if not isinstance(row, dict):
                continue
            last_sampled[name] = max(last_sampled.get(name, 0), rnd)
            if row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            ):
                verified.add(name)
    return verified, last_sampled


def _prioritized(mapping: dict) -> dict:
    """Order queries so the driver's bounded per-round sweep (first ~50, in
    dict order) does the most useful verification work.

    Tiers (r3 verdict ask #4 — re-verification rotation):
      0. never driver-green, has a hash oracle  (strongest missing signal)
      1. never driver-green, rows-only
      2. already green — LEAST-recently-sampled first, so the green set is
         re-checked cyclically across rounds instead of the same stable
         prefix every round (environment drift is what cost round 2).
    Ties break on stable registry order. Every query is always present.
    """
    seen, last_sampled = _driver_history()
    oracles = get_oracles()
    registry_idx = {n: i for i, n in enumerate(mapping)}

    def sort_key(name: str):
        if name not in seen:
            tier = 0 if name in oracles else 1
            return (tier, 0, registry_idx[name])
        return (2, last_sampled.get(name, 0), registry_idx[name])

    order = sorted(mapping, key=sort_key)
    return {k: mapping[k] for k in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _prioritized(get_queries())


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only check).

    The driver calls this with no args and evaluates at sf=0.01 — the
    registry materializes sf-dependent oracles (fitted-artifact CTEs) for
    that dir by default; verify_local passes its actual sf explicitly.
    """
    return _prioritized(
        get_oracles() if sf_dir is None else get_oracles(sf_dir)
    )
