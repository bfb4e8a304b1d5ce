"""Registry mapping query names to Spark builders + DuckDB oracle SQL.

Each registered query is a pure function (spark, sf_dir) -> DataFrame whose
column names/aliases EXACTLY match its oracle SQL (the driver sorts columns
by name before value-hashing — see repo contract in __spark_entry__.py).

Determinism rules enforced across the registry so Spark and DuckDB hash
identically:
- every float output is F.round()'ed (2 decimals for large sums, 6 for
  ratios/averages/scores) in BOTH engines;
- timestamps are emitted as epoch MICROSECONDS (bigint) — integer compare,
  no tz/format ambiguity (Spark session tz pinned to UTC regardless);
- every LIMIT query sorts on a tie-breaking unique key;
- counts/sums of integers are CAST to BIGINT on the DuckDB side (duckdb
  SUM(BIGINT) returns HUGEINT which would mismatch the schema).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY.values()}


def get_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one TESTDATA table (columnar, pushdown-eligible).

    events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    only accepts as a long via the nanosAsLong legacy conf (runtime-settable,
    so this works on any caller-provided session, incl. the driver's).
    The long is converted back to a proper timestamp column with integer
    division (no double round-trip — nanos don't fit a double's mantissa).
    """
    # pin UTC at runtime: parquet micros timestamps surface as TIMESTAMP_NTZ
    # and any NTZ -> TIMESTAMP cast must interpret wall time as UTC to match
    # DuckDB's UTC-naive epoch_us, whatever session the caller created.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return spark.read.parquet(f"{sf_dir}/{name}.parquet").withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
