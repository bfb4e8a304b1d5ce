"""Human-readable count parsing — "852.3K" / "1.3M" / "2B" / "12,345" -> long.

The reference reimplements this four times as a row-at-a-time Python UDF
(reference: batch/etl/tiktok_bronze_to_silver.py:60-77,
dwh/streaming/spark_jobs/hot_path_scoring.py:213-233,
streaming/spark_jobs/kafka_profile_stream.py:87-108,
scripts/load_profiles_to_redis.py:48-74). Here it is ONE native column
expression: regexp + a when-chain — fully codegen'd, no Python worker.

Semantics (matching the reference's test vectors, FIXTURES.md §8):
  "11.3K" -> 11300, "1.3M" -> 1300000, "2B" -> 2000000000,
  "12,345" -> 12345, "" / None / garbage -> 0, "36.5K" -> 36500.

Note on float->long: 11.3 * 1000 is 11299.999... in binary; we ROUND before
casting (Spark's double->long cast truncates toward zero, DuckDB's rounds —
rounding first makes both engines agree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM_RE = r"^([0-9]*\.?[0-9]+)"


def parse_count(col: Column | str) -> Column:
    """Parse a human-readable count string to a long count (null/garbage -> 0)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.upper(F.trim(c)), ",", "")
    num = F.regexp_extract(s, _NUM_RE, 1).try_cast("double")  # '' -> null (ANSI-safe)
    mult = (
        F.when(s.endswith("K"), F.lit(1_000.0))
        .when(s.endswith("M"), F.lit(1_000_000.0))
        .when(s.endswith("B"), F.lit(1_000_000_000.0))
        .otherwise(F.lit(1.0))
    )
    return F.coalesce(F.round(num * mult, 0).cast("long"), F.lit(0).cast("long"))


# DuckDB rendering of the same semantics, used by oracle SQL. {col} is the
# input expression. Kept adjacent to the Spark expression so the two can't
# drift apart silently.
PARSE_COUNT_ORACLE_SQL = """
CAST(ROUND(
  COALESCE(TRY_CAST(regexp_extract(replace(upper(trim({col})), ',', ''), '^([0-9]*\\.?[0-9]+)', 1) AS DOUBLE), 0)
  * (CASE
       WHEN replace(upper(trim({col})), ',', '') LIKE '%K' THEN 1000.0
       WHEN replace(upper(trim({col})), ',', '') LIKE '%M' THEN 1000000.0
       WHEN replace(upper(trim({col})), ',', '') LIKE '%B' THEN 1000000000.0
       ELSE 1.0
     END)
) AS BIGINT)
""".strip()
