"""Slowly-changing-dimension (Type 2) builder from a changelog stream.

The medallion silver layer keeps *current* attributes (latest-per-key,
`medallion/gold.py`); warehouse consumers also need attribute HISTORY —
"what was this user's segment when the order happened" — which is SCD Type 2:
one row per (key, attribute-value run) with validity interval and a
current flag. The reference keeps only latest snapshots
(`batch/product_tracker.py:287-292` latest-per-key); SCD2 is the
history-preserving generalization a warehouse actually queries.

Spark-first shape: two window passes over the SAME (key x event-time)
partitioning — change detection (lag) and interval stitching (lead) reuse
one hash exchange; Catalyst plans a single Exchange + one sort. No UDF,
no iteration: a 100 TB changelog builds its dimension history in one
shuffle keyed by the dimension key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a changelog into SCD2 validity intervals.

    Consecutive rows with the same attribute value merge into one interval;
    a change opens a new interval at its event time and closes the previous
    one at the same instant (valid_to of run k == valid_from of run k+1; the
    current run has valid_to NULL and is_current = 1). `tiebreak_col` makes
    same-timestamp ordering deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        # first row per key always opens an interval — detected by row
        # number, NOT by _prev IS NULL, because lag's no-previous-row NULL
        # is indistinguishable from a genuine NULL attribute value (a key
        # whose history STARTS with a NULL attribute would otherwise emit
        # no interval at all — caught by the hypothesis run-compression
        # test). NULL-safe inequality keeps runs of identical values
        # (including NULL runs) as one interval.
        .filter((F.col("_rn") == 1) | ~F.col("_prev").eqNullSafe(F.col(attr_col)))
        .drop("_rn")
    )
    return (
        changes.withColumn("_next_ts", F.lead(ts_col).over(w))
        .select(
            F.col(key_col),
            F.col(attr_col),
            F.unix_micros(F.col(ts_col)).alias("valid_from_us"),
            F.unix_micros(F.col("_next_ts")).alias("valid_to_us"),
            F.col("_next_ts").isNull().cast("int").alias("is_current"),
        )
    )


#: DuckDB rendering (for oracle SQL): {table}/{key}/{attr}/{ts}/{tb}
SCD2_ORACLE_SQL = """
WITH ordered AS (
  SELECT {key}, {attr}, {ts}, {tb},
         LAG({attr}) OVER (PARTITION BY {key} ORDER BY {ts}, {tb}) AS prev,
         ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY {ts}, {tb}) AS rn
  FROM {table}
),
changes AS (
  SELECT {key}, {attr}, {ts}, {tb}
  FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM {attr}
)
SELECT {key}, {attr},
       epoch_us({ts}) AS valid_from_us,
       epoch_us(LEAD({ts}) OVER (PARTITION BY {key} ORDER BY {ts}, {tb})) AS valid_to_us,
       CAST(LEAD({ts}) OVER (PARTITION BY {key} ORDER BY {ts}, {tb}) IS NULL AS INTEGER) AS is_current
FROM changes
""".strip()
