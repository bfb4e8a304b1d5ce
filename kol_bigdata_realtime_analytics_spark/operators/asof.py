"""As-of join: for each left row, the latest right row at-or-before its time.

Spark has no native as-of join (pyspark guide: compose or applyInPandas).
Two implementations with the same contract:

- `as_of_join`       : equi-join on key + time filter + row_number. One
  shuffle per side on the key; correct everywhere, O(matches) intermediate.
- `as_of_join_pandas`: cogrouped applyInPandas with pd.merge_asof per key
  group — Arrow-batched, linear after the per-key sort, the scale path when
  the per-key match fan-out of the join form explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join (backward): latest right row with right_ts <= left_ts."""
    r = right.select(
        F.col(key).alias("_r_key"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c) for c in right_cols],
    )
    joined = left.join(
        r, (left[key] == r["_r_key"]) & (r["_r_ts"] <= left[left_ts]), "left"
    )
    w = Window.partitionBy(*[left[c] for c in left.columns]).orderBy(F.col("_r_ts").desc())
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_r_key", "_r_ts")
    )


def as_of_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """merge_asof per cogrouped key — no quadratic intermediate."""
    import pandas as pd

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{f.name} {f.dataType.simpleString()}" for f in right.schema.fields if f.name in right_cols]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        if rpdf.empty:
            for c in right_cols:
                lpdf[c] = None
            return lpdf
        rpdf = rpdf.sort_values(right_ts)[[right_ts, *right_cols]]
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=right_ts, direction="backward"
        )
        return merged.drop(columns=[right_ts] if right_ts not in lpdf.columns else [])

    return left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas(
        lambda l, r: merge(l, r), schema=out_schema
    )
