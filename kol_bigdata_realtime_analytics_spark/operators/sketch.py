"""Count-min sketch: mergeable heavy-hitter counting in bounded space.

The sketch is a depth x width counter grid; each key increments one
counter per row (bucket = hash_d(key) % width), and a point estimate is
the MIN of the key's depth counters. Structural guarantees (not
probabilistic — they hold for every dataset and hash choice):
  * est(key) >= exact(key)    (counters only ever add counts)
  * each row's counters sum to N (every item lands in exactly one bucket
    per row)
The probabilistic part — est <= exact + e*N/width w.h.p. — is what makes
the fixed size useful; it's bounded empirically in pytest.

Spark shapes:
  * BUILD is one narrow aggregation: posexplode to (d, bucket) pairs —
    depth rows per item, map-side combined — then groupBy(d, bucket)
    count. The result is <= depth*width rows no matter the input size,
    and sketches of partitions/days MERGE by adding counters (the
    groupBy does that implicitly; unioned sketches re-group the same way).
  * ESTIMATE broadcast-joins the <= depth*width-row sketch to the query
    keys' (key, d, bucket) probes and takes min per key — the key side
    never shuffles.

This is the counting complement of the HLL (distinct) and KLL/GK
(percentile) sketches already in the registry's approx queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def _buckets(col, width: int, depth: int):
    return [F.pmod(F.xxhash64(col, F.lit(d)), F.lit(width)) for d in range(depth)]


def count_min_build(
    df: DataFrame,
    key_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """(d, bucket, cnt) counter grid, <= depth*width rows.

    With `weight_col`, each row adds its weight instead of 1 — so a sketch
    can be built from an ALREADY-AGGREGATED (key, count) frame in one pass
    instead of re-scanning the raw rows (identical counters, since the
    grid is linear in its inputs)."""
    pos = df.select(
        F.posexplode(F.array(*_buckets(F.col(key_col), width, depth))).alias(
            "d", "bucket"
        ),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w"),
    )
    return pos.groupBy("d", "bucket").agg(F.sum("w").alias("cnt"))


def count_min_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    out_col: str = "cm_estimate",
) -> DataFrame:
    """keys + `out_col`: the count-min point estimate for each key.

    Probes = keys x depth rows; the sketch broadcasts; a bucket missing
    from the sketch means zero items hashed there, so the estimate is 0
    (coalesce) — correct, since est >= exact >= 0 forces exact = 0."""
    probes = keys.select(
        key_col,
        F.posexplode(F.array(*_buckets(F.col(key_col), width, depth))).alias(
            "d", "bucket"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out_col))
    )
