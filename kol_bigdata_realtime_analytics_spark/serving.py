"""Serving query surface: the reference's REST read paths as engine queries.

Replaces trino_client.py's f-string SQL (injection-prone, no plan reuse —
SURVEY §4 anti-pattern) and the Redis ZSET read paths with sanitized,
parameterized DataFrame builders over the gold tables
(reference: serving/api/services/trino_client.py:111-364,
serving/api/services/redis_client.py:130-278).

Serving latency stance (SURVEY §7.4.5): these run per REST call only in
batch/offline contexts; the streaming path PRE-MATERIALIZES small ranking
tables per trigger (see streaming/sinks.py) so hot reads never plan a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: whitelisted sort fields (the reference sanitizes with a field list too)
SORTABLE = {
    "followers_count",
    "trust_score",
    "total_views",
    "total_likes",
    "avg_engagement_rate",
    "kol_id",
    "username",
}


def list_kols(
    dim_kol: DataFrame,
    sort_by: str = "followers_count",
    descending: bool = True,
    limit: int = 50,
    offset: int = 0,
    platform: str | None = None,
) -> DataFrame:
    """ORDER BY {field} {dir} LIMIT n OFFSET m with a sanitized field whitelist
    and a unique-key tie-break (deterministic pages under concurrent refresh)."""
    if sort_by not in SORTABLE:
        raise ValueError(f"unsortable field {sort_by!r}; allowed: {sorted(SORTABLE)}")
    df = dim_kol
    if platform is not None:
        df = df.filter(F.col("platform") == platform)
    key = F.col(sort_by).desc() if descending else F.col(sort_by).asc()
    return df.orderBy(key, F.col("kol_id").asc()).offset(offset).limit(limit)


def get_kol(dim_kol: DataFrame, kol_id: str, platform: str | None = None) -> DataFrame:
    df = dim_kol.filter(F.col("kol_id") == kol_id)
    if platform is not None:
        df = df.filter(F.col("platform") == platform)
    return df


def search_kols(dim_kol: DataFrame, query: str, limit: int = 20) -> DataFrame:
    """Case-insensitive substring search over username/display_name
    (ref search.py:188 LOWER + LIKE '%q%')."""
    q = query.lower()
    hit = F.lower(F.col("username")).contains(q) | F.lower(
        F.coalesce(F.col("display_name"), F.lit(""))
    ).contains(q)
    return (
        dim_kol.filter(hit)
        .orderBy(F.col("followers_count").desc(), F.col("kol_id").asc())
        .limit(limit)
    )


def autocomplete(dim_kol: DataFrame, prefix: str, limit: int = 10) -> DataFrame:
    """Prefix scan (ref redis ZRANGEBYLEX) as filter + ordered limit."""
    return (
        dim_kol.filter(F.lower(F.col("username")).startswith(prefix.lower()))
        .select("username", "platform", "followers_count")
        .orderBy(F.col("username").asc())
        .limit(limit)
    )


def top_kols(
    dim_kol: DataFrame, metric: str = "followers_count", k: int = 10, platform: str | None = None
) -> DataFrame:
    """Leaderboard top-k with rank column (ref trending.py:129-136 ZREVRANGE +
    enumerate). Per-platform rank is a window; global rank is orderBy+limit."""
    if metric not in SORTABLE:
        raise ValueError(f"unsortable metric {metric!r}")
    df = dim_kol
    if platform is not None:
        df = df.filter(F.col("platform") == platform)
        w = Window.partitionBy("platform").orderBy(F.col(metric).desc(), F.col("kol_id").asc())
        return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return (
        df.orderBy(F.col(metric).desc(), F.col("kol_id").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(F.col(metric).desc(), F.col("kol_id").asc())))
    )


def score_band(
    scores: DataFrame, score_col: str, lo: float, hi: float | None = None, k: int = 50
) -> DataFrame:
    """'Viral' (>=80) / 'rising' (40-79) style band slices (ref trending.py:161-205)."""
    cond = F.col(score_col) >= lo if hi is None else F.col(score_col).between(lo, hi)
    return scores.filter(cond).orderBy(F.col(score_col).desc(), F.col("kol_id").asc()).limit(k)


def platform_stats(dim_kol: DataFrame) -> DataFrame:
    """Global + per-platform stats in one cube pass (the reference runs one
    Trino query per level — trino_client.py:258-304; grouping-sets do both)."""
    return (
        dim_kol.cube("platform")
        .agg(
            F.count("*").alias("total_kols"),
            F.sum(F.when(F.col("verified"), 1).otherwise(0)).cast("long").alias("verified_kols"),
            F.round(F.avg("followers_count"), 2).alias("avg_followers"),
            F.max("followers_count").alias("max_followers"),
            F.round(F.avg("trust_score"), 2).alias("avg_trust"),
        )
        .withColumn("platform", F.coalesce(F.col("platform"), F.lit("__all__")))
    )
