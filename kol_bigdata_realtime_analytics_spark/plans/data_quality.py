"""Data-quality queries: constraint validation and table profiling.

The reference validates its warehouse only implicitly (Airflow task
success/failure); a 100 TB lakehouse needs explicit, cheap DQ gates that
run as part of every load. Both queries here follow the repo's scale
rules: constant-width outputs (O(#checks) / O(#columns) rows no matter
the input size), conditional aggregation over single scans where
possible, and anti-joins (not correlated subqueries) for FK checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.plans.registry import (
    hash52,
    register,
    sql_hash52,
    table,
)

# ---------------------------------------------------------------------------
# Constraint validation — PK uniqueness, FK integrity, null/range/blank.
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT 0 AS check_idx, 'orders_pk_duplicate_rows' AS check_name,
       CAST((SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
         AS violations
UNION ALL
SELECT 1, 'orders_fk_customer_orphans',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 2, 'lineitem_fk_orders_orphans',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE l.l_orderkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT)
UNION ALL
SELECT 3, 'events_null_user_id',
       CAST((SELECT COUNT(*) FROM events WHERE user_id IS NULL) AS BIGINT)
UNION ALL
SELECT 4, 'events_negative_value',
       CAST((SELECT COUNT(*) FROM events WHERE value < 0) AS BIGINT)
UNION ALL
SELECT 5, 'customer_blank_name',
       CAST((SELECT COUNT(*) FROM customer WHERE trim(COALESCE(c_name, '')) = '') AS BIGINT)
""".strip()


@register("dq_constraint_checks", oracle=_DQ_ORACLE)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per data-quality constraint with its violation count: PK
    uniqueness on orders, FK integrity orders->customer and
    lineitem->orders, null / range / blank checks on events and customer.

    Every check reduces to a handful of longs before any union, so the
    result is 6 rows at any corpus size. The FK checks are left-anti joins
    (customer broadcasts; orders-side dedup of l_orderkey keeps the
    lineitem anti-join's build side small). PK check is one conditional
    agg — count minus exact countDistinct; at 100 TB swap in
    approx_count_distinct for a first-pass gate and run the exact variant
    only when the approximate one fails the threshold.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    e = table(spark, sf_dir, "events")

    # same-table checks fold into ONE conditional aggregation per table
    # (r4 plan audit: events/customer were each scanned once per check)
    pk_dups = o.agg(
        (F.count("o_orderkey") - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("violations")
    )
    o_orphans = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey")).distinct()),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
    )
    l_orphans = (
        li.filter(F.col("l_orderkey").isNotNull())
        .join(
            o.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
    )
    e_both = e.agg(
        F.sum(F.col("user_id").isNull().cast("long")).alias("e_null"),
        F.sum((F.col("value") < 0).cast("long")).alias("e_neg"),
    ).localCheckpoint(eager=True)  # 1 row; both union arms read it without re-scanning events
    e_null = e_both.select(F.col("e_null").alias("violations"))
    e_neg = e_both.select(F.col("e_neg").alias("violations"))
    c_blank = c.filter(F.trim(F.coalesce(F.col("c_name"), F.lit(""))) == "").agg(
        F.count("*").alias("violations")
    )

    checks = [
        (0, "orders_pk_duplicate_rows", pk_dups),
        (1, "orders_fk_customer_orphans", o_orphans),
        (2, "lineitem_fk_orders_orphans", l_orphans),
        (3, "events_null_user_id", e_null),
        (4, "events_negative_value", e_neg),
        (5, "customer_blank_name", c_blank),
    ]
    out = None
    for idx, name, df in checks:
        row = df.select(
            F.lit(idx).cast("int").alias("check_idx"),
            F.lit(name).alias("check_name"),
            F.col("violations"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Table profiling — per-column stats for the orders table in one pass.
# ---------------------------------------------------------------------------

_PROFILE_ORACLE = """
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_k,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_k,
         CAST(MIN(o_orderkey) AS DOUBLE) AS min_k, CAST(MAX(o_orderkey) AS DOUBLE) AS max_k,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_c,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_c,
         CAST(MIN(o_custkey) AS DOUBLE) AS min_c, CAST(MAX(o_custkey) AS DOUBLE) AS max_c,
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_p,
         CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_p,
         MIN(o_totalprice) AS min_p, MAX(o_totalprice) AS max_p,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_d,
         CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd_d,
         CAST(epoch_us(MIN(o_orderdate)) AS DOUBLE) AS min_d,
         CAST(epoch_us(MAX(o_orderdate)) AS DOUBLE) AS max_d,
         CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_s,
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_s,
         MIN(o_orderstatus) AS min_s, MAX(o_orderstatus) AS max_s,
         CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pr,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_pr,
         MIN(o_orderpriority) AS min_pr, MAX(o_orderpriority) AS max_pr
  FROM orders
)
SELECT 'o_orderkey' AS column_name, n_rows, null_k AS n_null, nd_k AS n_distinct,
       min_k AS min_num, max_k AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM agg
UNION ALL
SELECT 'o_custkey', n_rows, null_c, nd_c, min_c, max_c, NULL, NULL FROM agg
UNION ALL
SELECT 'o_totalprice', n_rows, null_p, nd_p, min_p, max_p, NULL, NULL FROM agg
UNION ALL
SELECT 'o_orderdate', n_rows, null_d, nd_d, min_d, max_d, NULL, NULL FROM agg
UNION ALL
SELECT 'o_orderstatus', n_rows, null_s, nd_s, NULL, NULL, min_s, max_s FROM agg
UNION ALL
SELECT 'o_orderpriority', n_rows, null_pr, nd_pr, NULL, NULL, min_pr, max_pr FROM agg
""".strip()


@register("profile_orders", oracle=_PROFILE_ORACLE)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table — rows, nulls, exact distinct,
    min/max (numeric columns as doubles, timestamps as epoch micros, string
    columns as strings) — the schema-drift / sanity report a load job emits.

    ONE wide aggregation over one scan: Spark expands the multi-column
    COUNT(DISTINCT)s via a single Expand + two-level agg (one shuffle), then
    a constant-width stack turns the 1-row agg into one row per column.
    At 100 TB the exact distincts are the expensive part — swap
    approx_count_distinct into the same shape for a daily gate.
    """
    o = table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("*").alias("n_rows"),
        # o_orderkey
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("null_k"),
        F.countDistinct("o_orderkey").alias("nd_k"),
        F.min("o_orderkey").cast("double").alias("min_k"),
        F.max("o_orderkey").cast("double").alias("max_k"),
        # o_custkey
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_c"),
        F.countDistinct("o_custkey").alias("nd_c"),
        F.min("o_custkey").cast("double").alias("min_c"),
        F.max("o_custkey").cast("double").alias("max_c"),
        # o_totalprice
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias("null_p"),
        F.countDistinct("o_totalprice").alias("nd_p"),
        F.min("o_totalprice").alias("min_p"),
        F.max("o_totalprice").alias("max_p"),
        # o_orderdate -> epoch micros
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("null_d"),
        F.countDistinct("o_orderdate").alias("nd_d"),
        F.unix_micros(F.min("o_orderdate").cast("timestamp")).cast("double").alias("min_d"),
        F.unix_micros(F.max("o_orderdate").cast("timestamp")).cast("double").alias("max_d"),
        # o_orderstatus (string)
        F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)).alias("null_s"),
        F.countDistinct("o_orderstatus").alias("nd_s"),
        F.min("o_orderstatus").alias("min_s"),
        F.max("o_orderstatus").alias("max_s"),
        # o_orderpriority (string)
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)).alias("null_pr"),
        F.countDistinct("o_orderpriority").alias("nd_pr"),
        F.min("o_orderpriority").alias("min_pr"),
        F.max("o_orderpriority").alias("max_pr"),
    )
    return agg.selectExpr(
        "stack(6, "
        "'o_orderkey', null_k, nd_k, min_k, max_k, CAST(NULL AS STRING), CAST(NULL AS STRING), "
        "'o_custkey', null_c, nd_c, min_c, max_c, CAST(NULL AS STRING), CAST(NULL AS STRING), "
        "'o_totalprice', null_p, nd_p, min_p, max_p, CAST(NULL AS STRING), CAST(NULL AS STRING), "
        "'o_orderdate', null_d, nd_d, min_d, max_d, CAST(NULL AS STRING), CAST(NULL AS STRING), "
        "'o_orderstatus', null_s, nd_s, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_s, max_s, "
        "'o_orderpriority', null_pr, nd_pr, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_pr, max_pr"
        ") AS (column_name, n_null, n_distinct, min_num, max_num, min_str, max_str)",
        "n_rows",
    ).select(
        "column_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


# ---------------------------------------------------------------------------
# k-anonymity audit — privacy governance over quasi-identifiers: how many
# equivalence classes (distinct QI combinations) fall below k, i.e. rows
# re-identifiable by (segment, nation, balance band). One narrow groupBy
# on the QI tuple, then a tiny class-size histogram.
# ---------------------------------------------------------------------------

_K_ANON_ORACLE = """
WITH classes AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         COUNT(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT CAST(5 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
         AS n_risky_rows,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size
FROM classes
""".strip()


@register("k_anonymity_audit", oracle=_K_ANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the customer table 5-anonymous over (segment, nation, balance
    band)? Emits the violating-class and at-risk-row counts a release
    gate would check before publishing a dataset."""
    k = 5
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count("*").alias("class_size"))
    return classes.agg(
        F.lit(k).cast("long").alias("k"),
        F.count("*").alias("n_classes"),
        F.sum((F.col("class_size") < k).cast("long")).alias("n_small_classes"),
        F.sum(
            F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0)
        ).alias("n_risky_rows"),
        F.min("class_size").alias("min_class_size"),
    )


# ---------------------------------------------------------------------------
# Table content digest — an order-insensitive, partitioning-insensitive
# fingerprint of a whole table: per row, a 52-bit integer from md5 of the
# canonical row string; per table, COUNT + SUM + BIT_XOR of those values.
# Any row change, addition, or removal moves the digest; row order and
# cluster layout cannot. The cheap way to certify two copies of a 100 TB
# table are identical without sorting either.
# ---------------------------------------------------------------------------

_DIGEST_ROW_SQL = """CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
           o_orderstatus || '|' || CAST(o_totalprice AS VARCHAR) || '|' ||
           strftime(o_orderdate, '%Y-%m-%d') || '|' || o_orderpriority"""

_DIGEST_ORACLE = f"""
WITH h AS (
  SELECT {sql_hash52(_DIGEST_ROW_SQL)} AS rh
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(rh) % 4503599627370496 AS BIGINT) AS digest_sum,
       CAST(BIT_XOR(rh) AS BIGINT) AS digest_xor
FROM h
""".strip()


@register("table_content_digest", oracle=_DIGEST_ORACLE)
def table_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive digest of the orders table (md5-derived 52-bit
    row hashes folded with SUM and BIT_XOR). The row canonicalization
    (string join with '|') is shared with the oracle; doubles render via
    a cast that both engines print identically for 2dp money."""
    o = table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        F.col("o_totalprice").cast("string"),
        F.date_format(F.col("o_orderdate").cast("timestamp"), "yyyy-MM-dd"),
        "o_orderpriority",
    )
    rh = hash52(row_str)
    # 52-bit row hashes: sum exactly in decimal, fold back mod 2^52 (the
    # raw sum overflows a long at ~2000 rows)
    return o.select(rh.alias("rh")).agg(
        F.count("*").alias("n_rows"),
        (F.sum(F.col("rh").cast("decimal(38,0)")) % F.lit(4503599627370496))
        .cast("long")
        .alias("digest_sum"),
        F.bit_xor("rh").alias("digest_xor"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index — the production drift monitor: how far the
# value distribution moved between the first and second half of the data,
# per event type. Fixed value buckets (not rank deciles — no global sort);
# PSI = sum (p2-p1)*ln(p2/p1) over buckets, from exact integer ratios with
# decimal term sums (the KL-divergence discipline). Laplace +1 smoothing
# keeps empty buckets finite IN BOTH ENGINES identically.
# ---------------------------------------------------------------------------

_PSI_ORACLE = """
WITH mid AS (
  SELECT CAST(floor((epoch_us(MIN(ts)) + epoch_us(MAX(ts))) / 2) AS BIGINT) AS m_us
  FROM events
),
bucketed AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) < mid.m_us THEN 0 ELSE 1 END AS period,
         LEAST(CAST(floor(value / 10) AS BIGINT), 9) AS bucket,
         COUNT(*) AS c
  FROM events, mid
  GROUP BY 1, 2, 3
),
per_period AS (
  SELECT event_type, period, CAST(SUM(c) AS BIGINT) AS n
  FROM bucketed GROUP BY 1, 2
),
grid AS (
  SELECT et.event_type, b.bucket,
         COALESCE(c1.c, 0) + 1 AS c1s, COALESCE(c2.c, 0) + 1 AS c2s,
         n1.n + 10 AS n1s, n2.n + 10 AS n2s
  FROM (SELECT DISTINCT event_type FROM bucketed) et
  CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) b
  LEFT JOIN bucketed c1 ON c1.event_type = et.event_type AND c1.bucket = b.bucket AND c1.period = 0
  LEFT JOIN bucketed c2 ON c2.event_type = et.event_type AND c2.bucket = b.bucket AND c2.period = 1
  JOIN per_period n1 ON n1.event_type = et.event_type AND n1.period = 0
  JOIN per_period n2 ON n2.event_type = et.event_type AND n2.period = 1
)
SELECT event_type,
       floor(CAST(SUM(CAST(
         (CAST(c2s AS DOUBLE) / n2s - CAST(c1s AS DOUBLE) / n1s)
         * ln((CAST(c2s AS DOUBLE) / n2s) / (CAST(c1s AS DOUBLE) / n1s))
         AS DECIMAL(28,12))) AS DOUBLE) * 1000000) / 1000000 AS psi
FROM grid
GROUP BY event_type
""".strip()


@register("value_drift_psi", oracle=_PSI_ORACLE)
def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the value distribution between the first and second half of
    the event timeline, per event type (rule of thumb: < 0.1 stable,
    > 0.25 drifted). One scan to the bucket grid; the PSI fold runs over
    <= types x 10 decimal terms."""
    ev = table(spark, sf_dir, "events")
    # midpoint compared in INTEGER micros in both engines: converting the
    # midpoint back to a timestamp loses a microsecond between engines
    # (Spark's double->timestamp cast truncates, DuckDB's to_timestamp
    # rounds, and mid/1e6 is not exactly representable) — a boundary event
    # would land in different periods and flip the driver hash
    mid = ev.agg(
        F.floor((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("bigint")
        .alias("m_us")
    )
    bucketed = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy(
            "event_type",
            F.when(F.unix_micros(F.col("ts")) < F.col("m_us"), 0).otherwise(1).alias("period"),
            F.least(F.floor(F.col("value") / 10), F.lit(9)).cast("long").alias("bucket"),
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # tiny grid; 4 derived frames below
    )
    per_period = bucketed.groupBy("event_type", "period").agg(F.sum("c").alias("n"))
    types = bucketed.select("event_type").distinct()
    buckets = F.broadcast(
        ev.sparkSession.range(10).select(F.col("id").cast("long").alias("bucket"))
    )
    c1 = bucketed.filter("period = 0").select("event_type", "bucket", F.col("c").alias("c1"))
    c2 = bucketed.filter("period = 1").select("event_type", "bucket", F.col("c").alias("c2"))
    n1 = per_period.filter("period = 0").select("event_type", F.col("n").alias("n1"))
    n2 = per_period.filter("period = 1").select("event_type", F.col("n").alias("n2"))
    grid = (
        types.crossJoin(buckets)
        .join(c1, ["event_type", "bucket"], "left")
        .join(c2, ["event_type", "bucket"], "left")
        .join(F.broadcast(n1), "event_type")
        .join(F.broadcast(n2), "event_type")
        .select(
            "event_type",
            (F.coalesce("c1", F.lit(0)) + 1).alias("c1s"),
            (F.coalesce("c2", F.lit(0)) + 1).alias("c2s"),
            (F.col("n1") + 10).alias("n1s"),
            (F.col("n2") + 10).alias("n2s"),
        )
    )
    p1 = F.col("c1s").cast("double") / F.col("n1s")
    p2 = F.col("c2s").cast("double") / F.col("n2s")
    term = ((p2 - p1) * F.log(p2 / p1)).cast("decimal(28,12)")
    return grid.groupBy("event_type").agg(
        (F.floor(F.sum(term).cast("double") * 1000000) / 1000000).alias("psi")
    )


# ---------------------------------------------------------------------------
# l-diversity audit — k-anonymity's complement: a class can be large (k-safe)
# yet leak the sensitive attribute if every member shares one value. Per QI
# class, count DISTINCT sensitive values; the release gate checks min l.
# ---------------------------------------------------------------------------

_L_DIV_ORACLE = """
WITH classes AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT) AS l_div
  FROM customer
  GROUP BY 1, 2
)
SELECT CAST(3 AS BIGINT) AS l,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_diversity,
       CAST(SUM(CASE WHEN l_div < 3 THEN class_size ELSE 0 END) AS BIGINT) AS n_exposed_rows,
       CAST(MIN(l_div) AS BIGINT) AS min_l
FROM classes
""".strip()


@register("l_diversity_audit", oracle=_L_DIV_ORACLE)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the customer table 3-diverse over the balance band within each
    (segment, nation) class? k-anonymity (k_anonymity_audit) bounds class
    SIZE; this bounds sensitive-value homogeneity — a 1000-row class where
    everyone shares a balance band still leaks it. One narrow groupBy on
    the QI pair with a distinct-count of the sensitive band; emits the
    low-diversity class and exposed-row counts."""
    l = 3
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("class_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("long")
        ).alias("l_div"),
    )
    return classes.agg(
        F.lit(l).cast("long").alias("l"),
        F.count("*").alias("n_classes"),
        F.sum((F.col("l_div") < l).cast("long")).alias("n_low_diversity"),
        F.sum(
            F.when(F.col("l_div") < l, F.col("class_size")).otherwise(0)
        ).alias("n_exposed_rows"),
        F.min("l_div").alias("min_l"),
    )


# ---------------------------------------------------------------------------
# Daily volume anomalies — robust (median/MAD) spike detection, the pager
# alert for "ingestion broke / a bot farm arrived" that mean/stddev misses
# because the anomaly itself drags the mean.
# ---------------------------------------------------------------------------

_DAILY_ANOM_ORACLE = """
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
m AS (SELECT quantile_cont(n_events, 0.5) AS med FROM d),
a AS (SELECT quantile_cont(abs(n_events - m.med), 0.5) AS mad FROM d, m)
SELECT day, n_events,
       floor((n_events - m.med) / a.mad * 1000000) / 1000000 AS robust_z
FROM d, m, a
WHERE a.mad > 0 AND abs(n_events - m.med) > 3 * a.mad
ORDER BY day
""".strip()


@register("daily_value_anomalies", oracle=_DAILY_ANOM_ORACLE)
def daily_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event volume deviates more than 3 robust sigmas
    (median/MAD over the daily series) — non-vacuous on TESTDATA (the
    30-day series carries real >3-MAD days at every sf). One day-keyed
    aggregation of the fact table; the median/MAD passes run over the
    30-row day frame, so the robust statistics cost nothing at any corpus
    size — which is the point of aggregating BEFORE the statistics.
    Exact interpolated percentiles on both sides (parity pinned by
    value_percentiles)."""
    from kol_bigdata_realtime_analytics_spark.plans.domain import trunc6

    ev = table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .localCheckpoint(eager=True)  # 30-row frame feeds three branches
    )
    m = d.agg(F.expr("percentile(n_events, 0.5)").alias("med"))
    a = (
        d.crossJoin(F.broadcast(m))
        .agg(F.expr("percentile(abs(n_events - med), 0.5)").alias("mad"))
    )
    # mad > 0 fenced EXPLICITLY in both engines: on a zero-MAD series Spark's
    # x/0.0 is NULL (row silently dropped) while DuckDB's is +-inf (row
    # kept) — the filters would diverge exactly when the data degenerates
    return (
        d.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(a))
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("n_events") - F.col("med")) > 3 * F.col("mad"))
        )
        .select(
            "day",
            "n_events",
            trunc6((F.col("n_events") - F.col("med")) / F.col("mad")).alias(
                "robust_z"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# EWMA smoothing of the daily volume series — the standard monitoring
# baseline the anomaly alert compares against.
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_LAGS = 30
#: (lag j, weight (1-alpha)^j) precomputed in Python and embedded as the
#: SAME literal doubles in both engines (repr round-trips exactly), so the
#: smoothing kernel cannot diverge — the literal-table discipline of
#: lsh_bucket_sql applied to a time-series kernel.
_EWMA_WEIGHTS = [(j, (1.0 - _EWMA_ALPHA) ** j) for j in range(_EWMA_LAGS)]

_EWMA_ORACLE = f"""
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
w(j, w) AS (VALUES {", ".join(f"(CAST({j} AS BIGINT), {w!r})" for j, w in _EWMA_WEIGHTS)}),
terms AS (
  SELECT cur.day, cur.n_events,
         CAST(hist.n_events * w.w AS DECIMAL(28, 12)) AS num_t,
         CAST(w.w AS DECIMAL(28, 12)) AS den_t
  FROM d cur
  JOIN w ON TRUE
  JOIN d hist ON hist.day = cur.day - w.j
)
SELECT day, n_events,
       floor(CAST(SUM(num_t) AS DOUBLE) / CAST(SUM(den_t) AS DOUBLE)
             * 1000000) / 1000000 AS ewma
FROM terms GROUP BY day, n_events ORDER BY day
""".strip()


@register("ewma_daily_event_volume", oracle=_EWMA_ORACLE)
def ewma_daily_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.3) of daily event
    volume, normalized over the available history so early days aren't
    biased toward zero — the smoothed baseline a volume alert compares
    today against. The recursive EWMA definition is unrolled into a
    30-term weighted sum with the kernel weights precomputed driver-side
    and embedded as IDENTICAL literal doubles in both engines; the terms
    sum as DECIMAL(28,12) (order-proof), one division at the end.

    Scale shape: the fact table reduces to the 30-row day frame first;
    the kernel join is 30 days x 30 lags = at most 900 rows regardless of
    corpus size — aggregate-then-smooth, same discipline as
    daily_value_anomalies."""
    from kol_bigdata_realtime_analytics_spark.plans.domain import trunc6

    ev = table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .localCheckpoint(eager=True)  # 30-row frame, self-joined below
    )
    w = F.broadcast(
        ev.sparkSession.createDataFrame(_EWMA_WEIGHTS, "j long, w double")
    )
    hist = d.select(F.col("day").alias("h_day"), F.col("n_events").alias("h_n"))
    terms = (
        d.crossJoin(w)
        .join(hist, F.col("h_day") == F.col("day") - F.col("j"))
        .select(
            "day",
            "n_events",
            (F.col("h_n") * F.col("w")).cast("decimal(28,12)").alias("num_t"),
            F.col("w").cast("decimal(28,12)").alias("den_t"),
        )
    )
    return (
        terms.groupBy("day", "n_events")
        .agg(
            trunc6(
                F.sum("num_t").cast("double") / F.sum("den_t").cast("double")
            ).alias("ewma")
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Zone-map / data-skipping audit — the min-max file statistics a lakehouse
# (Delta/Iceberg/parquet row groups) keeps per partition, and the pruning
# decision a time-range predicate makes against them. At 100 TB the
# difference between scanning 3 partitions and 30 IS the query budget;
# this audit is how a pipeline verifies its layout actually prunes.
# ---------------------------------------------------------------------------

_ZONEMAP_ORACLE = """
WITH z AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
  FROM events GROUP BY 1
),
g AS (SELECT MAX(max_ts_us) AS gmax FROM z)
SELECT day, n_rows, min_ts_us, max_ts_us,
       (max_ts_us < g.gmax - 3 * 86400000000) AS would_skip
FROM z, g ORDER BY day
""".strip()


@register("zonemap_pruning_stats", oracle=_ZONEMAP_ORACLE)
def zonemap_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day zone-map statistics over the event stream (row count, min/max
    ts as epoch micros — exactly the per-file min-max stats Delta/Iceberg
    manifests and parquet row groups keep) plus the skipping decision a
    'last 3 days' predicate makes against them: would_skip is TRUE for the
    ~27 of 30 days whose max_ts falls before the cutoff — both branches
    non-vacuous at every sf. One day-keyed aggregation; the global-max
    cutoff joins back against the 30-row day frame (broadcast), so the
    audit costs one scan at any corpus size. Integer-only outputs; exact
    hash."""
    ev = table(spark, sf_dir, "events")
    z = (
        ev.select(F.expr("unix_micros(ts)").alias("us"))
        .groupBy(F.expr("us div 86400000000").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("us").alias("min_ts_us"),
            F.max("us").alias("max_ts_us"),
        )
        .localCheckpoint(eager=True)  # 30-row frame feeds two branches
    )
    g = z.agg(F.max("max_ts_us").alias("gmax"))
    return (
        z.crossJoin(F.broadcast(g))
        .select(
            "day",
            "n_rows",
            "min_ts_us",
            "max_ts_us",
            (F.col("max_ts_us") < F.col("gmax") - 3 * 86_400_000_000).alias(
                "would_skip"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# ANALYZE-style table statistics — exact NDV, null counts and most-common
# values per column: the inputs a cost-based optimizer (Spark CBO, Trino,
# DuckDB) estimates cardinalities from. At 100 TB these run as the nightly
# ANALYZE job whose stats decide join orders for every later query.
# ---------------------------------------------------------------------------

_TABLE_STATS_ORACLE = """
WITH vals AS (
  SELECT col_name, val FROM (
    SELECT 'event_type' AS col_name, event_type AS val FROM events
    UNION ALL
    SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
    UNION ALL
    SELECT 'day', CAST(epoch_us(ts) // 86400000000 AS VARCHAR) FROM events
  )
),
counts AS (
  SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals WHERE val IS NOT NULL GROUP BY col_name, val
),
stats AS (
  SELECT col_name, CAST(COUNT(*) AS BIGINT) AS ndv FROM counts GROUP BY col_name
),
nulls AS (
  SELECT col_name, CAST(COUNT(*) FILTER (WHERE val IS NULL) AS BIGINT) AS null_count
  FROM vals GROUP BY col_name
),
mcv AS (
  SELECT col_name, val, cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY col_name ORDER BY cnt DESC, val ASC) AS BIGINT) AS mcv_rank
  FROM counts
)
SELECT m.col_name, s.ndv, n.null_count, m.mcv_rank,
       m.val AS mcv_value, m.cnt AS mcv_count
FROM mcv m JOIN stats s ON m.col_name = s.col_name
JOIN nulls n ON m.col_name = n.col_name
WHERE m.mcv_rank <= 3
""".strip()


@register("table_stats_mcv", oracle=_TABLE_STATS_ORACLE)
def table_stats_mcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column ANALYZE statistics over the event stream: exact NDV, null
    count, and the top-3 most-common values (count desc, value asc) for
    event_type / user_id / day — the CBO's cardinality inputs. ONE scan:
    the three columns unpivot via stack() into (col_name, val) pairs (ids
    rendered as strings through exact integer casts — no float formatting
    crosses the engines), then one value-distinct-sized groupBy feeds the
    NDV, MCV-rank and null branches; the window partitions by col_name, so
    no single-partition movement at any corpus size."""
    ev = table(spark, sf_dir, "events")
    vals = ev.selectExpr(
        "stack(3, 'event_type', event_type,"
        " 'user_id', CAST(user_id AS STRING),"
        " 'day', CAST(unix_micros(ts) div 86400000000 AS STRING))"
        " AS (col_name, val)"
    )
    counts = (
        vals.filter(F.col("val").isNotNull())
        .groupBy("col_name", "val")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # value-distinct frame feeds 2 branches
    )
    stats = counts.groupBy("col_name").agg(
        F.count("*").cast("long").alias("ndv")
    )
    nulls = vals.groupBy("col_name").agg(
        F.count(F.when(F.col("val").isNull(), 1)).cast("long").alias("null_count")
    )
    w = Window.partitionBy("col_name").orderBy(
        F.col("cnt").desc(), F.col("val").asc()
    )
    mcv = (
        counts.withColumn("mcv_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("mcv_rank") <= 3)
        .select("col_name", F.col("val").alias("mcv_value"), F.col("cnt").alias("mcv_count"), "mcv_rank")
    )
    return (
        mcv.join(stats, "col_name")
        .join(nulls, "col_name")
        .select(
            "col_name", "ndv", "null_count", "mcv_rank", "mcv_value", "mcv_count"
        )
    )


# ---------------------------------------------------------------------------
# Compaction planning — group small per-day "files" into target-size merge
# bins (the OPTIMIZE/compaction job every lakehouse runs; at 100 TB the
# plan itself must come from metadata-sized frames, never a data scan per
# candidate file).
# ---------------------------------------------------------------------------

_COMPACTION_TARGET_ROWS = 2000

_COMPACTION_ORACLE = f"""
WITH f AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
),
c AS (
  SELECT day, n_rows,
         COALESCE(SUM(n_rows) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM f
)
SELECT CAST(cum_before // {_COMPACTION_TARGET_ROWS} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS total_rows,
       CAST(MIN(day) AS BIGINT) AS first_day,
       CAST(MAX(day) AS BIGINT) AS last_day
FROM c GROUP BY 1
""".strip()


@register("compaction_bin_plan", oracle=_COMPACTION_ORACLE)
def compaction_bin_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan over per-day row groups: days (the 'small files')
    are packed in day order into ~{target}-row merge bins via a running
    cumulative total — the deterministic next-fit packing a lakehouse
    OPTIMIZE job runs over its file manifest. The plan computes on the
    aggregated day frame (30 rows at any corpus size — metadata-sized, the
    point of planning from manifest stats); the single-partition running
    window is over that 30-row frame only. Output per bin: file count, row
    total, day span."""
    ev = table(spark, sf_dir, "events")
    f = (
        ev.select(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    c = f.withColumn(
        "cum_before", F.coalesce(F.sum("n_rows").over(wc), F.lit(0))
    )
    return (
        c.groupBy(
            F.expr(f"cum_before div {_COMPACTION_TARGET_ROWS}").alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.min("day").cast("long").alias("first_day"),
            F.max("day").cast("long").alias("last_day"),
        )
    )


# ---------------------------------------------------------------------------
# t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007) — completes the
# release-gate privacy family: k_anonymity_audit bounds class SIZE,
# l_diversity_audit bounds sensitive-value VARIETY, this bounds the
# sensitive-value DISTRIBUTION: a class whose balance-band histogram sits
# far from the global one leaks the band even when it is large and
# diverse. For an ORDERED sensitive attribute the Earth Mover's Distance
# reduces to mean |cumulative difference| (the paper's ordered-distance
# form), which is exact integer arithmetic until one final division.
# ---------------------------------------------------------------------------

_T_CLOSENESS_T = 0.15  # non-vacuous: violated at sf0.001/0.01, clean at sf0.1

_T_CLOSENESS_ORACLE = f"""
WITH c AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
                  CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) AS band
           FROM customer),
bands AS (SELECT DISTINCT band FROM c),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_bands FROM bands),
gl AS (SELECT band, COUNT(*) AS g FROM c GROUP BY band),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
cls AS (SELECT seg, nat, COUNT(*) AS class_size FROM c GROUP BY seg, nat),
cb AS (SELECT seg, nat, band, COUNT(*) AS k FROM c GROUP BY seg, nat, band),
grid AS (
  SELECT cls.seg, cls.nat, cls.class_size, b.band, COALESCE(cb.k, 0) AS k, gl.g
  FROM cls CROSS JOIN bands b
    JOIN gl ON gl.band = b.band
    LEFT JOIN cb ON cb.seg = cls.seg AND cb.nat = cls.nat AND cb.band = b.band
),
cum AS (
  SELECT seg, nat, class_size,
         SUM(k) OVER (PARTITION BY seg, nat ORDER BY band) AS ck,
         SUM(g) OVER (PARTITION BY seg, nat ORDER BY band) AS cg
  FROM grid
),
emd AS (
  SELECT seg, nat, class_size,
         CAST(SUM(ABS(ck * tot.n - cg * class_size)) AS BIGINT) AS num
  FROM cum, tot GROUP BY seg, nat, class_size
)
SELECT seg, nat, CAST(class_size AS BIGINT) AS class_size, emd_t6,
       emd_t6 > {_T_CLOSENESS_T} AS violates_t
FROM (
  SELECT seg, nat, class_size,
         floor(CAST(num AS DOUBLE)
               / ((m.m_bands - 1) * class_size * tot.n) * 1000000) / 1000000
           AS emd_t6
  FROM emd, m, tot
)
ORDER BY emd_t6 DESC, seg ASC, nat ASC
LIMIT 10
""".strip()


@register("t_closeness_audit", oracle=_T_CLOSENESS_ORACLE)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-10 quasi-identifier classes (segment, nation) by ordered-EMD
    between the class's balance-band distribution and the global one, with
    the t=0.15 release-gate flag. EMD for ordered attributes =
    (1/(m-1)) * sum_i |cum_class_i - cum_global_i|; every cumulative term
    is kept as an exact integer cross-product (ck*N - cg*size) and only
    the final normalization divides — one float op, trunc6'd, so the
    driver hash covers the distances themselves.

    Scale shape: two narrow aggregations over the table (class x band,
    global band), then everything runs on the CLASS GRID (|classes| x
    |bands| ~ 1.6k rows here; QI-cardinality-bounded, never row-bounded,
    at any corpus size) — windows are partitioned by class, the band spine
    and the two scalar frames broadcast. The overflow bound ck*N < 2^63
    holds to ~3e9 rows; past that lift the cross-products to
    DECIMAL(38,0) (same exactness, the pricing_summary discipline)."""
    from kol_bigdata_realtime_analytics_spark.plans.domain import trunc6

    c = table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal").cast("double") / 1000).cast("long").alias("band"),
    )
    bands = c.select("band").distinct()
    m = bands.agg(F.count("*").cast("long").alias("m_bands"))
    gl = c.groupBy("band").agg(F.count("*").alias("g"))
    tot = c.agg(F.count("*").cast("long").alias("n"))
    cls = c.groupBy("seg", "nat").agg(F.count("*").alias("class_size"))
    cb = c.groupBy("seg", "nat", "band").agg(F.count("*").alias("k"))
    grid = (
        cls.crossJoin(F.broadcast(bands))
        .join(F.broadcast(gl), "band")
        .join(cb, ["seg", "nat", "band"], "left")
        .select(
            "seg", "nat", "class_size", "band",
            F.coalesce("k", F.lit(0)).alias("k"), "g",
        )
    )
    w = (
        Window.partitionBy("seg", "nat")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "seg", "nat", "class_size",
        F.sum("k").over(w).alias("ck"),
        F.sum("g").over(w).alias("cg"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("seg", "nat", "class_size")
        .agg(
            F.sum(
                F.abs(F.col("ck") * F.col("n") - F.col("cg") * F.col("class_size"))
            ).cast("long").alias("num"),
            F.first("n").alias("n"),
        )
    )
    return (
        emd.crossJoin(F.broadcast(m))
        .select(
            "seg",
            "nat",
            F.col("class_size").cast("long").alias("class_size"),
            trunc6(
                F.col("num").cast("double")
                / ((F.col("m_bands") - 1) * F.col("class_size") * F.col("n"))
            ).alias("emd_t6"),
        )
        .withColumn("violates_t", F.col("emd_t6") > F.lit(_T_CLOSENESS_T))
        .orderBy(F.col("emd_t6").desc(), F.col("seg").asc(), F.col("nat").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Equi-height histogram + selectivity estimation check — the other half of
# the ANALYZE/CBO story next to table_stats_mcv (NDV + MCVs estimate
# EQUALITY predicates; height-balanced histograms estimate RANGE
# predicates — the same split Spark's own CBO makes). Build the 8-bucket
# histogram, estimate three literal range predicates with intra-bucket
# uniform interpolation, and hash-certify estimate AND truth side by side.
# ---------------------------------------------------------------------------

_EQH_BUCKETS = 8
_EQH_PREDS = [50000.0, 150000.0, 400000.0]  # span low/mid/high selectivity

_EQH_ORACLE = f"""
WITH b AS (
  SELECT o_totalprice AS v,
         ntile({_EQH_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bkt
  FROM orders
),
hist AS (
  SELECT bkt, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS cnt FROM b GROUP BY bkt
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
preds AS (SELECT unnest([{", ".join(repr(p) for p in _EQH_PREDS)}]::DOUBLE[]) AS p),
est AS (
  SELECT p.p,
         CAST(SUM(CAST(CASE WHEN h.hi <= p.p THEN CAST(h.cnt AS DOUBLE)
                   WHEN h.lo > p.p OR h.hi = h.lo THEN 0.0
                   ELSE h.cnt * (p.p - h.lo) / (h.hi - h.lo) END
              AS DECIMAL(28,12))) AS DOUBLE) AS est_rows
  FROM preds p CROSS JOIN hist h GROUP BY p.p
),
act AS (
  SELECT p.p, CAST(COUNT_IF(b.v <= p.p) AS BIGINT) AS act_rows
  FROM preds p CROSS JOIN b GROUP BY p.p
)
SELECT est.p AS price_le,
       floor(est.est_rows / tot.n * 1000000) / 1000000 AS predicted_sel,
       floor(CAST(act.act_rows AS DOUBLE) / tot.n * 1000000) / 1000000
         AS actual_sel,
       floor(ABS(est.est_rows - act.act_rows) / tot.n * 1000000) / 1000000
         AS abs_err
FROM est JOIN act ON est.p = act.p, tot
ORDER BY price_le
""".strip()


@register("equiheight_histogram_check", oracle=_EQH_ORACLE)
def equiheight_histogram_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bucket height-balanced histogram on o_totalprice and its range-
    predicate selectivity estimates vs ground truth for three literal
    predicates — predicted = full buckets below the literal + uniform
    interpolation inside the straddling bucket. The driver hash covers the
    estimate AND the truth, so a histogram-build or interpolation
    regression flips a value. Determinism: ntile orders on (value,
    orderkey) — total order; interpolation fractions are IEEE ops on
    identical widened doubles; 8 decimal terms sum order-free.

    Scale shape: the build is the textbook exact form (one global ntile
    pass — the ntile_acctbal_quartiles shape, fine at dim-table size; at
    fact scale ANALYZE builds histograms from a deterministic sample, the
    hash_sample pattern, and this check's full-scan 'actual' leg is
    exactly the audit you run once after); estimation itself touches only
    the 8-row histogram x 3 predicates."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), "o_orderkey"
    )
    b = o.select(
        "v",
        F.ntile(_EQH_BUCKETS)
        .over(Window.orderBy("v", "o_orderkey"))
        .alias("bkt"),
    )
    hist = b.groupBy("bkt").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("cnt")
    )
    tot = b.agg(F.count("*").cast("long").alias("n"))
    preds = F.array(*[F.lit(p) for p in _EQH_PREDS])
    pr = o.sparkSession.range(1).select(F.explode(preds).alias("p"))
    contrib = (
        F.when(F.col("hi") <= F.col("p"), F.col("cnt").cast("double"))
        .when((F.col("lo") > F.col("p")) | (F.col("hi") == F.col("lo")), F.lit(0.0))
        .otherwise(
            F.col("cnt") * (F.col("p") - F.col("lo")) / (F.col("hi") - F.col("lo"))
        )
    )
    est = (
        hist.crossJoin(F.broadcast(pr))
        .groupBy("p")
        .agg(F.sum(contrib.cast("decimal(28,12)")).cast("double").alias("est_rows"))
    )
    act = (
        b.crossJoin(F.broadcast(pr))
        .groupBy("p")
        .agg(
            F.sum(F.when(F.col("v") <= F.col("p"), 1).otherwise(0))
            .cast("long")
            .alias("act_rows")
        )
    )
    return (
        est.join(act, "p")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("p").alias("price_le"),
            F.floor(F.col("est_rows") / F.col("n") * 1e6) / 1e6,
            F.floor(F.col("act_rows").cast("double") / F.col("n") * 1e6) / 1e6,
            F.floor(F.abs(F.col("est_rows") - F.col("act_rows")) / F.col("n") * 1e6)
            / 1e6,
        )
        .toDF("price_le", "predicted_sel", "actual_sel", "abs_err")
        .orderBy("price_le")
    )


# ---------------------------------------------------------------------------
# Benford's-law first-digit audit — the classic forensic-accounting DQ
# check: natural multi-scale monetary data follows P(d) = log10(1 + 1/d);
# fabricated or truncated data doesn't. Emits the observed vs expected
# first-digit distribution of order totals with per-digit chi-square
# contributions (TPC-H's uniform price generator deliberately FAILS the
# law — the audit's alarm branch is the live one here, which is exactly
# what makes the check non-vacuous).
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH v AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders WHERE o_totalprice > 0
),
d AS (
  SELECT CAST(floor(x / power(10, floor(log10(x)))) AS BIGINT) AS digit FROM v
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY digit),
digits AS (SELECT unnest(range(1, 10)) AS digit)
SELECT CAST(digits.digit AS BIGINT) AS digit,
       COALESCE(obs.cnt, 0) AS observed,
       floor(COALESCE(obs.cnt, 0) / CAST(n.n AS DOUBLE) * 1000000) / 1000000
         AS observed_frac,
       floor(log10(1 + 1.0 / digits.digit) * 1000000) / 1000000
         AS benford_frac,
       floor(power(COALESCE(obs.cnt, 0) - n.n * log10(1 + 1.0 / digits.digit), 2)
             / (n.n * log10(1 + 1.0 / digits.digit)) * 1000000) / 1000000
         AS chi2_term
FROM digits LEFT JOIN obs ON obs.digit = digits.digit, n
ORDER BY digit
""".strip()


@register("benford_digit_audit", oracle=_BENFORD_ORACLE)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed vs Benford-expected first-significant-digit distribution of
    order totals, with per-digit chi-square contributions. First digit via
    floor(x / 10^floor(log10 x)) — pure float math on identical widened
    doubles, no string formatting (float->string repr differs between
    engines). One narrow scan + 9-row grid; corpus-size-free after the
    digit rollup."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.floor(
            F.col("o_totalprice").cast("double")
            / F.pow(F.lit(10.0), F.floor(F.log10(F.col("o_totalprice").cast("double"))))
        ).cast("long").alias("digit")
    )
    n = d.agg(F.count("*").cast("long").alias("n"))
    obs = d.groupBy("digit").agg(F.count("*").cast("long").alias("cnt"))
    digits = o.sparkSession.range(1, 10).select(F.col("id").alias("digit"))
    bf = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    return (
        digits.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("observed"),
            (
                F.floor(
                    F.coalesce("cnt", F.lit(0)) / F.col("n").cast("double") * 1e6
                )
                / 1e6
            ).alias("observed_frac"),
            (F.floor(bf * 1e6) / 1e6).alias("benford_frac"),
            (
                F.floor(
                    F.pow(F.coalesce("cnt", F.lit(0)) - F.col("n") * bf, F.lit(2))
                    / (F.col("n") * bf)
                    * 1e6
                )
                / 1e6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten residual audit — the operational end of the
# privacy family (k-anonymity / l-diversity / t-closeness gate a RELEASE;
# this gates a DELETION): given a forget set of subject keys, enumerate
# every table still holding rows keyed to them. The output IS the delete
# worklist a GDPR erasure job executes (and re-running it after the
# deletes must return zero rows — the verification half).
# ---------------------------------------------------------------------------

_FORGET_ORACLE = """
WITH forget AS (
  SELECT DISTINCT user_id AS k FROM events WHERE user_id % 29 = 0
)
SELECT tbl, CAST(residual_rows AS BIGINT) AS residual_rows,
       CAST(distinct_keys AS BIGINT) AS distinct_keys
FROM (
  SELECT 'events' AS tbl, COUNT(*) AS residual_rows,
         COUNT(DISTINCT user_id) AS distinct_keys
  FROM events WHERE user_id IN (SELECT k FROM forget)
  UNION ALL
  SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey)
  FROM customer WHERE c_custkey IN (SELECT k FROM forget)
  UNION ALL
  SELECT 'orders', COUNT(*), COUNT(DISTINCT o_custkey)
  FROM orders WHERE o_custkey IN (SELECT k FROM forget)
) ORDER BY tbl
""".strip()


@register("forget_set_removal_audit", oracle=_FORGET_ORACLE)
def forget_set_removal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-data audit for a deletion request: the forget set (stand-in
    rule: user_id % 29 == 0 — in production an explicit request table) is
    left-semi-joined against every subject-keyed table; output = rows and
    distinct keys still present per table.

    Scale shape: the forget set is broadcast into each table's scan (a
    semi-join against a request-table-sized frame), so the audit costs one
    filtered scan per table with no shuffle — the same plan a DELETE WHERE
    would drive, which is the point: audit and erasure share pruning."""
    f = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 29 == 0)
        .select(F.col("user_id").alias("k"))
        .distinct()
    )
    def residual(df, tbl, key):
        return df.join(F.broadcast(f), df[key] == F.col("k"), "left_semi").agg(
            F.lit(tbl).alias("tbl"),
            F.count("*").cast("long").alias("residual_rows"),
            F.countDistinct(key).cast("long").alias("distinct_keys"),
        )
    ev = residual(table(spark, sf_dir, "events"), "events", "user_id")
    cu = residual(table(spark, sf_dir, "customer"), "customer", "c_custkey")
    od = residual(table(spark, sf_dir, "orders"), "orders", "o_custkey")
    return ev.unionByName(cu).unionByName(od).orderBy("tbl")
