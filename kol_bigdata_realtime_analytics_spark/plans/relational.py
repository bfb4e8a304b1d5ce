"""Core relational operator coverage (SURVEY.md §2.2-2.8).

Each query exercises one reference operator family on the TESTDATA star
schema, paired with a DuckDB oracle. Aliases match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.plans.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
    table,
)

# ---------------------------------------------------------------------------
# A1 — multi-measure hash aggregation (ref: bronze_to_silver.py:552-566 shape;
# classic TPC-H Q1). Catalyst does partial (map-side) + final agg automatically.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_base_price,
           floor(CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000)
                              AS BIGINT)) AS DOUBLE) / 10000) / 100 AS sum_disc_price,
           floor(CAST(SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * (1 + l_tax))
                                     * 1000000) AS BIGINT)) AS DOUBLE) / 10000) / 100
             AS sum_charge,
           floor((CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / COUNT(*))
                 * 1000000) / 1000000 AS avg_qty,
           floor(((CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100)
                  / COUNT(*)) * 1000000) / 1000000 AS avg_price,
           floor(((CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100)
                  / COUNT(*)) * 1000000) / 1000000 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure grouped agg: sum/avg/count over filtered lineitem.

    Q1 is the engine's hottest wide aggregate, so it runs the FIXED-POINT
    order-proof form instead of decimal sums (PERF.md §2.10 — decimal
    accumulation measured ~2x slower at sf0.1):
      * per row, measures quantize to integers via round(x * S) in the
        scan's codegen stage — EXACT, not approximate, because the
        columns are true fixed-decimal data (quantities integral, money
        2dp, rates 2dp; products of 2dp x 2dp have <= 4dp), so x*S always
        sits within ~1e-5 of an integer and never near a rounding tie;
      * a fixed-point long splits into TWO LIMBS (arithmetic-shift hi,
        masked lo — the identity x == (x>>20)*2^20 + (x & (2^20-1)) holds
        for every long in two's complement) and BOTH limbs sum as plain
        longs in ONE hash aggregation — whole-stage-codegen adds, a single
        exchange, no second merge stage — but ONLY the measures that need
        the headroom pay for it: p/dp/ch (scale up to ~1.1e11 per row)
        limb-split to N_rows/group < 2^63 / max(maxfx/2^20, 2^20) ≈ 8.8e12,
        ~15x headroom over 100 TB lineitem, while q (≤ ~50/row) and di
        (≤ 10/row) sum as plain longs with ≥ 1e17-row headroom — limbing
        them bought nothing and cost two extra agg columns each
        (measured: full-limb 0.82 s vs partial-limb 0.62 s best-of-5
        interleaved one session at sf0.1);
      * limbs recombine per OUTPUT group (a handful of rows) in
        DECIMAL(38,0) — exact at any summation order.
    This replaced the r4 salted two-stage form (salt's second exchange +
    AQE stage cost ~0.4 s flat locally) and the decimal form (measured
    2.13 s vs 0.87 s full-limb in the same interleaved session — decimal
    accumulation is the slowest order-proof form by far). Derived outputs
    (2dp sums, 6dp avgs) use floor-truncation of the deterministic double
    quotients, the registry's tie-proof rule.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    shift = 1 << 20
    small = {  # per-row magnitude bounded by data semantics, not scale
        "q": F.round(F.col("l_quantity")).cast("long"),
        "di": F.round(F.col("l_discount") * 100).cast("long"),
    }
    big = {
        "p": F.round(F.col("l_extendedprice") * 100).cast("long"),
        "dp": F.round(disc_price * 1000000).cast("long"),
        "ch": F.round(disc_price * (1 + F.col("l_tax")) * 1000000).cast("long"),
    }
    aggs = [F.sum(v).alias(k) for k, v in small.items()]
    for k, fx in big.items():
        aggs.append(F.sum(F.shiftright(fx, 20)).alias(f"{k}_hi"))
        aggs.append(F.sum(fx.bitwiseAND(F.lit(shift - 1))).alias(f"{k}_lo"))
    aggs.append(F.count("*").alias("n"))
    limbs = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*aggs)
    )
    dec = "decimal(38,0)"
    merged = limbs.select(
        "l_returnflag",
        "l_linestatus",
        *[F.col(k).cast(dec).alias(k) for k in small],
        *[
            (F.col(f"{k}_hi").cast(dec) * shift + F.col(f"{k}_lo").cast(dec)).alias(k)
            for k in big
        ],
        "n",
    )

    def dbl(name):
        return F.col(name).cast("double")

    def t6(col):
        return F.floor(col * 1000000) / 1000000

    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("q").cast("bigint").alias("sum_qty"),
        (dbl("p") / 100).alias("sum_base_price"),
        (F.floor(dbl("dp") / 10000) / 100).alias("sum_disc_price"),
        (F.floor(dbl("ch") / 10000) / 100).alias("sum_charge"),
        t6(dbl("q") / F.col("n")).alias("avg_qty"),
        t6((dbl("p") / 100) / F.col("n")).alias("avg_price"),
        t6((dbl("di") / 100) / F.col("n")).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# A2 — KPI agg with countDistinct (ref: silver_to_gold.py:574-587)
# ---------------------------------------------------------------------------


@register(
    "platform_kpi",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
           COUNT(*)                                AS n_events,
           {sql_dsum('value')}                     AS total_value,
           {sql_davg('value')}                     AS avg_value,
           ROUND(MAX(CAST(value AS DOUBLE)), 2)    AS max_value,
           ROUND(MIN(CAST(value AS DOUBLE)), 2)    AS min_value
    FROM events GROUP BY event_type
    """,
)
def platform_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-platform KPI rollup: exact distinct users + value stats."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
        davg("value").alias("avg_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.min("value"), 2).alias("min_value"),
    )


# ---------------------------------------------------------------------------
# A3 — grouped count (ref: silver_to_gold.py:262,474)
# ---------------------------------------------------------------------------


@register(
    "orders_priority_count",
    oracle="SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority",
)
def orders_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().count() — simplest agg shape."""
    return table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# A4 — global (ungrouped) aggregation; timestamps as epoch micros
# (ref: silver_to_gold.py:348-351)
# ---------------------------------------------------------------------------


@register(
    "events_global_stats",
    oracle="""
    SELECT epoch_us(MIN(ts)) AS min_ts_us, epoch_us(MAX(ts)) AS max_ts_us,
           COUNT(*) AS n, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def events_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/count in one pass."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.unix_micros(F.min("ts")).alias("min_ts_us"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# A5 — distinct (ref: silver_to_gold.py:318-323 dim_time build)
# ---------------------------------------------------------------------------


@register(
    "distinct_order_dates",
    oracle="SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key FROM orders",
)
def distinct_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct date keys (yyyyMMdd int) — dim_time input."""
    return (
        table(spark, sf_dir, "orders")
        .select(F.date_format("o_orderdate", "yyyyMMdd").cast("int").alias("date_key"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# W1 — latest-per-key via row_number window (ref: product_tracker.py:287-292)
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, ROUND(CAST(value AS DOUBLE), 2) AS value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key — deterministic dedup (tie-broken on event_id)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            F.round("value", 2).alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — dimension-enrichment broadcast joins (ref: silver_to_gold.py:161-199).
# nation (25 rows) and region (5 rows) are canonical broadcast dims.
# ---------------------------------------------------------------------------


@register(
    "customer_enriched",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region,
           ROUND(CAST(c.c_acctbal AS DOUBLE), 2) AS acctbal, c.c_mktsegment
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def customer_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema enrichment: fact side joins two broadcast dims (no shuffle)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.round("c_acctbal", 2).alias("acctbal"),
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# J2 + T2 — join, aggregate, top-k (ref: silver_to_gold.py:184-199 +
# trino_client.py:323-364). Tie-safe sort includes the unique key.
# ---------------------------------------------------------------------------


@register(
    "top_spenders",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS total_spend
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spend DESC, c_custkey ASC
    LIMIT 20
    """,
)
def top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k by spend (order-proof decimal sum —
    the ranking key itself is now summation-order-invariant)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Semi/anti joins — not in the reference surface (SURVEY §2.3 notes only
# inner/left equi) but part of a complete engine; EXISTS / NOT EXISTS.
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "active_customer_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_active FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def active_customer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) + count."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count("*").alias("n_active"))


# ---------------------------------------------------------------------------
# T1 — order + pagination (ref: trino_client.py:111-139 LIMIT/OFFSET)
# ---------------------------------------------------------------------------


@register(
    "orders_page",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50 OFFSET 100
    """,
)
def orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT n OFFSET m — serving-layer pagination."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(100)
        .limit(50)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# Composed serving read path (r4 verdict ask 6): the reference dashboard
# stitches list + platform stats + leaderboard into ONE page load
# (serving/api/services/trino_client.py:258-364 issues the three queries,
# serving/dashboard/app.py:174-248 renders them together). Here the stitch
# is ONE plan: orders scanned once (pre-aggregated per customer), customer
# scanned once, the enriched dim pinned (localCheckpoint — dim-sized, the
# streaming sinks' pre-materialization stance), and the three page sections
# are cheap branches over the pin, unioned long-form with a `section` tag.
# ---------------------------------------------------------------------------

_DASH_SQL = f"""
WITH spend AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         SUM(CAST(CAST(o_totalprice AS DOUBLE) AS DECIMAL(18,6))) AS spend_dec
  FROM orders GROUP BY o_custkey
), enriched AS (
  SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
         COALESCE(s.n_orders, 0) AS n_orders, s.spend_dec
  FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
), lst AS (
  SELECT 'list' AS section,
         ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rk,
         c_custkey AS id, c_name AS label,
         ROUND(CAST(c_acctbal AS DOUBLE), 2) AS m1, CAST(n_orders AS DOUBLE) AS m2
  FROM enriched QUALIFY rk <= 50
), seg AS (
  SELECT 'segment_stats' AS section,
         ROW_NUMBER() OVER (ORDER BY c_mktsegment ASC) AS rk,
         CAST(-1 AS BIGINT) AS id, c_mktsegment AS label,
         {sql_davg('c_acctbal')} AS m1, CAST(COUNT(*) AS DOUBLE) AS m2
  FROM enriched GROUP BY c_mktsegment
), lead AS (
  SELECT 'leaderboard' AS section,
         ROW_NUMBER() OVER (ORDER BY spend_dec DESC, c_custkey ASC) AS rk,
         c_custkey AS id, c_name AS label,
         CAST(ROUND(spend_dec, 2) AS DOUBLE) AS m1, CAST(n_orders AS DOUBLE) AS m2
  FROM enriched WHERE spend_dec IS NOT NULL QUALIFY rk <= 20
)
SELECT section, CAST(rk AS BIGINT) AS rk, id, label, m1, m2
FROM (SELECT * FROM lst UNION ALL SELECT * FROM seg UNION ALL SELECT * FROM lead)
ORDER BY section, rk
"""


@register("serving_dashboard_page", oracle=_DASH_SQL)
def serving_dashboard_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One stitched dashboard page: list page, per-segment stats, spend
    leaderboard — single scan per base table, long-form union output.

    100 TB stance: orders (the fact table) is reduced to a per-customer
    aggregate in its ONLY pass; the customer join shuffles dim-sized data
    only; the pinned enriched frame is dim-cardinality, so the three section
    branches never touch the fact table again.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("double").cast("decimal(18,6)")).alias("spend_dec"),
    )
    enriched = (
        c.join(spend, c.c_custkey == spend.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "c_acctbal",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            "spend_dec",
        )
        .localCheckpoint(eager=True)
    )
    lst = (
        enriched.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(50)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
            ),
        )
        .select(
            F.lit("list").alias("section"),
            F.col("rk").cast("bigint").alias("rk"),
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("label"),
            F.round("c_acctbal", 2).alias("m1"),
            F.col("n_orders").cast("double").alias("m2"),
        )
    )
    seg = (
        enriched.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"), davg("c_acctbal").alias("avg_bal"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.col("c_mktsegment").asc())))
        .select(
            F.lit("segment_stats").alias("section"),
            F.col("rk").cast("bigint").alias("rk"),
            F.lit(-1).cast("bigint").alias("id"),
            F.col("c_mktsegment").alias("label"),
            F.col("avg_bal").alias("m1"),
            F.col("n_cust").cast("double").alias("m2"),
        )
    )
    lead = (
        enriched.filter(F.col("spend_dec").isNotNull())
        .orderBy(F.col("spend_dec").desc(), F.col("c_custkey").asc())
        .limit(20)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("spend_dec").desc(), F.col("c_custkey").asc())
            ),
        )
        .select(
            F.lit("leaderboard").alias("section"),
            F.col("rk").cast("bigint").alias("rk"),
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("label"),
            F.round(F.col("spend_dec"), 2).cast("double").alias("m1"),
            F.col("n_orders").cast("double").alias("m2"),
        )
    )
    return lst.unionByName(seg).unionByName(lead).orderBy("section", "rk")


# ---------------------------------------------------------------------------
# T3 — weighted top-k by expression (ref: cache_warmer.py:248-262)
# ---------------------------------------------------------------------------


@register(
    "weighted_top_parts",
    oracle="""
    SELECT p_partkey, p_name, ROUND(COALESCE(CAST(p_retailprice AS DOUBLE), 0) + COALESCE(p_size, 0) * 10, 2) AS weight
    FROM part
    ORDER BY weight DESC, p_partkey ASC
    LIMIT 15
    """,
)
def weighted_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k on a computed weight expression (COALESCE defaults like the ref)."""
    p = table(spark, sf_dir, "part")
    weight = F.round(F.coalesce(F.col("p_retailprice"), F.lit(0)) + F.coalesce(F.col("p_size"), F.lit(0)) * 10, 2)
    return (
        p.select("p_partkey", "p_name", weight.alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("p_partkey").asc())
        .limit(15)
    )


# ---------------------------------------------------------------------------
# T4 — range-filtered top-k (ref: trending.py:161-205 viral/rising slices)
# ---------------------------------------------------------------------------


@register(
    "events_value_band_topk",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(CAST(value AS DOUBLE), 2) AS value
    FROM events
    WHERE value BETWEEN 40 AND 80
    ORDER BY value DESC, event_id ASC
    LIMIT 25
    """,
)
def events_value_band_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-band slice + top-k (the 'rising' leaderboard shape)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").between(40, 80))
        .select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# T5 — prefix search (ref: redis_client.py:266-278 ZRANGEBYLEX autocomplete)
# ---------------------------------------------------------------------------


@register(
    "customer_prefix_search",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_name LIKE 'Customer#00000001%'
    ORDER BY c_name ASC, c_custkey ASC
    LIMIT 10
    """,
)
def customer_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete as a filter + sort + limit."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_name").startswith("Customer#00000001"))
        .select("c_custkey", "c_name")
        .orderBy(F.col("c_name").asc(), F.col("c_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# U1 — unionByName with missing columns (ref: bronze_to_silver.py:225-227)
# ---------------------------------------------------------------------------


@register(
    "union_accounts",
    oracle="""
    SELECT c_custkey AS account_id, c_name AS name, ROUND(CAST(c_acctbal AS DOUBLE), 2) AS acctbal,
           c_mktsegment AS mktsegment, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey + 1000000 AS account_id, s_name AS name, ROUND(CAST(s_acctbal AS DOUBLE), 2) AS acctbal,
           CAST(NULL AS VARCHAR) AS mktsegment, 'supplier' AS kind
    FROM supplier
    """,
)
def union_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) of heterogeneous sources."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("account_id"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 1000000).alias("account_id"),
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# A9 — one-pass conditional aggregation (the reference runs one filter+count
# job per label — SURVEY flags it as a perf bug; this is the single-pass fix)
# ---------------------------------------------------------------------------


@register(
    "event_type_breakdown",
    oracle="""
    SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)    AS errors,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)   AS signups,
           CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) AS BIGINT) AS impressions,
           COUNT(*) AS total
    FROM events
    """,
)
def event_type_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label distribution in ONE job via sum(when(...)) — not N filter+count jobs."""
    ev = table(spark, sf_dir, "events")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    t = F.col("event_type")
    return ev.agg(
        cnt(t == "purchase").alias("purchases"),
        cnt(t == "error").alias("errors"),
        cnt(t == "signup").alias("signups"),
        cnt(t.isin("view", "click")).alias("impressions"),
        F.count("*").alias("total"),
    )


# ---------------------------------------------------------------------------
# P5 — when/otherwise tier bucketing + agg (ref: silver_to_gold.py:233-240)
# ---------------------------------------------------------------------------


@register(
    "acctbal_tiers",
    oracle=f"""
    SELECT CASE WHEN c_acctbal >= 7500 THEN 'platinum'
                WHEN c_acctbal >= 5000 THEN 'gold'
                WHEN c_acctbal >= 2500 THEN 'silver'
                WHEN c_acctbal >= 0    THEN 'bronze'
                ELSE 'delinquent' END AS tier,
           COUNT(*) AS n, {sql_davg('c_acctbal')} AS avg_bal
    FROM customer GROUP BY 1
    """,
)
def acctbal_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise chain bucketing then grouped agg."""
    c = table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") >= 7500, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2500, "silver")
        .when(F.col("c_acctbal") >= 0, "bronze")
        .otherwise("delinquent")
    )
    return (
        c.select(tier.alias("tier"), "c_acctbal")
        .groupBy("tier")
        .agg(F.count("*").alias("n"), davg("c_acctbal").alias("avg_bal"))
    )


# ---------------------------------------------------------------------------
# Date/time scalar functions — dim_time build (ref: silver_to_gold.py:327-343).
# Spark dayofweek is 1=Sunday..7=Saturday; DuckDB dayofweek is 0=Sunday — the
# oracle adds 1. day/month names via format pattern vs dayname()/monthname().
# ---------------------------------------------------------------------------


@register(
    "date_dim",
    oracle="""
    SELECT DISTINCT
           CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
           CAST(year(o_orderdate) AS INTEGER)       AS year,
           CAST(quarter(o_orderdate) AS INTEGER)    AS quarter,
           CAST(month(o_orderdate) AS INTEGER)      AS month,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS week_of_year,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS day_of_month,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS day_of_week,
           dayname(o_orderdate)   AS day_name,
           monthname(o_orderdate) AS month_name
    FROM orders
    """,
)
def date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_time: every date-part extraction the reference uses, in one select."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.date_format(d, "yyyyMMdd").cast("int").alias("date_key"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.weekofyear(d).alias("week_of_year"),
        F.dayofmonth(d).alias("day_of_month"),
        F.dayofweek(d).alias("day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
    ).distinct()


# ---------------------------------------------------------------------------
# S7/JSON — JSON-string field extraction (ref: trending_stream.py:436-441
# from_json over Kafka value; here over the events.props JSON column)
# ---------------------------------------------------------------------------


@register(
    "props_json_extract",
    oracle=f"""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1
    """,
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse a JSON payload column and aggregate on an extracted field."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# Cascading rollup — the materialized-aggregate cascade every warehouse
# runs: hourly partials -> daily from hourly -> weekly from daily, each
# level a REAGGREGATION of the previous level's outputs (count-sums and
# decimal value-sums are mergeable), never a rescan of events. The oracle
# computes the weekly numbers DIRECTLY from raw events, so the hash match
# proves the cascade loses nothing.
# ---------------------------------------------------------------------------

_CASCADE_ORACLE = """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""".strip()


@register("cascading_rollup_check", oracle=_CASCADE_ORACLE)
def cascading_rollup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly event metrics computed through the hour -> day -> week
    cascade of mergeable partials (counts sum; values sum in decimal at
    every level, so no re-rounding drift). The oracle aggregates raw
    events directly to weeks — equality certifies that materialized
    rollups can serve any coarser grain without rescanning the fact
    table."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("hour")).alias("day"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("v").alias("v"))
    weekly = daily.groupBy(
        F.date_trunc("week", F.col("day")).alias("week_ts"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("v").alias("v"))
    return weekly.select(
        F.date_format("week_ts", "yyyy-MM-dd").alias("week"),
        "event_type",
        "n_events",
        F.round(F.col("v"), 2).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance — the refresh pattern behind
# every nightly rollup: merge YESTERDAY'S aggregate table with today's
# delta partials instead of recomputing from all history. Counts and
# decimal sums are mergeable, so old ⊕ delta == full-recompute exactly;
# the oracle IS the full recompute, making the hash match the refresh-
# correctness certificate. The cutover (2000-01-01) splits the fact scan
# with partition-prunable predicates.
# ---------------------------------------------------------------------------

_INCR_MV_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""".strip()


@register("incremental_mv_update_check", oracle=_INCR_MV_ORACLE)
def incremental_mv_update_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type totals computed as merge(old aggregate, delta aggregate)
    where old covers ts < 2000-01-01 and delta the rest — the incremental
    refresh never touches pre-cutover rows again (both sub-aggregations
    prune on the same pushed predicate a dt-partitioned table would prune
    on). The oracle recomputes from ALL rows; hash equality proves the
    merge loses nothing."""
    ev = table(spark, sf_dir, "events")
    cut = F.lit("2000-01-01 00:00:00").cast("timestamp")

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )

    old = partial(ev.filter(F.col("ts") < cut))
    delta = partial(ev.filter(F.col("ts") >= cut))
    return (
        old.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.round(F.sum("v"), 2).cast("double").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# Welch's t-test — the A/B readout: is the mean event value of 'click'
# different from 'view'? Sums and sums-of-squares accumulate in decimal
# (order-proof); the t statistic and Welch dof are derived per GROUP PAIR
# from those exact moments, truncated at 6dp.
# ---------------------------------------------------------------------------

_TTEST_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value * value AS DECIMAL(28,12))) AS DOUBLE) AS ss
  FROM events WHERE event_type IN ('click', 'view') GROUP BY event_type
),
a AS (SELECT * FROM m WHERE event_type = 'click'),
b AS (SELECT * FROM m WHERE event_type = 'view')
SELECT 'click_vs_view' AS comparison,
       a.n AS n_a, b.n AS n_b,
       floor((a.s / a.n) * 1000000) / 1000000 AS mean_a,
       floor((b.s / b.n) * 1000000) / 1000000 AS mean_b,
       floor(((a.s / a.n) - (b.s / b.n))
             / sqrt( (((a.ss - a.s * a.s / a.n) / (a.n - 1)) / a.n)
                   + (((b.ss - b.s * b.s / b.n) / (b.n - 1)) / b.n) )
             * 1000000) / 1000000 AS t_stat
FROM a, b
""".strip()


@register("ab_value_ttest", oracle=_TTEST_ORACLE)
def ab_value_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t statistic for mean(value | click) vs mean(value | view).
    One conditional-aggregation pass collects exact decimal moments per
    arm; the statistic derives from those six scalars, so the only float
    ops are the final deterministic double arithmetic (trunc6'd)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    m = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(28,12)"))
            .cast("double")
            .alias("ss"),
        )
        .localCheckpoint(eager=True)  # 2 rows; both arm branches read it
    )
    a = m.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("ss").alias("ss_a")
    )
    b = m.filter(F.col("event_type") == "view").select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("ss").alias("ss_b")
    )
    j = a.crossJoin(b)
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    var_a = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    t = (mean_a - mean_b) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))

    def t6(c):
        return F.floor(c * 1000000) / 1000000

    return j.select(
        F.lit("click_vs_view").alias("comparison"),
        "n_a",
        "n_b",
        t6(mean_a).alias("mean_a"),
        t6(mean_b).alias("mean_b"),
        t6(t).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — "cheapest part at every size class or
# better": the classic multi-criteria operator (Borzsony/Kossmann/Stocker
# ICDE 2001). The Spark side runs the SORT-based linear algorithm; the
# oracle states the DEFINITION (no dominating row exists) — two
# independent formulations agreeing under the hash is the certificate.
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH base AS (
  SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS price, p_size
  FROM part
)
SELECT a.p_partkey, a.price, CAST(a.p_size AS BIGINT) AS p_size
FROM base a
WHERE NOT EXISTS (
  SELECT 1 FROM base b
  WHERE b.price <= a.price AND b.p_size >= a.p_size
    AND (b.price < a.price OR b.p_size > a.p_size)
)
ORDER BY a.price, a.p_partkey
""".strip()


@register("pareto_frontier_parts", oracle=_PARETO_ORACLE)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of the part catalog under (minimize retailprice, maximize
    size): a part survives iff nothing is both cheaper-or-equal AND
    bigger-or-equal with one strict. Equal (price, size) rows do not
    dominate each other — all kept, matching the definition.

    The plan is the sort-based skyline: one pass in price order keeping
    rows whose size strictly exceeds the running max over all STRICTLY
    cheaper rows (a range frame on integer cents ending at -1), plus a
    same-price max to drop rows dominated within their own price point —
    O(n log n) vs the oracle's O(n^2) NOT EXISTS definition. Two
    independent formulations hashing identically is the correctness
    certificate. Prices quantized to integer cents for the range frame
    (2-decimal domain; exact in both engines after the double widening).

    Scale shape: dim-table sized here (the global-order window is the
    ntile_acctbal_quartiles precedent); at fact scale the standard
    distributed skyline is local-skyline-per-partition then skyline of
    the union — the same two-phase shape as TakeOrderedAndProject, with
    the local pass pruning all but a sliver."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    base = p.withColumn(
        "cents", F.round(F.col("price") * 100).cast("long")
    )
    w_before = (
        Window.orderBy("cents").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("cents")
    return (
        base.select(
            "p_partkey",
            "price",
            "p_size",
            F.max("p_size").over(w_before).alias("mx_before"),
            F.max("p_size").over(w_same).alias("mx_same"),
        )
        .filter(
            (F.col("p_size") == F.col("mx_same"))
            & (F.col("mx_before").isNull() | (F.col("p_size") > F.col("mx_before")))
        )
        .select("p_partkey", "price", "p_size")
        .orderBy("price", "p_partkey")
    )
