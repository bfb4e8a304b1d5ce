"""Subquery surface: EXISTS / NOT IN / scalar / correlated shapes.

The reference's SQL surface (Trino serving layer, `serving/api/services/
trino_client.py`) never issues subqueries, but a user migrating an OLAP
workload will. These queries re-express the classic TPC-H subquery shapes
(Q4/Q13/Q15/Q16/Q17/Q18 + correlated-scalar variants) as Spark plans that
de-correlate explicitly — every correlated subquery becomes a broadcast-able
aggregate + join, which is exactly the physical plan you want at 100 TB
(the subquery side is always the small side and never re-executes per row).

Determinism: float sums that feed comparisons or equality (Q15's MAX, the
above-average filters) are carried in DECIMAL(18,6) so summation order can
never flip a boundary row between engines; plain reported sums follow the
registry ROUND rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.plans.registry import register, table


# ---------------------------------------------------------------------------
# EXISTS — TPC-H Q4 shape (order-priority checking)
# ---------------------------------------------------------------------------


@register(
    "exists_late_ship_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def exists_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS de-correlated to a LEFT SEMI join (TPC-H Q4 shape).

    The semi join carries the extra non-equi predicate alongside the orderkey
    equi-key, so Spark still plans a hash join on l_orderkey — no per-row
    re-execution, one shuffle, and the probe side short-circuits on first
    match (semi-join semantics)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.alias("o")
        .join(li.alias("l"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Subquery-in-FROM — TPC-H Q13 shape (customer order distribution)
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer incl. zero (TPC-H Q13 shape).

    Left join preserves order-less customers; COUNT(o_orderkey) (not *)
    counts them as 0. Two-level agg: the second groupBy keys on a tiny
    domain (distinct order counts), so the second shuffle is negligible."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Scalar subquery over an aggregate view — TPC-H Q15 shape (top supplier)
# ---------------------------------------------------------------------------


@register(
    "top_revenue_suppliers",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev_d
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(ROUND(r.rev_d, 2) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_d = (SELECT MAX(rev_d) FROM rev)
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) hitting the quarter's max revenue (TPC-H Q15 shape).

    The scalar subquery (MAX over the revenue view) de-correlates to an
    unpartitioned max-rank window over the already-aggregated per-supplier
    frame — that frame is tiny (one row per supplier), so the single-
    partition window is safe at any corpus scale; the 100 TB lineitem scan
    happens exactly once. Revenue compares in DECIMAL so ties are exact."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).alias(
                "rev_d"
            )
        )
    )
    w = Window.orderBy(F.col("rev_d").desc())
    top = rev.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") == 1)
    return (
        sup.join(F.broadcast(top), sup.s_suppkey == top.l_suppkey)
        .select("s_suppkey", "s_name", F.round("rev_d", 2).cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# NOT IN — TPC-H Q16 shape (supplier exclusion)
# ---------------------------------------------------------------------------


@register(
    "brand_supplier_counts",
    oracle="""
    SELECT p.p_brand, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per brand, excluding flagged suppliers (Q16 shape).

    NOT IN de-correlates to a broadcast LEFT ANTI join (valid because
    s_suppkey is non-null; a nullable NOT IN list needs the null-aware
    variant, which Spark also plans as BroadcastNestedLoop when required).
    Both the part dim and the exclusion list broadcast — lineitem shuffles
    once, for the distinct-count agg."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery — TPC-H Q17 shape (small-quantity revenue)
# ---------------------------------------------------------------------------


@register(
    "small_qty_part_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of below-avg-quantity lineitems for one brand (Q17 shape).

    The correlated AVG de-correlates to one groupBy(l_partkey) aggregate
    joined back by key — computed once for ~200k parts instead of once per
    probing row. The threshold avg is carried as exact integer fractions
    (sum_qty, n): `qty < 0.2 * sum/n`  ⇔  `qty * n * 5 < sum` — integer
    compare, no float boundary to disagree on (l_quantity is integral).
    The oracle keeps the literal correlated form to prove equivalence."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("n_li"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.ap_partkey)
        .filter(F.col("l_quantity").cast("long") * F.col("n_li") * 5 < F.col("sum_qty"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# IN over a grouped HAVING subquery — TPC-H Q18 shape (large orders)
# ---------------------------------------------------------------------------


@register(
    "large_order_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 210
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers behind the largest orders (TPC-H Q18 shape).

    IN (grouped HAVING) de-correlates to: aggregate lineitem once, filter the
    aggregate, and inner-join it back — the filtered key set is small (~1% of
    orders), so it broadcasts and orders/customer never see a wide shuffle.
    The reused lineitem aggregate doubles as the output total_qty, so
    lineitem is scanned once and aggregated once."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 210)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Correlated scalar against the row's own group — above-average filter
# ---------------------------------------------------------------------------


@register(
    "nation_above_avg_customers",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS bal_above
    FROM (
      SELECT c_nationkey, c_acctbal,
             SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER (PARTITION BY c_nationkey) AS tot,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt
      FROM customer
    )
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) * cnt > tot
    GROUP BY c_nationkey
    """,
)
def nation_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: customers richer than their nation's average balance.

    The correlated `avg(...) WHERE same nation` becomes a window aggregate
    partitioned by the correlation key — one shuffle on c_nationkey, no join
    at all. The comparison is `bal * cnt > total` in exact DECIMAL, so a
    customer sitting exactly on the average resolves identically in both
    engines (a float avg could round either way)."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    dec = F.col("c_acctbal").cast("decimal(18,6)")
    return (
        cust.select(
            "c_nationkey",
            "c_acctbal",
            F.sum(dec).over(w).alias("tot"),
            F.count("*").over(w).alias("cnt"),
        )
        .filter(dec * F.col("cnt") > F.col("tot"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.sum(dec), 2).cast("double").alias("bal_above"),
        )
    )


# ---------------------------------------------------------------------------
# HAVING against a global scalar subquery
# ---------------------------------------------------------------------------


@register(
    "brands_above_global_avg_qty",
    oracle="""
    WITH g AS (
      SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS g_sum,
             CAST(COUNT(*) AS BIGINT) AS g_cnt
      FROM lineitem
    )
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS brand_qty,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) * (SELECT g_cnt FROM g)
           > (SELECT g_sum FROM g) * COUNT(*)
    """,
)
def brands_above_global_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brands whose average lineitem quantity beats the global average.

    HAVING-vs-scalar de-correlates to a 1-row global aggregate cross-joined
    (broadcast) onto the grouped frame; `sum*g_cnt > g_sum*cnt` keeps the
    avg comparison in exact integers. Lineitem is scanned twice here by
    design — fusing both aggregates into one pass (grouping sets) is the
    alternative when the scan dominates; at 100 TB the global row comes from
    table statistics anyway."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    g = li.agg(
        F.sum(F.col("l_quantity").cast("long")).alias("g_sum"),
        F.count("*").alias("g_cnt"),
    )
    per_brand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("brand_qty"),
            F.count("*").alias("n_items"),
        )
    )
    return (
        per_brand.crossJoin(F.broadcast(g))
        .filter(F.col("brand_qty") * F.col("g_cnt") > F.col("g_sum") * F.col("n_items"))
        .select("p_brand", "brand_qty", "n_items")
    )


# ---------------------------------------------------------------------------
# Classic filtered-aggregate shapes (TPC-H Q6 / Q10 / Q14 / Q19 analogs) —
# no subqueries, but they round out the OLAP surface: tight range predicates
# that must push to the scan, conditional aggregation, OR-of-ANDs predicates.
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS potential_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be recovered by dropping small-order discounts
    (TPC-H Q6 shape): every predicate is scan-pushable (year range, discount
    band, quantity cap), so the plan is scan -> partial agg -> one exchange
    of a single row. The classic 'filters must reach the parquet reader'
    benchmark query."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("potential_revenue")
        )
    )


@register(
    "returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue (TPC-H Q10 shape): the
    returnflag filter pushes to the lineitem scan, nation broadcasts, and
    the top-20 is TakeOrderedAndProject over the grouped frame. Revenue sums
    in exact decimal so the ORDER BY ... LIMIT cut is tie-stable across
    engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
                              ELSE CAST(0 AS DECIMAL(18,6)) END)
             / SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 6)
           AS DOUBLE) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01' AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue from promo parts (TPC-H Q14 shape):
    conditional aggregation — SUM(CASE WHEN) promo vs total in ONE pass
    (the reference computed label splits as two separate jobs, SURVEY A9).
    Both sums are exact decimal, so the ratio is reproducible."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6)
            .cast("double")
            .alias("promo_share_pct")
        )
    )


@register(
    "discounted_brand_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2)
           AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def discounted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate revenue (TPC-H Q19 shape): three disjunctive
    brand/size/quantity bands evaluated after a broadcast part join — the
    disjunction can't push below the join as-is, but Catalyst extracts the
    common p_size/l_quantity bounds into scan-level filters. The shape that
    tests complex-predicate handling."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return j.filter(band).agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — double-correlated EXISTS / NOT EXISTS: suppliers who
# were the ONLY late supplier in a multi-supplier order. De-correlated into
# one per-order aggregate (n distinct suppliers, n distinct LATE suppliers)
# joined back — two scans of the li×orders join collapse to one via the
# shared CTE; no correlated re-execution per supplier the way the textbook
# nested form implies.
# ---------------------------------------------------------------------------


@register(
    "late_sole_supplier_orders",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM li GROUP BY 1
    ),
    sole AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN per_order p ON li.l_orderkey = p.l_orderkey
      WHERE li.late AND p.n_supp >= 2 AND p.n_late_supp = 1
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def late_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: the EXISTS('another supplier in this order') AND NOT
    EXISTS('another LATE supplier') pair becomes one groupBy over the
    order's lines — count distinct suppliers and distinct late suppliers —
    then a filter on the joined-back counts. 'Late' is shipdate more than
    60 days after the order date (this corpus has no commit/receipt
    dates). Top-20 with a name tiebreak plans TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    # Per-order distinct-supplier counts as WINDOW aggregates, not a
    # groupBy + join-back: the join-back form re-executes the li><orders
    # lineage twice (PERF.md §2.2 pathology) and measured 2.49 s; the
    # window shares the join's l_orderkey partitioning — 0.92 s, identical
    # rows. collect_set skips nulls, so the when(late) set counts exactly
    # the DISTINCT late suppliers.
    w = Window.partitionBy("l_orderkey")
    flagged = lo.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    sole = (
        flagged.filter(
            F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )
