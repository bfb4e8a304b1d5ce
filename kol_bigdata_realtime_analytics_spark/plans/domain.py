"""Domain queries: the reference's scoring/windowing semantics on TESTDATA.

The flagship query (trending_scores) is the batch-shape of the reference's
streaming hot path (reference: streaming/spark_jobs/trending_stream.py:410-509):
parse events -> windowed engagement -> trending score -> ranked output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.functions.counts import (
    PARSE_COUNT_ORACLE_SQL,
    parse_count,
)
from kol_bigdata_realtime_analytics_spark.functions.scoring import (
    composite_score,
    kol_tier,
    trending_label,
    trending_raw,
    trending_score,
    trending_velocity,
    trust_rule_score,
)
from kol_bigdata_realtime_analytics_spark.plans.registry import (
    davg,
    dsum,
    dsum_raw,
    register,
    sql_davg,
    sql_dsum,
    sql_dsum_raw,
    table,
)

# ---------------------------------------------------------------------------
# F2 + R2 + T2 — FLAGSHIP: windowed engagement -> trending score -> ranking.
# Tumbling 5-minute windows per user (the streaming layer adds the 1-minute
# slide + stateful momentum; batch semantics here are oracle-checkable).
# All the score math is native Column expressions — zero Python UDFs.
# ---------------------------------------------------------------------------

_TRENDING_ORACLE = f"""
WITH win AS (
  SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start_us,
         user_id,
         COUNT(*) AS n_events,
         {sql_dsum_raw('value')} AS engagement
  FROM events
  GROUP BY 1, 2
), scored AS (
  SELECT window_start_us, user_id, n_events,
         ROUND(engagement, 2) AS engagement,
         (engagement / 5.0) * (1 + 0.1 * ln(1 + n_events)) AS velocity,
         0.5 * ((engagement / 5.0) * (1 + 0.1 * ln(1 + n_events)) / 100.0)
           + 0.3 * (n_events / 10.0) + 0.2 * 1.0 AS raw
  FROM win
)
SELECT window_start_us, user_id, n_events, engagement,
       ROUND(velocity, 6) AS velocity,
       ROUND(100.0 / (1 + exp(-0.8 * (raw - 2.0))), 6) AS trending_score,
       CASE WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 80 THEN 'Viral'
            WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 60 THEN 'Hot'
            WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 40 THEN 'Warm'
            WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 25 THEN 'Normal'
            ELSE 'Cold' END AS label
FROM scored
"""


@register("trending_scores", oracle=_TRENDING_ORACLE)
def trending_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-min windowed engagement per user -> native trending score."""
    ev = table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum_raw("value").alias("engagement_raw"))
    )
    vel = trending_velocity(F.col("engagement_raw"), F.col("n_events"))
    raw = trending_raw(vel, F.col("n_events"))
    score = trending_score(raw)
    return agg.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "user_id",
        "n_events",
        F.round("engagement_raw", 2).alias("engagement"),
        F.round(vel, 6).alias("velocity"),
        F.round(score, 6).alias("trending_score"),
        trending_label(score).alias("label"),
    )


# ---------------------------------------------------------------------------
# R2 — sliding-window aggregation (5 min / 1 min slide), batch shape of the
# reference's trending window (trending_stream.py:458-470). The oracle expands
# the slide by cross-joining each event to its 5 covering windows.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
SELECT (epoch_us(ts) // 60000000 - i.i) * 60000000            AS window_start_us,
       (epoch_us(ts) // 60000000 - i.i) * 60000000 + 300000000 AS window_end_us,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value,
       {sql_davg('value')} AS avg_value
FROM events, (SELECT unnest(range(0, 5)) AS i) i
GROUP BY 1, 2, 3
"""


@register("sliding_window_engagement", oracle=_SLIDING_ORACLE)
def sliding_window_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute windows sliding every 1 minute, keyed by event_type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            davg("value").alias("avg_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# R3 — tumbling-window campaign metrics with ratio edge cases
# (ref: features_stream.py:91-119 — CTR = clicks/impressions, CVR = conv/clicks)
# ---------------------------------------------------------------------------

_CAMPAIGN_ORACLE = f"""
SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start_us,
       user_id % 10 AS campaign_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) AS BIGINT) AS impressions,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conversions,
       {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS revenue,
       floor(CASE WHEN SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) > 0
             THEN CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE)
                  / SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
             ELSE 0.0 END * 1000000) / 1000000 AS ctr,
       floor(CASE WHEN SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
             THEN CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                  / SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             ELSE 0.0 END * 1000000) / 1000000 AS cvr
FROM events
GROUP BY 1, 2
"""


@register("campaign_window_metrics", oracle=_CAMPAIGN_ORACLE)
def campaign_window_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-min campaign funnel metrics with divide-by-zero guards."""
    ev = table(spark, sf_dir, "events")
    t = F.col("event_type")
    impressions = F.sum(F.when(t.isin("view", "click"), 1).otherwise(0)).cast("long")
    clicks = F.sum(F.when(t == "click", 1).otherwise(0)).cast("long")
    conversions = F.sum(F.when(t == "purchase", 1).otherwise(0)).cast("long")
    agg = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), (F.col("user_id") % 10).alias("campaign_id"))
        .agg(
            F.count("*").alias("n_events"),
            impressions.alias("impressions"),
            clicks.alias("clicks"),
            conversions.alias("conversions"),
            dsum(F.when(t == "purchase", F.col("value")).otherwise(0)).alias("revenue"),
        )
    )
    ctr = F.when(F.col("impressions") > 0, F.col("clicks").cast("double") / F.col("impressions")).otherwise(0.0)
    cvr = F.when(F.col("clicks") > 0, F.col("conversions").cast("double") / F.col("clicks")).otherwise(0.0)
    return agg.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "campaign_id",
        "n_events",
        "impressions",
        "clicks",
        "conversions",
        "revenue",
        # trunc, not round: integer-ratio quotients (e.g. 1/640 = 0.0015625)
        # terminate exactly on a 7th-digit 5, where ROUND ties cross-engine
        trunc6(ctr).alias("ctr"),
        trunc6(cvr).alias("cvr"),
    )


# ---------------------------------------------------------------------------
# F1 — parse_count as a NATIVE expression (the reference has 4 Python-UDF
# copies). Raw strings are constructed deterministically from integer columns
# so both engines build byte-identical inputs, then parsed independently.
# ---------------------------------------------------------------------------

_RAW_EXPR_SQL = """
CASE event_id % 6
  WHEN 0 THEN CAST(user_id AS VARCHAR) || '.' || CAST(event_id % 10 AS VARCHAR) || 'K'
  WHEN 1 THEN CAST(user_id AS VARCHAR) || '.' || CAST(event_id % 10 AS VARCHAR) || 'M'
  WHEN 2 THEN CAST(user_id AS VARCHAR) || 'B'
  WHEN 3 THEN CAST(user_id AS VARCHAR) || ',' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0')
  WHEN 4 THEN ''
  ELSE '  ' || CAST(user_id AS VARCHAR) || '.' || CAST(event_id % 10 AS VARCHAR) || 'k  '
END
"""

_PARSE_COUNT_ORACLE = f"""
SELECT event_id, raw, {PARSE_COUNT_ORACLE_SQL.format(col="raw")} AS parsed
FROM (SELECT event_id, {_RAW_EXPR_SQL} AS raw FROM events)
"""


@register("parse_count_events", oracle=_PARSE_COUNT_ORACLE)
def parse_count_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human-count parsing ("11.3K" -> 11300) as a codegen'd native expr."""
    ev = table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    d = (F.col("event_id") % 10).cast("string")
    raw = (
        F.when(F.col("event_id") % 6 == 0, F.concat(u, F.lit("."), d, F.lit("K")))
        .when(F.col("event_id") % 6 == 1, F.concat(u, F.lit("."), d, F.lit("M")))
        .when(F.col("event_id") % 6 == 2, F.concat(u, F.lit("B")))
        .when(
            F.col("event_id") % 6 == 3,
            F.concat(u, F.lit(","), F.lpad((F.col("event_id") % 1000).cast("string"), 3, "0")),
        )
        .when(F.col("event_id") % 6 == 4, F.lit(""))
        .otherwise(F.concat(F.lit("  "), u, F.lit("."), d, F.lit("k  ")))
    )
    return ev.select("event_id", raw.alias("raw")).withColumn("parsed", parse_count(F.col("raw")))


# ---------------------------------------------------------------------------
# Momentum (batch form): avg velocity of the previous <=3 windows per key —
# the piece the reference specifies (README.md:748-756) but stubs
# (trending_stream.py:479). Window-frame average, oracle-checkable.
# ---------------------------------------------------------------------------

_MOMENTUM_ORACLE = f"""
WITH win AS (
  SELECT (epoch_us(ts) // 300000000) * 300000 AS window_start_ms,
         user_id AS key,
         COUNT(*) AS n_events,
         {sql_dsum_raw('value')} AS engagement
  FROM events GROUP BY 1, 2
), vel AS (
  SELECT window_start_ms, key, n_events, engagement,
         (engagement / 5.0) * (1 + 0.1 * ln(1 + n_events)) AS velocity
  FROM win
), mom AS (
  SELECT *, COALESCE(AVG(velocity) OVER (
           PARTITION BY key ORDER BY window_start_ms
           RANGE BETWEEN 900000 PRECEDING AND 1 PRECEDING), 0.0) AS momentum
  FROM vel
)
SELECT window_start_ms, key, n_events,
       ROUND(engagement, 2) AS engagement,
       floor(velocity * 1000000) / 1000000 AS velocity,
       floor(momentum * 1000000) / 1000000 AS momentum,
       floor(100.0 / (1 + exp(-0.8 * (
         0.5 * (velocity / 100.0) + 0.3 * (n_events / 10.0)
         + 0.2 * (1.0 + momentum) - 2.0))) * 1000000) / 1000000 AS trending_score
FROM mom
"""


@register("trending_momentum", oracle=_MOMENTUM_ORACLE)
def trending_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed trending with REAL momentum (avg velocity over the previous
    3 window *slots* — RANGE frame, resets after idle gaps; see
    streaming/momentum.py for why that is the scale-correct definition)."""
    from kol_bigdata_realtime_analytics_spark.streaming.momentum import momentum_batch

    ev = table(spark, sf_dir, "events")
    out = momentum_batch(ev)
    return out.select(
        "window_start_ms",
        "key",
        "n_events",
        F.round("engagement", 2).alias("engagement"),
        trunc6(F.col("velocity")).alias("velocity"),
        trunc6(F.col("momentum")).alias("momentum"),
        trunc6(F.col("trending_score")).alias("trending_score"),
    )


# ---------------------------------------------------------------------------
# Rule trust score + tiering (ref: silver_to_gold.py:211-240) on synthetic
# profile fields derived deterministically from customer.
# ---------------------------------------------------------------------------

_TRUST_ORACLE = """
WITH prof AS (
  SELECT c_custkey,
         c_acctbal > 5000 AS verified,
         c_custkey % 3 != 0 AS has_img,
         c_custkey % 4000 AS age_days,
         c_acctbal / 1000.0 AS ff_ratio,
         CASE WHEN c_custkey % 5 = 0 THEN 0 WHEN c_custkey % 5 = 1 THEN 1 ELSE NULL END AS label,
         CAST(ROUND(GREATEST(c_acctbal, 0) * 1000) AS BIGINT) AS followers
  FROM customer
)
SELECT c_custkey,
       ROUND(GREATEST(LEAST(
         CASE WHEN verified THEN 20.0 ELSE 0.0 END
         + CASE WHEN has_img THEN 10.0 ELSE 0.0 END
         + LEAST(age_days / 365.0 * 20.0, 20.0)
         + LEAST(ff_ratio / 10.0 * 20.0, 20.0)
         + CASE WHEN label = 1 THEN 20.0 WHEN label = 0 THEN -30.0 ELSE 0.0 END,
         100.0), 0.0), 6) AS trust_score,
       CASE WHEN followers >= 1000000 THEN 'Mega'
            WHEN followers >= 100000 THEN 'Macro'
            WHEN followers >= 10000 THEN 'Micro'
            WHEN followers >= 1000 THEN 'Nano'
            ELSE 'Rising' END AS tier
FROM prof
"""


@register("trust_scores", oracle=_TRUST_ORACLE)
def trust_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based trust score (+20 verified, +10 img, age & ratio terms, label bonus, clamp 0-100)."""
    c = table(spark, sf_dir, "customer")
    prof = c.select(
        "c_custkey",
        (F.col("c_acctbal") > 5000).alias("verified"),
        (F.col("c_custkey") % 3 != 0).alias("has_img"),
        (F.col("c_custkey") % 4000).alias("age_days"),
        (F.col("c_acctbal") / 1000.0).alias("ff_ratio"),
        F.when(F.col("c_custkey") % 5 == 0, 0).when(F.col("c_custkey") % 5 == 1, 1).alias("label"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0)) * 1000, 0).cast("long").alias("followers"),
    )
    score = trust_rule_score("verified", "has_img", "age_days", "ff_ratio", label=F.col("label"))
    return prof.select(
        "c_custkey",
        F.round(score, 6).alias("trust_score"),
        kol_tier("followers").alias("tier"),
    )


# ---------------------------------------------------------------------------
# Composite score + per-user ranking (ref: scores.py:186 + dashboard stitch
# J5 re-expressed as ONE engine-side join-free aggregation + window rank)
# ---------------------------------------------------------------------------

_COMPOSITE_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         {sql_dsum_raw('value')} / COUNT(value) AS trending,
         LEAST(COUNT(*) / 10.0, 100.0) AS success,
         LEAST({sql_dsum_raw("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} / 10.0, 100.0) AS trust
  FROM events GROUP BY user_id
)
SELECT user_id,
       floor(trending * 1000000) / 1000000 AS trending,
       floor(success * 1000000) / 1000000 AS success,
       floor(trust * 1000000) / 1000000 AS trust,
       floor((0.4 * trending + 0.35 * success + 0.25 * trust) * 1000000) / 1000000 AS composite,
       CAST(ROW_NUMBER() OVER (
         ORDER BY floor((0.4 * trending + 0.35 * success + 0.25 * trust) * 1000000) / 1000000 DESC,
                  user_id ASC
       ) AS BIGINT) AS rank
FROM per_user
"""


@register("composite_leaderboard", oracle=_COMPOSITE_ORACLE)
def composite_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite 0.4/0.35/0.25 blend + global leaderboard rank (window fn).

    Outputs truncate (trunc6), not round: the decimal-exact inputs make the
    blend a clean rational that CAN land on an exact 7th-digit half-tie,
    where the engines' ROUND semantics disagree (caught live at sf0.1)."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (dsum_raw("value") / F.count("value")).alias("trending"),
        F.least(F.count("*") / 10.0, F.lit(100.0)).alias("success"),
        F.least(
            dsum_raw(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)) / 10.0,
            F.lit(100.0),
        ).alias("trust"),
    )
    comp = trunc6(composite_score("trending", "success", "trust"))
    w = Window.orderBy(comp.desc(), F.col("user_id").asc())
    return per_user.select(
        "user_id",
        trunc6(F.col("trending")).alias("trending"),
        trunc6(F.col("success")).alias("success"),
        trunc6(F.col("trust")).alias("trust"),
        comp.alias("composite"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Engineered-feature math (ref: feature_engineering.py:154-346 — log1p, sqrt,
# capping, ratios, interactions; representative subset, exact same fns)
# ---------------------------------------------------------------------------

# NOTE on float determinism: these are ROW-WISE computations — both engines
# see bit-identical input doubles and IEEE ops are deterministic, so
# truncation (floor(x*1e6)/1e6) is exactly reproducible. ROUND is not: at an
# exact decimal tie (e.g. 2091.14/64 = 32.6740625) Spark HALF_UPs the
# shortest decimal repr while DuckDB rounds the binary value — they disagree.
_FEATURES_ORACLE = """
SELECT c_custkey,
       floor(ln(1 + GREATEST(c_acctbal, 0)) * 1000000) / 1000000        AS log_bal,
       floor(sqrt(GREATEST(c_acctbal, 0)) * 1000000) / 1000000          AS sqrt_bal,
       floor(LEAST(GREATEST(c_acctbal, 0.0), 5000.0) * 1000000) / 1000000 AS bal_capped,
       floor(c_acctbal / (1.0 + c_custkey % 100) * 1000000) / 1000000   AS bal_per_unit,
       CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END                        AS is_delinquent,
       floor(ln(1 + GREATEST(c_acctbal, 0)) * sqrt(1.0 + c_custkey % 100) * 1000000) / 1000000 AS interaction
FROM customer
"""


def trunc6(col):
    """Deterministic 6-decimal truncation for row-wise float outputs."""
    return F.floor(col * 1000000) / 1000000


@register("engineered_features", oracle=_FEATURES_ORACLE)
def engineered_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log1p / sqrt / capping / ratio / indicator / interaction features."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    pos = F.greatest(bal, F.lit(0))
    unit = 1.0 + F.col("c_custkey") % 100
    return c.select(
        "c_custkey",
        trunc6(F.log1p(pos)).alias("log_bal"),
        trunc6(F.sqrt(pos)).alias("sqrt_bal"),
        trunc6(F.least(pos.cast("double"), F.lit(5000.0))).alias("bal_capped"),
        trunc6(bal / unit).alias("bal_per_unit"),
        F.when(bal < 0, 1).otherwise(0).alias("is_delinquent"),
        trunc6(F.log1p(pos) * F.sqrt(unit)).alias("interaction"),
    )


# ---------------------------------------------------------------------------
# Trending score V2 — the reference's batch rescoring job
# (models/trending/trending_score_v2.py:52-253): per-event exponential time
# decay (half-life 7 days from the corpus's latest event) x engagement
# log-weight (log(1+views/global_avg)/log(101), clamped to [0.1, 1.0]),
# summed per KOL into a weighted velocity, then the v1 blend
# (0.5 personal growth + 0.3 market position + 0.2 momentum-stub) and
# sigmoid squash. The reference iterates pandas rows on the driver; here
# both passes are native Column expressions: one scan computes the corpus
# globals (latest ts, truncated nonzero-mean of value, user/event counts,
# localCheckpoint'd — 1 row), a second scan applies the per-row weights and
# reduces per user. Two scans total at any scale; the 1-row globals ride
# along as broadcast (crossJoin) + constant groupBy keys — no second join.
# Determinism: per-row weights are floor'd at 6dp before the DECIMAL(18,6)
# sum (order-proof); pg/mp/raw are floor'd at 4dp (they are rationals —
# ROUND could tie); ln(1+x) is used verbatim on BOTH engines (log1p differs
# from ln(1+x) in the last ulp for non-integer x); the sigmoid reuses the
# hash-green v1 helpers. Deviations from the reference, pinned in the
# oracle: NULL value counts as zero views (pandas would propagate NaN), and
# int() truncation of the nonneg view sums is floor.
# ---------------------------------------------------------------------------

_V2_ORACLE = f"""
WITH g AS (
  SELECT MAX(epoch_us(ts)) AS ref_us,
         COALESCE({sql_davg('CASE WHEN value > 0 THEN value END')}, 10000.0) AS ga,
         COUNT(DISTINCT user_id) AS n_users,
         COUNT(*) AS n_ev
  FROM events
), t AS (
  SELECT user_id, value, n_users, n_ev,
         floor(exp(-(ln(2.0) / 7.0)
                   * greatest(0.0, (g.ref_us - epoch_us(ts)) / 86400000000.0))
               * (CASE WHEN COALESCE(value, 0.0) <= 0 THEN 0.1
                       ELSE 0.1 + 0.9 * least(ln(1.0 + value / g.ga) / ln(101.0), 1.0)
                  END) * 1000000) / 1000000 AS w
  FROM events, g
), u AS (
  SELECT user_id, n_users, n_ev,
         CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS cv,
         COUNT(*) AS n_events,
         {sql_dsum_raw('value')} AS vsum
  FROM t GROUP BY user_id, n_users, n_ev
), s AS (
  SELECT user_id, cv, n_events, vsum,
         cv / greatest(n_events / n_users, 0.1) AS pg,
         cv / greatest(n_ev / n_users, 0.1) AS mp,
         0.5 * (cv / greatest(n_events / n_users, 0.1))
           + 0.3 * (cv / greatest(n_ev / n_users, 0.1))
           + 0.2 * 1.0 AS raw
  FROM u
)
SELECT user_id,
       ROUND(100.0 / (1 + exp(-0.8 * (raw - 2.0))), 2) AS trending_score_v2,
       CASE WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 80 THEN 'Viral'
            WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 60 THEN 'Hot'
            WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 40 THEN 'Warm'
            WHEN 100.0 / (1 + exp(-0.8 * (raw - 2.0))) >= 25 THEN 'Normal'
            ELSE 'Cold' END AS label,
       floor(pg * 10000) / 10000 AS personal_growth,
       floor(mp * 10000) / 10000 AS market_position,
       floor(raw * 10000) / 10000 AS raw_score,
       n_events,
       CAST(floor(vsum) AS BIGINT) AS total_views,
       CAST(floor(vsum / n_events) AS BIGINT) AS avg_views
FROM s
"""


@register("trending_scores_v2", oracle=_V2_ORACLE)
def trending_scores_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference trending_score_v2 batch job, Spark-native (two scans, no UDF)."""
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    g = F.broadcast(
        ev.agg(
            F.max(F.unix_micros("ts")).alias("ref_us"),
            davg(F.when(v > 0, v)).alias("ga_raw"),
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_ev"),
        )
        .select(
            "ref_us",
            F.coalesce("ga_raw", F.lit(10000.0)).alias("ga"),
            "n_users",
            "n_ev",
        )
        .localCheckpoint(eager=True)
    )
    delta_days = F.greatest(
        F.lit(0.0), (F.col("ref_us") - F.unix_micros("ts")) / F.lit(86400000000.0)
    )
    time_w = F.exp(-(F.log(F.lit(2.0)) / F.lit(7.0)) * delta_days)
    eng_w = F.when(F.coalesce(v, F.lit(0.0)) <= 0, F.lit(0.1)).otherwise(
        F.lit(0.1)
        + F.lit(0.9)
        * F.least(F.log(F.lit(1.0) + v / F.col("ga")) / F.log(F.lit(101.0)), F.lit(1.0))
    )
    w = F.floor(time_w * eng_w * F.lit(1000000)) / F.lit(1000000)
    u = (
        ev.crossJoin(g)
        .select("user_id", "value", "n_users", "n_ev", w.alias("w"))
        .groupBy("user_id", "n_users", "n_ev")
        .agg(
            F.sum(F.col("w").cast("decimal(18,6)")).cast("double").alias("cv"),
            F.count(F.lit(1)).alias("n_events"),
            dsum_raw("value").alias("vsum"),
        )
    )
    pg = F.col("cv") / F.greatest(F.col("n_events") / F.col("n_users"), F.lit(0.1))
    mp = F.col("cv") / F.greatest(F.col("n_ev") / F.col("n_users"), F.lit(0.1))
    raw = F.lit(0.5) * pg + F.lit(0.3) * mp + F.lit(0.2) * F.lit(1.0)
    score = trending_score(raw)
    p4 = F.lit(10000)
    return u.select(
        "user_id",
        F.round(score, 2).alias("trending_score_v2"),
        trending_label(score).alias("label"),
        (F.floor(pg * p4) / p4).alias("personal_growth"),
        (F.floor(mp * p4) / p4).alias("market_position"),
        (F.floor(raw * p4) / p4).alias("raw_score"),
        "n_events",
        F.floor("vsum").alias("total_views"),
        F.floor(F.col("vsum") / F.col("n_events")).alias("avg_views"),
    )


# ---------------------------------------------------------------------------
# Rule-based success score — the reference's /predict/success fallback
# (serving/api/routers/predict.py:792-810): four capped contributions
# (views/50000*30, engagement_rate*300, est_ctr*200, engagement/5000*20)
# summed to 0-100, 'High' at >= 50. The reference scores one KOL per HTTP
# request from caller-supplied features; here the features derive per user
# from the events table using the repo's established event-type mapping
# (campaign_window_metrics): views = 'view' events, engagement = the
# interaction events (click/purchase/signup, the likes+comments+shares
# analog), est_ctr = clicks/max(views,1). One groupBy shuffle, no joins.
# Every input is an integer count, so eng_rate/est_ctr/score are exact
# rationals — floor at 2dp/6dp (ROUND could land on a cross-engine tie;
# the reference rounds, deviation pinned in the oracle).
# ---------------------------------------------------------------------------

_SUCCESS_RULE_ORACLE = """
WITH f AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
         CAST(SUM(CASE WHEN event_type IN ('click', 'purchase', 'signup') THEN 1 ELSE 0 END) AS BIGINT)
           AS engagement_total
  FROM events GROUP BY user_id
), s AS (
  SELECT user_id, views, engagement_total,
         engagement_total / greatest(views, 1) AS eng_rate,
         clicks / greatest(views, 1) AS est_ctr,
         least(30.0, views / 50000.0 * 30)
           + least(30.0, engagement_total / greatest(views, 1) * 300)
           + least(20.0, clicks / greatest(views, 1) * 200)
           + least(20.0, engagement_total / 5000.0 * 20) AS score
  FROM f
)
SELECT user_id,
       floor(score * 100) / 100 AS success_score,
       CASE WHEN score >= 50 THEN 'High' ELSE 'Not-High' END AS success_label,
       views,
       engagement_total,
       floor(eng_rate * 1000000) / 1000000 AS eng_rate,
       floor(est_ctr * 1000000) / 1000000 AS est_ctr
FROM s
"""


@register("success_scores_rule", oracle=_SUCCESS_RULE_ORACLE)
def success_scores_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference rule-based success score per KOL, fully native (one shuffle).

    On TESTDATA's count-parity event mix the two rate caps saturate
    (eng_rate/est_ctr > 1 for every driver-sf user), so success_label is
    uniformly 'High' at sf0.001-0.1 — the hash signal is the per-user
    success_score spread; both label branches are pinned in
    tests/test_functions.py::test_success_rule_label_both_branches."""
    ev = table(spark, sf_dir, "events")
    t = F.col("event_type")
    f = ev.groupBy("user_id").agg(
        F.sum(F.when(t == "view", 1).otherwise(0)).cast("long").alias("views"),
        F.sum(F.when(t == "click", 1).otherwise(0)).cast("long").alias("clicks"),
        F.sum(F.when(t.isin("click", "purchase", "signup"), 1).otherwise(0))
        .cast("long")
        .alias("engagement_total"),
    )
    vden = F.greatest(F.col("views"), F.lit(1))
    eng_rate = F.col("engagement_total") / vden
    est_ctr = F.col("clicks") / vden
    score = (
        F.least(F.lit(30.0), F.col("views") / F.lit(50000.0) * F.lit(30))
        + F.least(F.lit(30.0), eng_rate * F.lit(300))
        + F.least(F.lit(20.0), est_ctr * F.lit(200))
        + F.least(F.lit(20.0), F.col("engagement_total") / F.lit(5000.0) * F.lit(20))
    )
    return f.select(
        "user_id",
        (F.floor(score * 100) / 100).alias("success_score"),
        F.when(score >= 50, "High").otherwise("Not-High").alias("success_label"),
        "views",
        "engagement_total",
        trunc6(eng_rate).alias("eng_rate"),
        trunc6(est_ctr).alias("est_ctr"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution — U-shaped (position-based) credit assignment,
# the standard marketing-analytics model between last-touch (what
# stream_stream_click_attribution implements) and data-driven Shapley:
# for each conversion, the first and last preceding touch get 40% each
# and the middle touches split the remaining 20%.
# ---------------------------------------------------------------------------

_MTA_ORACLE = """
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT c.conv_id, e.event_id, e.event_type AS touch_type, e.ts
  FROM conv c JOIN events e ON e.user_id = c.user_id
  WHERE e.event_type IN ('view', 'click')
    AND e.ts < c.conv_ts AND e.ts >= c.conv_ts - INTERVAL 7 DAY
),
ranked AS (
  SELECT conv_id, event_id, touch_type,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY conv_id) AS k
  FROM touch
),
credited AS (
  SELECT touch_type,
         CASE WHEN rn = 1 THEN 'first'
              WHEN rn = k THEN 'last'
              ELSE 'middle' END AS position,
         CASE WHEN k = 1 THEN 1.0
              WHEN k = 2 THEN 0.5
              WHEN rn = 1 OR rn = k THEN 0.4
              ELSE 0.2 / (k - 2) END AS credit
  FROM ranked
)
SELECT touch_type, position,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       floor(CAST(SUM(CAST(credit AS DECIMAL(28,12))) AS DOUBLE) * 1000000)
         / 1000000 AS credit_t6
FROM credited
GROUP BY touch_type, position
ORDER BY touch_type, position
""".strip()


@register("multitouch_attribution_credits", oracle=_MTA_ORACLE)
def multitouch_attribution_credits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution over the event log: every purchase
    distributes 1.0 credit across its view/click touches in the preceding
    7 days — 40% to the first touch, 40% to the last, 20% split across the
    middle (k=1 takes all, k=2 splits 50/50). Output: credit mass and
    touch counts per (touch type, position) — the report that decides
    channel budgets. A single-touch conversion (~10% here) and k up to 17
    keep all three position classes live at every sf.

    Determinism: positions rank on (ts, event_id) — a total order; credits
    are IEEE-exact divisions of identical integers in both engines, summed
    in DECIMAL(28,12) (order-proof), trunc6 at the end.

    Scale shape: one equi-join touches⋈conversions on user_id (both sides
    pre-filtered by event type in the scan, pushed down) with the 7-day
    range as a post-join filter — per-user fan-out is bounded by user
    activity, the same shape as range_join_order_events; then one window
    over conv_id (conversion-sized partitions, ~5 touches each) and a
    6-group rollup. No broadcast needed: both sides are corpus-derived and
    shuffle on the same user_id key."""
    ev = table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_id", F.col("event_type").alias("touch_type"), "ts"
    )
    j = touch.join(conv, touch["user_id"] == conv["c_user"]).filter(
        (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w_rn = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    w_k = Window.partitionBy("conv_id")
    ranked = j.select(
        "conv_id",
        "touch_type",
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_k).alias("k"),
    )
    credited = ranked.select(
        "touch_type",
        F.when(F.col("rn") == 1, F.lit("first"))
        .when(F.col("rn") == F.col("k"), F.lit("last"))
        .otherwise(F.lit("middle"))
        .alias("position"),
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
        .alias("credit"),
    )
    return (
        credited.groupBy("touch_type", "position")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            trunc6(
                F.sum(F.col("credit").cast("decimal(28,12)")).cast("double")
            ).alias("credit_t6"),
        )
        .orderBy("touch_type", "position")
    )


# ---------------------------------------------------------------------------
# Shapley-value data-driven attribution — the game-theoretic upgrade over
# position rules (multitouch_attribution_credits): channels are players,
# a (user, day) journey's exposure set is a coalition, v(S) = conversion
# rate of journeys exposed to exactly S, and each channel's credit is its
# Shapley value over the 2^4 subset lattice. Exact combinatorial weights,
# set statistics from one aggregation — the computation after the rollup
# touches 16 lattice rows, never the corpus.
# ---------------------------------------------------------------------------

_SHAP_CHANNELS = ["click", "error", "signup", "view"]


def _shap_lattice() -> list[tuple[str, str, str, int, int]]:
    """(channel, set_with, set_without, w_num, w_den) for every channel c
    and S subset of N\\{c}: weight = |S|! (n-|S|-1)! / n! as an exact
    fraction. Canonical set id = comma-joined sorted channel names."""
    import itertools
    import math

    n = len(_SHAP_CHANNELS)
    rows = []
    for c in _SHAP_CHANNELS:
        rest = [x for x in _SHAP_CHANNELS if x != c]
        for r in range(len(rest) + 1):
            for s in itertools.combinations(rest, r):
                with_c = ",".join(sorted(s + (c,)))
                without = ",".join(sorted(s))
                rows.append(
                    (c, with_c, without, math.factorial(r) * math.factorial(n - r - 1), math.factorial(n))
                )
    return rows


_SHAP_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, ts,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
conv AS (
  SELECT user_id, day, MIN(ts) AS conv_ts FROM ev
  WHERE event_type = 'purchase' GROUP BY user_id, day
),
j AS (
  SELECT e.user_id, e.day,
         MAX(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END) AS converted,
         list_aggr(list_sort(list_distinct(list(e.event_type))), 'string_agg', ',')
           AS chset
  FROM ev e LEFT JOIN conv c ON e.user_id = c.user_id AND e.day = c.day
  WHERE e.event_type IN ('view', 'click', 'signup', 'error')
    AND (c.conv_ts IS NULL OR e.ts < c.conv_ts)
  GROUP BY e.user_id, e.day
),
stats AS (
  SELECT chset, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(converted) AS BIGINT) AS conv
  FROM j GROUP BY chset
),
lattice(channel, set_with, set_without, w_num, w_den) AS (
  VALUES {{values}}
),
terms AS (
  SELECT l.channel,
         (CAST(l.w_num AS DOUBLE) / l.w_den)
         * (COALESCE(CAST(sw.conv AS DOUBLE) / sw.n, 0.0)
            - COALESCE(CAST(so.conv AS DOUBLE) / so.n, 0.0)) AS term
  FROM lattice l
    LEFT JOIN stats sw ON sw.chset = l.set_with
    LEFT JOIN stats so ON so.chset = l.set_without
)
SELECT channel,
       floor(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE) * 1000000)
         / 1000000 AS shapley_t6
FROM terms GROUP BY channel ORDER BY channel
""".strip()


def _shap_oracle_sql() -> str:
    vals = ", ".join(
        f"('{c}', '{w}', '{wo}', {num}, {den})"
        for c, w, wo, num, den in _shap_lattice()
    )
    return _SHAP_ORACLE.format(values=vals)


@register("shapley_attribution", oracle=_shap_oracle_sql())
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value attribution over (user, day) journeys: v(S) = the
    conversion rate of journeys whose pre-conversion exposure set is
    exactly S (v of unobserved sets and the empty set = 0), credit per
    channel = the exact Shapley sum over the 16-subset lattice with
    s!(n-s-1)!/n! weights as exact fractions. On this corpus singles
    convert ~0.32 and larger coalitions ~0.15-0.20, so marginals are
    NEGATIVE for most additions — exactly the cannibalization signal
    position-based rules (multitouch_attribution_credits) cannot see.

    Determinism: v values are IEEE divisions of exact integers, weights
    are literal integer fractions, the 8 terms per channel sum in
    DECIMAL(28,12), trunc6 at the end.

    Scale shape: ONE corpus aggregation builds the per-(user,day) journey
    frame (equi-join to the same-keyed conversion frame), one rollup to
    <= 2^4 set-statistics rows; everything after is a 32-row literal
    lattice join. Channel count is the only exponential knob (2^n lattice)
    — at n ~ 15+ channels real systems switch to sampled-permutation
    Shapley, the documented escape."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("conv_ts"))
    )
    j = (
        ev.filter(F.col("event_type").isin(_SHAP_CHANNELS))
        .join(conv, ["user_id", "day"], "left")
        .filter(F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts")))
        .groupBy("user_id", "day")
        .agg(
            F.max(
                F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0)
            ).alias("converted"),
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
                "chset"
            ),
        )
    )
    stats = j.groupBy("chset").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    lattice = ev.sparkSession.createDataFrame(
        _shap_lattice(),
        "channel string, set_with string, set_without string, w_num long, w_den long",
    )
    sw = stats.select(
        F.col("chset").alias("set_with"),
        (F.col("conv").cast("double") / F.col("n")).alias("v_with"),
    )
    so = stats.select(
        F.col("chset").alias("set_without"),
        (F.col("conv").cast("double") / F.col("n")).alias("v_without"),
    )
    terms = (
        lattice.join(F.broadcast(sw), "set_with", "left")
        .join(F.broadcast(so), "set_without", "left")
        .select(
            "channel",
            (
                (F.col("w_num").cast("double") / F.col("w_den"))
                * (
                    F.coalesce("v_with", F.lit(0.0))
                    - F.coalesce("v_without", F.lit(0.0))
                )
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(
            (
                F.floor(
                    F.sum(F.col("term").cast("decimal(28,12)")).cast("double")
                    * 1e6
                )
                / 1e6
            ).alias("shapley_t6")
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (Anderl et al. 2014) — the third
# standard attribution model after position rules and Shapley: journeys
# are paths through a first-order Markov chain over channel states with
# absorbing 'conv'/'noconv' ends, and a channel's credit is proportional
# to how much the absorption probability into 'conv' DROPS when the
# channel's state is removed (transitions into it diverted to 'noconv').
# Unlike Shapley (set-based, order-blind), the chain sees touch ORDER.
# ---------------------------------------------------------------------------

_MK_CHANNELS = ["click", "error", "signup", "view"]
#: log2 matrix squarings: horizon 2^6 = 64 steps. Per-step absorption on
#: this grid leaves residual transient mass (1 - conv - noconv from
#: 'start') ~(0.7)^64 < 1e-9 — below trunc6 visibility, emitted as
#: residual_t6 so the horizon sufficiency is part of the hashed output.
_MK_SQUARINGS = 6


def _mk_transition_sql() -> str:
    """Shared CTE head: per-(user, day) pre-conversion journeys ordered by
    (ts, event_id), lead-derived transitions, integer count grid with
    per-source totals, the 5 variant grids (base + one per removed
    channel), and absorbing self-loops."""
    chans = ", ".join(f"'{c}'" for c in _MK_CHANNELS)
    removal_selects = []
    for c in _MK_CHANNELS:
        removal_selects.append(f"""
  SELECT '{c}' AS variant, src,
         CASE WHEN dst = '{c}' THEN 'noconv' ELSE dst END AS dst,
         CAST(SUM(cnt) AS BIGINT) AS cnt, MAX(tot) AS tot
  FROM grid WHERE src <> '{c}' GROUP BY 1, 2, 3""")
    variants = " UNION ALL ".join(
        ["SELECT 'base' AS variant, src, dst, cnt, tot FROM grid"]
        + removal_selects
    )
    loops = " UNION ALL ".join(
        f"SELECT '{v}', '{s}', '{s}', CAST(1 AS BIGINT), CAST(1 AS BIGINT)"
        for v in ["base"] + _MK_CHANNELS
        for s in ("conv", "noconv")
    )
    return f"""
ev AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
cv AS (
  SELECT user_id, day, MIN(ts) AS conv_ts FROM ev
  WHERE event_type = 'purchase' GROUP BY user_id, day
),
touch AS (
  SELECT e.user_id, e.day, e.event_type, e.ts, e.event_id,
         CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS converted
  FROM ev e LEFT JOIN cv c ON e.user_id = c.user_id AND e.day = c.day
  WHERE e.event_type IN ({chans})
    AND (c.conv_ts IS NULL OR e.ts < c.conv_ts)
),
seq AS (
  SELECT user_id, day, event_type, converted,
         ROW_NUMBER() OVER (PARTITION BY user_id, day
                            ORDER BY ts, event_id) AS rn,
         lead(event_type) OVER (PARTITION BY user_id, day
                                ORDER BY ts, event_id) AS nxt
  FROM touch
),
trans AS (
  SELECT 'start' AS src, event_type AS dst FROM seq WHERE rn = 1
  UNION ALL
  SELECT event_type, nxt FROM seq WHERE nxt IS NOT NULL
  UNION ALL
  SELECT event_type, CASE WHEN converted = 1 THEN 'conv' ELSE 'noconv' END
  FROM seq WHERE nxt IS NULL
),
counts AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM trans GROUP BY 1, 2
),
grid AS MATERIALIZED (
  SELECT src, dst, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY src) AS BIGINT) AS tot
  FROM counts
),
vgrid AS MATERIALIZED (
  SELECT * FROM ({variants} UNION ALL {loops}) t(variant, src, dst, cnt, tot)
),
m0 AS MATERIALIZED (
  SELECT variant, src, dst, CAST(cnt AS DOUBLE) / tot AS p FROM vgrid
)"""


def _mk_oracle_sql() -> str:
    parts = ["WITH " + _mk_transition_sql().lstrip()]
    for k in range(1, _MK_SQUARINGS + 1):
        parts.append(f""",
m{k} AS MATERIALIZED (
  SELECT a.variant, a.src, b.dst,
         CAST(SUM(CAST(a.p * b.p AS DECIMAL(28,12))) AS DOUBLE) AS p
  FROM m{k - 1} a JOIN m{k - 1} b
    ON a.variant = b.variant AND a.dst = b.src
  GROUP BY 1, 2, 3
)""")
    mm = f"m{_MK_SQUARINGS}"
    parts.append(f""",
absorb AS (
  SELECT variant,
         COALESCE(MAX(CASE WHEN dst = 'conv' THEN p END), 0.0) AS p_conv,
         COALESCE(MAX(CASE WHEN dst = 'noconv' THEN p END), 0.0) AS p_null
  FROM {mm} WHERE src = 'start' GROUP BY variant
),
base AS (SELECT p_conv AS pb FROM absorb WHERE variant = 'base'),
eff AS (
  SELECT a.variant AS channel, a.p_conv, a.p_null, base.pb,
         1.0 - a.p_conv / NULLIF(base.pb, 0) AS effect
  FROM absorb a, base WHERE a.variant <> 'base'
),
tot_eff AS (
  SELECT CAST(SUM(CAST(effect AS DECIMAL(28,12))) AS DOUBLE) AS te FROM eff
)
SELECT channel,
       floor(pb * 1000000) / 1000000 AS p_conv_base_t6,
       floor(p_conv * 1000000) / 1000000 AS p_conv_removed_t6,
       floor(effect * 1000000) / 1000000 AS removal_effect_t6,
       floor(effect / NULLIF(te, 0) * 1000000) / 1000000 AS credit_t6,
       floor((1.0 - p_conv - p_null) * 1000000) / 1000000 AS residual_t6
FROM eff, tot_eff
ORDER BY channel""")
    return "".join(parts).strip()


def _mk_absorb_rows(
    cells: list[tuple[str, str, int]],
) -> list[tuple[str, float, float]]:
    """Driver-side twin of the former Spark variant-expansion + squaring
    subplan, float-semantics-exact: from the collected transition cells
    (src, dst, cnt) it builds the per-source totals, the 5 variant grids
    (base + one per removed channel, in-edges of the removed state
    diverted to 'noconv'), absorbing conv/noconv self-loops, then runs
    _MK_SQUARINGS matrix squarings where each new entry is the
    DECIMAL(28,12) sum over mids of the double product pa*pb — the
    quantization replicates Spark's Cast(double -> decimal) route
    (BigDecimal.valueOf = shortest decimal repr, then HALF_UP to scale
    12; Python's repr is the same shortest round-trip string), decimal
    addition at fixed scale is exact so summation order cannot matter,
    and float(Decimal) is the same correctly-rounded decimal->double as
    BigDecimal.doubleValue. Returns [(variant, p_conv, p_null)] sorted
    by variant. Grid size is channel-bounded ((n+3)^2 cells x 5
    variants), never corpus-sized — the Shapley 32-row-lattice
    discipline."""
    from decimal import ROUND_HALF_UP, Decimal

    tot: dict[str, int] = {}
    for src, _dst, cnt in cells:
        tot[src] = tot.get(src, 0) + cnt
    grids: dict[str, dict[tuple[str, str], float]] = {}
    q12 = Decimal("1e-12")

    def _p(cnt: int, t: int) -> float:
        return float(cnt) / float(t)

    grids["base"] = {(s, d): _p(c, tot[s]) for s, d, c in cells}
    for ch in _MK_CHANNELS:
        agg: dict[tuple[str, str], int] = {}
        for s, d, c in cells:
            if s == ch:
                continue
            key = (s, "noconv" if d == ch else d)
            agg[key] = agg.get(key, 0) + c
        grids[ch] = {k: _p(c, tot[k[0]]) for k, c in agg.items()}
    for g in grids.values():
        g[("conv", "conv")] = 1.0
        g[("noconv", "noconv")] = 1.0
    for _ in range(_MK_SQUARINGS):
        for v, g in grids.items():
            by_src: dict[str, list[tuple[str, float]]] = {}
            for (s, d), p in g.items():
                by_src.setdefault(s, []).append((d, p))
            nxt: dict[tuple[str, str], Decimal] = {}
            for (a_src, mid), pa in g.items():
                for b_dst, pb in by_src.get(mid, ()):
                    term = Decimal(repr(pa * pb)).quantize(q12, ROUND_HALF_UP)
                    key = (a_src, b_dst)
                    nxt[key] = nxt.get(key, Decimal(0)) + term
            grids[v] = {k: float(s) for k, s in nxt.items()}
    return [
        (
            v,
            grids[v].get(("start", "conv"), 0.0),
            grids[v].get(("start", "noconv"), 0.0),
        )
        for v in sorted(grids)
    ]


@register("markov_removal_attribution", oracle=_mk_oracle_sql())
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: first-order chain over channel
    states ('start' -> touches ordered by (ts, event_id) -> absorbing
    'conv'/'noconv'), transition probabilities = exact integer count
    ratios from ONE corpus pass. Per channel, the chain is re-run with
    that state removed (in-edges diverted to 'noconv', out-edges dropped)
    and credit is proportional to 1 - P_removed(conv)/P(conv). Absorption
    probabilities come from 6 matrix SQUARINGS (horizon 2^6 = 64 steps;
    the transient residual mass is emitted as residual_t6, hashing the
    horizon-sufficiency evidence). Order-sensitivity is what this model
    adds over shapley_attribution's set-based view: at sf0.01 the two
    models' normalized credit shares differ by >5 points on several
    channels (Shapley concentrates on error/click, the chain is
    near-uniform), and removal effects are nonnegative by construction
    where Shapley marginals can go negative — both pinned in pytest
    (test_markov_credits_diverge_from_shapley).

    Determinism: grid entries are exact integer (cnt, tot) pairs until
    ONE IEEE division; every squaring sums its products in
    DECIMAL(28,12) (order-proof); outputs trunc6.

    Scale shape: one corpus window pass (lead over (user, day) journeys)
    + one grid aggregation; everything after runs DRIVER-SIDE on the
    collected <=49-cells-per-variant grid x 5 variants (_mk_absorb_rows
    — the Shapley 32-row-lattice discipline). Channel count bounds the
    grid quadratically (~(n+3)^2 cells), not the corpus; squaring count
    grows log2(horizon)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    )
    cv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touch = (
        ev.filter(F.col("event_type").isin(_MK_CHANNELS))
        .join(cv, ["user_id", "day"], "left")
        .filter(F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts")))
        .select(
            "user_id",
            "day",
            "event_type",
            "ts",
            "event_id",
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("converted"),
        )
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = touch.select(
        "event_type",
        "converted",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("rn") == 1)
        .select(F.lit("start").alias("src"), F.col("event_type").alias("dst"))
        .unionByName(
            seq.filter(F.col("nxt").isNotNull()).select(
                F.col("event_type").alias("src"), F.col("nxt").alias("dst")
            )
        )
        .unionByName(
            seq.filter(F.col("nxt").isNull()).select(
                F.col("event_type").alias("src"),
                F.when(F.col("converted") == 1, F.lit("conv"))
                .otherwise(F.lit("noconv"))
                .alias("dst"),
            )
        )
    )
    counts = trans.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    # ONE corpus job ends here: the transition-count grid is channel-bounded
    # (~(n_channels+3)^2 cells, corpus-size-INDEPENDENT), so the variant
    # expansion + 6 matrix squarings run driver-side on the collected cells
    # (r11 opt, guide §5: 6 squarings as Spark join+agg+localCheckpoint
    # rounds cost 8 scheduled jobs of pure overhead on <=245 rows — measured
    # 11.6 s -> ~1.6 s warm with bit-identical output). _mk_absorb_rows
    # mirrors the former Spark plan's float semantics exactly: IEEE cnt/tot
    # division, double products quantized to DECIMAL(28,12) HALF_UP (the
    # Double.toString shortest-repr route BigDecimal.valueOf takes), exact
    # decimal sums, correctly-rounded decimal->double.
    cells = [
        (r["src"], r["dst"], int(r["cnt"]))
        for r in counts.collect()  # bounded: <=(len(_MK_CHANNELS)+3)^2 rows
    ]
    # the lift/credit arithmetic is 4 rows of scalar float math — finished
    # driver-side with the same float-semantics discipline (trunc6 is
    # floor(x*1e6)/1e6 on doubles; the credit denominator is the exact
    # DECIMAL(28,12) sum of the HALF_UP-quantized effects, matching the
    # former Spark plan's decimal-sum cast bit-for-bit)
    from decimal import ROUND_HALF_UP, Decimal
    from math import floor as _floor

    def _t6(x: float | None) -> float | None:
        return None if x is None else _floor(x * 1000000) / 1000000

    absorb = _mk_absorb_rows(cells)
    pb = next(p_conv for v, p_conv, _ in absorb if v == "base")
    chans = [(v, pc, pn) for v, pc, pn in absorb if v != "base"]
    effects = {
        v: (1.0 - pc / pb) if pb != 0 else None for v, pc, _ in chans
    }
    q12 = Decimal("1e-12")
    terms = [
        Decimal(repr(e)).quantize(q12, ROUND_HALF_UP)
        for e in effects.values()
        if e is not None
    ]
    te = float(sum(terms)) if terms else None
    out_rows = [
        (
            v,
            _t6(pb),
            _t6(pc),
            _t6(effects[v]),
            _t6(effects[v] / te)
            if te is not None and te != 0 and effects[v] is not None
            else None,
            _t6(1.0 - pc - pn),
        )
        for v, pc, pn in sorted(chans)
    ]
    return spark.createDataFrame(
        out_rows,
        "channel string, p_conv_base_t6 double, p_conv_removed_t6 double, "
        "removal_effect_t6 double, credit_t6 double, residual_t6 double",
    )
