"""Streaming queries registered for the driver.

These run a REAL Structured Streaming query (readStream over the parquet dir,
memory sink, processAllAvailable) and return the materialized result — so the
driver's oracle check validates streaming semantics end-to-end, not just the
batch plan. Complete output mode means the bounded replay emits every window
(watermark only gates state eviction), making results == batch semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.plans.registry import (
    events_stream_source,
    register,
    table,
)
from kol_bigdata_realtime_analytics_spark.streaming.trending import run_trending_stream

_STREAM_TRENDING_ORACLE = """
WITH win AS (
  SELECT (epoch_us(ts) // 300000000) * 300000000 AS ws_us,
         user_id AS key,
         COUNT(*) AS n_events,
         SUM(value) AS eng
  FROM events
  GROUP BY 1, 2
)
SELECT ws_us AS window_start_us, key, n_events,
       ROUND(eng, 2) AS engagement,
       ROUND((eng / 5.0) * (1 + 0.1 * ln(1 + n_events)), 6) AS velocity,
       ROUND(100.0 / (1 + exp(-0.8 * (
         0.5 * ((eng / 5.0) * (1 + 0.1 * ln(1 + n_events)) / 100.0)
         + 0.3 * (n_events / 10.0) + 0.2 - 2.0))), 6) AS trending_score
FROM win
"""


_EVENT_SCORE_ORACLE = """
SELECT event_id, user_id,
       floor(100.0 / (1 + exp(-0.8 * (value / 100.0 - 2.0))) * 1000000) / 1000000 AS event_score,
       CASE WHEN 100.0 / (1 + exp(-0.8 * (value / 100.0 - 2.0))) >= 80 THEN 'Viral'
            WHEN 100.0 / (1 + exp(-0.8 * (value / 100.0 - 2.0))) >= 60 THEN 'Hot'
            WHEN 100.0 / (1 + exp(-0.8 * (value / 100.0 - 2.0))) >= 40 THEN 'Warm'
            WHEN 100.0 / (1 + exp(-0.8 * (value / 100.0 - 2.0))) >= 25 THEN 'Normal'
            ELSE 'Cold' END AS label
FROM events
"""


@register("streaming_event_scores", oracle=_EVENT_SCORE_ORACLE)
def streaming_event_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event APPEND-mode scoring (R4 append path: hot_path_scoring's
    stateless shape, model inline as a native expr instead of per-row HTTP).
    No aggregation -> no watermark/state; each event scores exactly once."""
    from kol_bigdata_realtime_analytics_spark.functions.scoring import trending_label
    from kol_bigdata_realtime_analytics_spark.plans.domain import trunc6

    for q in spark.streams.active:
        if q.name == "event_scores_mem":
            q.stop()
    stream = events_stream_source(spark, sf_dir)
    score = F.lit(100.0) / (F.lit(1.0) + F.exp(-0.8 * (F.col("value") / 100.0 - 2.0)))
    out = stream.select(
        "event_id",
        "user_id",
        trunc6(score).alias("event_score"),
        trending_label(score).alias("label"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("event_scores_mem")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("event_scores_mem")


@register("streaming_momentum_stateful", oracle=None)
def streaming_momentum_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stateful streaming momentum (applyInPandasWithState, event-time
    timeouts, O(1) state/key). Non-SQL-expressible -> rows-only driver check;
    pytest proves stream == batch (tests/test_momentum.py), and the batch
    form is oracle-checked as `trending_momentum`."""
    from kol_bigdata_realtime_analytics_spark.streaming.momentum import momentum_stream

    for q in spark.streams.active:
        if q.name == "mom_state_mem":
            q.stop()
    stream = events_stream_source(spark, sf_dir)
    q = (
        momentum_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mom_state_mem")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("mom_state_mem")


_MOMENTUM_EQUIV_ORACLE = """
WITH win AS (
  SELECT user_id, (epoch_ms(ts) // 300000) * 300000 AS ws_ms
  FROM events GROUP BY 1, 2
),
wm AS (SELECT MAX(epoch_ms(ts)) - 300000 AS w FROM events),
closed AS (SELECT ws_ms FROM win, wm WHERE ws_ms + 300000 <= wm.w)
SELECT CAST((SELECT COUNT(*) FROM closed) AS BIGINT) AS n_stream_rows,
       CAST((SELECT COUNT(*) FROM closed) AS BIGINT) AS n_batch_closed_rows,
       TRUE AS stream_equals_batch
""".strip()


@register("momentum_stream_batch_equiv_check", oracle=_MOMENTUM_EQUIV_ORACLE)
def momentum_stream_batch_equiv_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable stream==batch equivalence for the stateful momentum
    operator (r6 verdict ask #1): runs the REAL applyInPandasWithState
    stream into a memory sink, re-derives the batch window-function form
    over the same events, and reduces the comparison to one hash-checkable
    row — the invariant-companion pattern that certified the ANN/sketch
    family (plans/invariants.py).

    Emission rule being certified: the stream emits exactly the windows the
    final watermark closed — ws + W <= wm where wm = max(event ts in ms)
    - 5 min (Spark truncates event time to ms before the max; the oracle's
    epoch_ms does the same) — and every emitted row's (n_events,
    engagement, velocity, momentum, trending_score) matches the batch
    form's. Floats compare at rel 1e-9 (the stream folds in Python floats,
    the batch in decimal-exact sums cast to double — same tolerance the
    pytest equivalence uses), so the booleans are deterministic; the
    oracle re-derives both row counts from the closed-window rule and
    states the match as TRUE. A state-machine regression (wrong closing,
    dropped window, drifted momentum frame) flips a count or the boolean
    -> hash mismatch -> red driver row.
    """
    from kol_bigdata_realtime_analytics_spark.streaming.momentum import (
        momentum_batch,
        momentum_stream,
    )

    ev = table(spark, sf_dir, "events")
    stream = events_stream_source(spark, sf_dir)
    _run_to_memory(momentum_stream(stream), "mom_equiv_mem")
    stream_df = spark.table("mom_equiv_mem")
    # batch ground truth, filtered to the windows the final watermark closed
    wm = ev.agg((F.unix_millis(F.max("ts")) - F.lit(300_000)).alias("wm_ms"))
    closed = (
        momentum_batch(ev)
        .crossJoin(F.broadcast(wm))
        .filter(F.col("window_start_ms") + 300_000 <= F.col("wm_ms"))
        .drop("wm_ms")
    )
    j = stream_df.alias("s").join(
        closed.alias("b"), ["key", "window_start_ms"], "full"
    )

    def _close(col: str) -> F.Column:
        return F.abs(F.col(f"s.{col}") - F.col(f"b.{col}")) <= F.lit(1e-9) * F.greatest(
            F.abs(F.col(f"b.{col}")), F.lit(1.0)
        )

    row_ok = (
        F.col("s.n_events").isNotNull()
        & F.col("b.n_events").isNotNull()
        & (F.col("s.n_events") == F.col("b.n_events"))
        & _close("engagement")
        & _close("velocity")
        & _close("momentum")
        & _close("trending_score")
    )
    return j.agg(
        F.sum(F.when(F.col("s.n_events").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_stream_rows"),
        F.sum(F.when(F.col("b.n_events").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_batch_closed_rows"),
        F.min(row_ok).alias("stream_equals_batch"),
    )


@register("streaming_trending", oracle=_STREAM_TRENDING_ORACLE)
def streaming_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming run of the trending hot path."""
    stream = events_stream_source(spark, sf_dir, maxFilesPerTrigger="1")
    result = run_trending_stream(spark, stream, query_name="streaming_trending_mem")
    return result.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "key",
        "n_events",
        "engagement",
        "velocity",
        "trending_score",
    )


_ATTRIBUTION_ORACLE = """
WITH v AS (SELECT user_id, ts AS l_ts FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id, ts AS r_ts FROM events WHERE event_type = 'click'),
     pairs AS (
       SELECT v.user_id, epoch_us(c.r_ts) - epoch_us(v.l_ts) AS gap_us
       FROM v JOIN c ON v.user_id = c.user_id
        AND c.r_ts > v.l_ts AND c.r_ts <= v.l_ts + INTERVAL 2 HOUR
     )
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_attributed,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM pairs GROUP BY user_id
"""


def _run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> None:
    """Run a (bounded) stream to a memory sink. state_partitions: for
    stateful sketch streams whose key domain is a LITERAL small set
    (event_type ~6 values, bucket = N_BUCKETS), the state shuffle gets
    that many partitions instead of the session default — sized by KEY
    CARDINALITY, not cluster cores, so the setting is right at any scale
    (32+ state-store partitions for 6 keys pays per-partition store
    commit/fsync overhead for empty partitions every micro-batch;
    measured 2.9 s -> 1.9 s on streaming_quantile_sketch, interleaved
    A/B, results identical — integer state folds are partition-count-
    invariant). The streaming query fixes the value at START, so the
    conf is restored immediately after."""
    spark = df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    old_parts = None
    if state_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    q.processAllAvailable()
    q.stop()


def _require_single_file_replay(sf_dir: str, plan_name: str) -> None:
    """Shared precondition for every oracle that re-derives watermark /
    single-micro-batch semantics: the replay must be ONE source file (a
    multi-batch replay changes cross-batch eviction/dedup timing).
    Explicit raise, not assert — the contract must hold under python -O."""
    import glob as _glob

    src_files = _glob.glob(f"{sf_dir}/events.parquet")
    if len(src_files) != 1:
        raise ValueError(
            f"{plan_name} assumes a single-file, single-micro-batch replay; "
            f"found {len(src_files)} source files"
        )


def _view_click_streams(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The (views, clicks) stream pair every interval-join plan starts
    from: one readStream, filtered per side, ts aliased to the join-side
    column names interval_join expects."""
    stream = events_stream_source(spark, sf_dir)
    views = stream.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts")
    )
    return views, clicks


@register("stream_stream_click_attribution", oracle=_ATTRIBUTION_ORACLE)
def stream_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join (click attribution): views and clicks
    are two watermarked streams equi-joined on user_id with a 2-hour
    event-time interval; pair rows append to the sink, then one batch agg
    summarizes per user. State on both sides is watermark-bounded — the
    100 TB/day-safe join shape (vs the reference's Redis lookup hack,
    kafka_profile_stream.py:153-161)."""
    from kol_bigdata_realtime_analytics_spark.streaming.joins import attribution_pairs

    events = events_stream_source(spark, sf_dir)
    _run_to_memory(attribution_pairs(events, max_gap="2 hours"), "ss_attr_mem")
    return (
        spark.table("ss_attr_mem")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_attributed"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


_STREAM_DEDUP_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_unique_users
FROM events GROUP BY event_type
"""


@register("streaming_dedup_events", oracle=_STREAM_DEDUP_ORACLE)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming dedup via dropDuplicatesWithinWatermark keyed on
    (user_id, event_type): at-least-once re-deliveries collapse to one row
    per key with watermark-bounded state (a plain dropDuplicates would hold
    state forever). Survivor-row choice is arbitrary, so the checked output
    is the per-type survivor COUNT — deterministic and SQL-oracle-able.

    Oracle scope: the operator only guarantees dedup of duplicates arriving
    within the 10-minute watermark horizon; the exact COUNT(DISTINCT) oracle
    additionally relies on the replay being a SINGLE micro-batch (one source
    file, no maxFilesPerTrigger), during which the watermark is still at
    epoch so every recurrence collapses. The guard below pins that
    assumption — a multi-file sf_dir would legitimately emit extra
    survivors and must not silently flip this check to flaky."""
    from kol_bigdata_realtime_analytics_spark.streaming.joins import dedup_within_watermark

    _require_single_file_replay(sf_dir, "streaming_dedup_events")
    events = events_stream_source(spark, sf_dir)
    deduped = dedup_within_watermark(events, ["user_id", "event_type"], watermark="10 minutes")
    _run_to_memory(deduped, "ss_dedup_mem")
    return (
        spark.table("ss_dedup_mem")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique_users"))
    )


_STREAM_STATIC_ORACLE = """
SELECT e.event_id, e.user_id, c.c_mktsegment AS segment, n.n_name AS nation,
       e.event_type, e.value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
""".strip()


@register("stream_static_enrichment", oracle=_STREAM_STATIC_ORACLE)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against static customer
    and nation dimensions (the kafka->dim-enrich shape of the reference's
    features_stream, minus the Cassandra hop).

    The static side is re-read per micro-batch by Spark, so a broadcast hint
    keeps every batch's join shuffle-free — at 1000 executors this is THE
    difference between a per-batch 2-way shuffle and a map-side hash join.
    Stateless inner join -> append mode, no watermark/state, each event
    emitted exactly once; results equal the batch join, which is what the
    oracle checks.
    """
    for q in spark.streams.active:
        if q.name == "stream_static_mem":
            q.stop()
    stream = events_stream_source(spark, sf_dir)
    dims = F.broadcast(
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
        )
    )
    out = stream.join(dims, "user_id").select(
        "event_id", "user_id", "segment", "nation", "event_type", "value"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_static_mem")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("stream_static_mem")


_STREAM_OHLC_ORACLE = """
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // 900000000) * 900000000 AS bucket_start_us,
         value,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
  FROM events
)
SELECT event_type, bucket_start_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       arg_min(value, ord) AS open,
       arg_max(value, ord) AS close,
       MAX(value) AS high,
       MIN(value) AS low
FROM e GROUP BY 1, 2
""".strip()


@register("streaming_ohlc", oracle=_STREAM_OHLC_ORACLE)
def streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling as a REAL watermarked streaming aggregation — the
    same min_by/max_by single-agg shape as the batch `ohlc_events_15min`,
    run through readStream + complete mode so the driver's oracle validates
    that streaming first/last semantics equal the batch ones (bounded
    replay emits every window; the watermark only gates state eviction).
    min_by/max_by carry 2 candidate rows per partial in the state store —
    O(1) state per (type, window) key at any event rate.
    """
    for q in spark.streams.active:
        if q.name == "stream_ohlc_mem":
            q.stop()
    stream = events_stream_source(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    ord_key = F.concat(
        F.lpad(us.cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    out = (
        stream.withWatermark("ts", "30 minutes")
        .select(
            "event_type",
            F.window("ts", "15 minutes").alias("w"),
            F.col("value"),
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "w")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("min_by(value, ord)").alias("open"),
            F.expr("max_by(value, ord)").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("w.start")).alias("bucket_start_us"),
            "n_events",
            "open",
            "close",
            "high",
            "low",
        )
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_ohlc_mem")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("stream_ohlc_mem")


# ---------------------------------------------------------------------------
# Streaming SESSION windows — the state shape tumbling/sliding windows
# can't express: window extents are DATA-DRIVEN (merge while gap < 5 min),
# so the state store must merge adjacent sessions as late rows arrive.
# Same semantics as the batch `session_window_native`; the shared oracle
# certifies stream == batch session assembly end-to-end.
# ---------------------------------------------------------------------------

_STREAM_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 300000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS seq
  FROM gaps
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) + 300000000 AS session_end_us,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, seq
""".strip()


@register("streaming_sessions", oracle=_STREAM_SESSION_ORACLE)
def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming session windows: session_window(ts, '5 minutes') per
    user over readStream, complete-mode memory sink (bounded replay emits
    every session; a production deployment runs append mode + watermark so
    closed sessions emit incrementally and state evicts). The session
    store MERGES windows when an event bridges two provisional sessions —
    the semantics the oracle's gaps-and-islands SQL re-derives."""
    for q in spark.streams.active:
        if q.name == "stream_sessions_mem":
            q.stop()
    stream = events_stream_source(spark, sf_dir)
    out = (
        stream.groupBy(
            "user_id", F.session_window("ts", "5 minutes").alias("sw")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
        )
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sessions_mem")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("stream_sessions_mem")


# ---------------------------------------------------------------------------
# Streaming LEFT OUTER interval join — the hardest stream-stream shape:
# NULL-padded results can only emit once the global watermark proves the
# other side closed. The streaming counterpart of the batch
# `unattributed_views`: views that never got a click within the gap.
# ---------------------------------------------------------------------------

_STREAM_UNATTR_ORACLE = """
WITH v AS (SELECT user_id, ts AS l_ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS r_ts FROM events WHERE event_type = 'click'),
wm AS (SELECT CASE WHEN (SELECT MAX(l_ts) FROM v) IS NULL
                     OR (SELECT MAX(r_ts) FROM c) IS NULL THEN NULL
              ELSE LEAST((SELECT MAX(l_ts) FROM v) - INTERVAL 10 MINUTE,
                         (SELECT MAX(r_ts) FROM c) - INTERVAL 20 MINUTE) END AS w),
unmatched AS (
  SELECT v.user_id, v.l_ts FROM v, wm
  WHERE v.l_ts + INTERVAL 10 MINUTE < wm.w
    AND NOT EXISTS (SELECT 1 FROM c
                    WHERE c.user_id = v.user_id
                      AND c.r_ts > v.l_ts
                      AND c.r_ts <= v.l_ts + INTERVAL 10 MINUTE)
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_unattributed,
       CAST(epoch_us(MIN(l_ts)) AS BIGINT) AS first_view_us,
       CAST(epoch_us(MAX(l_ts)) AS BIGINT) AS last_view_us
FROM unmatched GROUP BY user_id
""".strip()


@register("streaming_unattributed_views", oracle=_STREAM_UNATTR_ORACLE)
def streaming_unattributed_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming LEFT OUTER interval join (view LEFT JOIN click within
    10 minutes, per user): the NULL-padded side — views provably
    unattributed — emits only when the GLOBAL watermark (min of the view
    watermark at 10 min and the click watermark at 20 min) passes
    view_ts + gap, i.e. Spark can prove no matching click can still
    arrive. The oracle re-derives exactly that emission rule: NOT EXISTS
    within the gap AND view_ts + gap < min(max(view_ts) - 10 min,
    max(click_ts) - 20 min) — views closer to the stream's end stay in
    state and correctly never emit in a bounded replay. This is the
    semantics a batch anti-join cannot express and the hardest
    stream-stream state shape (eviction-driven emission, not
    match-driven). Aggregated per user for a stable compact result.

    If EITHER side is empty, that side's watermark never leaves epoch, the
    global watermark stays at epoch, and NO null-padded row ever emits —
    the oracle's wm CTE goes NULL in that case so both engines return zero
    rows (plain LEAST would ignore the NULL side and diverge). The oracle
    also assumes a single-file, single-micro-batch replay (same class as
    streaming_dedup_events): with multiple batches a view could be evicted
    before a cross-batch click arrives — asserted, not assumed.
    """
    from kol_bigdata_realtime_analytics_spark.streaming.joins import interval_join

    _require_single_file_replay(sf_dir, "streaming_unattributed_views")
    views, clicks = _view_click_streams(spark, sf_dir)
    j = interval_join(
        views,
        clicks,
        key="user_id",
        max_gap="10 minutes",
        left_watermark="10 minutes",
        right_watermark="20 minutes",
        how="leftOuter",
    )
    nulls = j.filter(F.col("r.r_ts").isNull()).select(
        F.col("l.user_id").alias("user_id"),
        F.unix_micros(F.col("l.l_ts")).alias("view_us"),
    )
    _run_to_memory(nulls, "stream_unattr_mem")
    return (
        spark.table("stream_unattr_mem")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_unattributed"),
            F.min("view_us").alias("first_view_us"),
            F.max("view_us").alias("last_view_us"),
        )
    )


_STREAM_SEMI_ORACLE = """
WITH v AS (SELECT user_id, ts AS l_ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS r_ts FROM events WHERE event_type = 'click')
SELECT v.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_attributed_views,
       CAST(epoch_us(MIN(v.l_ts)) AS BIGINT) AS first_view_us,
       CAST(epoch_us(MAX(v.l_ts)) AS BIGINT) AS last_view_us
FROM v
WHERE EXISTS (SELECT 1 FROM c
              WHERE c.user_id = v.user_id
                AND c.r_ts > v.l_ts
                AND c.r_ts <= v.l_ts + INTERVAL 10 MINUTE)
GROUP BY v.user_id
""".strip()


@register("streaming_attributed_views_semi", oracle=_STREAM_SEMI_ORACLE)
def streaming_attributed_views_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming LEFT SEMI interval join — the existence-only shape
    (views that DID get a click within 10 minutes, each view emitted at
    most once with no click columns, so a multi-click view never
    duplicates). Completes the stream-stream join family: inner
    (click_attribution), leftOuter (unattributed_views), fullOuter
    (unmatched_both_sides), semi. Match-driven emission means no
    watermark-closure gate in the oracle: a plain EXISTS within the gap is
    the exact row set for a bounded replay (matches land in the same
    micro-batch; the single-file assert below keeps cross-batch eviction
    out of the picture, as in the outer variants)."""
    from kol_bigdata_realtime_analytics_spark.streaming.joins import interval_join

    _require_single_file_replay(sf_dir, "streaming_attributed_views_semi")
    views, clicks = _view_click_streams(spark, sf_dir)
    j = interval_join(
        views,
        clicks,
        key="user_id",
        max_gap="10 minutes",
        left_watermark="10 minutes",
        right_watermark="20 minutes",
        how="leftSemi",
    )
    out = j.select(
        F.col("user_id"), F.unix_micros(F.col("l_ts")).alias("view_us")
    )
    _run_to_memory(out, "stream_semi_mem")
    return (
        spark.table("stream_semi_mem")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_attributed_views"),
            F.min("view_us").alias("first_view_us"),
            F.max("view_us").alias("last_view_us"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming FULL OUTER interval join — both sides' NULL-padded rows, each
# gated by its own state-eviction rule under the shared global watermark:
# a view's NULL row needs the watermark past view_ts + gap (no click can
# still match), a click's needs it past click_ts (no view with an earlier
# ts can still arrive). The remaining outer shape after r6's leftOuter.
# ---------------------------------------------------------------------------

_STREAM_FULL_OUTER_ORACLE = """
WITH v AS (SELECT user_id, ts AS l_ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS r_ts FROM events WHERE event_type = 'click'),
wm AS (SELECT CASE WHEN (SELECT MAX(l_ts) FROM v) IS NULL
                     OR (SELECT MAX(r_ts) FROM c) IS NULL THEN NULL
              ELSE LEAST((SELECT MAX(l_ts) FROM v) - INTERVAL 10 MINUTE,
                         (SELECT MAX(r_ts) FROM c) - INTERVAL 20 MINUTE) END AS w),
uv AS (
  SELECT 'view' AS side, v.user_id, epoch_us(v.l_ts) AS ts_us FROM v, wm
  WHERE v.l_ts + INTERVAL 10 MINUTE < wm.w
    AND NOT EXISTS (SELECT 1 FROM c
                    WHERE c.user_id = v.user_id
                      AND c.r_ts > v.l_ts
                      AND c.r_ts <= v.l_ts + INTERVAL 10 MINUTE)
),
uc AS (
  SELECT 'click' AS side, c.user_id, epoch_us(c.r_ts) AS ts_us FROM c, wm
  WHERE c.r_ts < wm.w
    AND NOT EXISTS (SELECT 1 FROM v
                    WHERE v.user_id = c.user_id
                      AND v.l_ts < c.r_ts
                      AND v.l_ts >= c.r_ts - INTERVAL 10 MINUTE)
)
SELECT side, user_id,
       CAST(COUNT(*) AS BIGINT) AS n_unmatched,
       CAST(MIN(ts_us) AS BIGINT) AS first_us,
       CAST(MAX(ts_us) AS BIGINT) AS last_us
FROM (SELECT * FROM uv UNION ALL SELECT * FROM uc)
GROUP BY side, user_id
""".strip()


@register("streaming_unmatched_both_sides", oracle=_STREAM_FULL_OUTER_ORACLE)
def streaming_unmatched_both_sides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming FULL OUTER interval join (view vs click within 10
    minutes per user, view watermark 10 min / click watermark 20 min):
    NULL-padded rows emit from BOTH sides, each when the GLOBAL watermark
    (min of the two) proves that side's state entry can never match —

    - an unmatched VIEW once wm passes view_ts + gap (the leftOuter rule
      `streaming_unattributed_views` certified in r6: no click in
      (view_ts, view_ts + gap] can still arrive), and
    - an unmatched CLICK once wm passes click_ts (a click joins views with
      view_ts in [click_ts - gap, click_ts); any such view would now be
      later than the watermark allows).

    The oracle re-derives the union of both closure rules: each side's
    NOT-EXISTS-match filter gated by its own eviction inequality under the
    shared wm = min(max(view_ts) - 10 min, max(click_ts) - 20 min), NULL
    (zero rows) when either side is empty — same emptiness semantics as
    the leftOuter oracle. Aggregated per (side, user) for a stable compact
    result. Single-file, single-micro-batch replay asserted (multi-batch
    replay changes cross-batch eviction timing, as in the leftOuter case).
    """
    from kol_bigdata_realtime_analytics_spark.streaming.joins import interval_join

    _require_single_file_replay(sf_dir, "streaming_unmatched_both_sides")
    views, clicks = _view_click_streams(spark, sf_dir)
    j = interval_join(
        views,
        clicks,
        key="user_id",
        max_gap="10 minutes",
        left_watermark="10 minutes",
        right_watermark="20 minutes",
        how="fullOuter",
    )
    unmatched = j.filter(
        F.col("r.r_ts").isNull() | F.col("l.l_ts").isNull()
    ).select(
        F.when(F.col("r.r_ts").isNull(), F.lit("view"))
        .otherwise(F.lit("click"))
        .alias("side"),
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        F.unix_micros(F.coalesce(F.col("l.l_ts"), F.col("r.r_ts"))).alias("ts_us"),
    )
    _run_to_memory(unmatched, "stream_full_outer_mem")
    return (
        spark.table("stream_full_outer_mem")
        .groupBy("side", "user_id")
        .agg(
            F.count("*").alias("n_unmatched"),
            F.min("ts_us").alias("first_us"),
            F.max("ts_us").alias("last_us"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters — bounded-state Misra-Gries via stateful shards.
# ---------------------------------------------------------------------------

_SHH_K = 8
_SHH_BUCKETS = 8


def _shh_keyed(df: DataFrame) -> DataFrame:
    """Same in-plan hot-key derivation as heavy_hitters_hotkeys (user_id
    % 7 -> -1) so genuine heavy keys exist over uniform TESTDATA."""
    return df.select(
        F.when(F.col("user_id") % 7 == 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("hot_key")
    )


def _shh_run(spark: SparkSession, sf_dir: str, mem_name: str) -> DataFrame:
    from kol_bigdata_realtime_analytics_spark.streaming.heavy_hitters import (
        mg_heavy_hitters_stream,
    )

    _require_single_file_replay(sf_dir, "streaming_heavy_hitters")
    stream = _shh_keyed(events_stream_source(spark, sf_dir))
    _run_to_memory(
        mg_heavy_hitters_stream(stream, k=_SHH_K, n_buckets=_SHH_BUCKETS),
        mem_name,
        output_mode="update",
        state_partitions=_SHH_BUCKETS,  # literal key domain: the 8 MG shards
    )
    return spark.table(mem_name)


@register("streaming_heavy_hitters", oracle=None)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Misra-Gries candidates: per hash bucket, the <= 8 weighted
    counters a bounded-state stream summary retains (streaming/
    heavy_hitters.py — total state O(buckets * k) at any stream length).
    The candidate SET depends on Arrow chunk boundaries (MG merge order),
    so this is rows-only by design; streaming_heavy_hitters_check is the
    hash-exact companion certifying the properties that hold under ANY
    chunking (no heavy key missed, state bound respected)."""
    return _shh_run(spark, sf_dir, "shh_mem").orderBy("bucket", "candidate_key")


_SHH_CHECK_ORACLE = f"""
WITH keyed AS (
  SELECT CASE WHEN user_id % 7 = 0 THEN -1 ELSE user_id END AS hot_key
  FROM events
),
b AS (SELECT hot_key, ((hot_key % {_SHH_BUCKETS}) + {_SHH_BUCKETS}) % {_SHH_BUCKETS} AS bucket FROM keyed),
c AS (SELECT bucket, hot_key, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
nb AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS n_b FROM c GROUP BY 1),
heavy AS (
  SELECT c.bucket, c.hot_key FROM c JOIN nb USING (bucket)
  WHERE c.cnt * {_SHH_K + 1} > nb.n_b
)
SELECT CAST((SELECT COUNT(*) FROM heavy) AS BIGINT) AS n_true_heavy,
       CAST(0 AS BIGINT) AS n_missed,
       TRUE AS state_bound_ok
""".strip()


@register("streaming_heavy_hitters_check", oracle=_SHH_CHECK_ORACLE)
def streaming_heavy_hitters_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-exact companion for streaming_heavy_hitters (the invariant-
    companion pattern): runs the REAL stateful stream, then certifies the
    two properties Misra-Gries guarantees under ANY Arrow chunking —
    (1) every key whose in-bucket count exceeds n_bucket/(k+1) IS in the
    emitted candidate set (n_missed = 0: a broken eviction that drops a
    frequent key flips the hash), and (2) the emitted state never exceeds
    buckets*k counters (state_bound_ok). The oracle re-derives the exact
    per-bucket heavy set in SQL and states the guarantees."""
    cand = _shh_run(spark, sf_dir, "shh_check_mem")
    keyed = _shh_keyed(table(spark, sf_dir, "events"))
    c = keyed.groupBy(
        F.pmod(F.col("hot_key"), F.lit(_SHH_BUCKETS)).cast("long").alias("bucket"),
        "hot_key",
    ).agg(F.count("*").alias("cnt"))
    nb = c.groupBy("bucket").agg(F.sum("cnt").alias("n_b"))
    heavy = (
        c.join(nb, "bucket")
        .filter(F.col("cnt") * (_SHH_K + 1) > F.col("n_b"))
        .select("bucket", "hot_key")
    )
    missed = heavy.join(
        cand.select("bucket", F.col("candidate_key").alias("hot_key")),
        ["bucket", "hot_key"],
        "left_anti",
    )
    n_heavy = heavy.agg(F.count("*").cast("long").alias("n_true_heavy"))
    n_missed = missed.agg(F.count("*").cast("long").alias("n_missed"))
    bound = cand.agg(
        (F.count("*") <= _SHH_BUCKETS * _SHH_K).alias("state_bound_ok")
    )
    return n_heavy.crossJoin(n_missed).crossJoin(bound)


# ---------------------------------------------------------------------------
# Streaming approximate distinct count — bounded-state HLL registers in
# applyInPandasWithState (streaming/approx_distinct.py). The register
# array is a max-fold of a deterministic hash (associative, commutative,
# idempotent), so unlike the Misra-Gries candidate set the STREAMING
# output itself is bit-deterministic under any chunking and gets a full
# hash oracle: DuckDB re-derives the identical registers from the same
# integer hash.
# ---------------------------------------------------------------------------


def _sad_oracle_registers() -> str:
    from kol_bigdata_realtime_analytics_spark.streaming.approx_distinct import (
        M_REGISTERS,
        N_BUCKETS,
        hash_sql,
    )

    reg_sql, rho_sql = hash_sql("user_id")
    return f"""
u AS (SELECT DISTINCT user_id FROM events),
spine AS (
  SELECT b.bucket, r.reg_idx
  FROM (SELECT unnest(range(0, {N_BUCKETS})) AS bucket) b,
       (SELECT unnest(range(0, {M_REGISTERS})) AS reg_idx) r
),
hr AS (
  SELECT ((user_id % {N_BUCKETS}) + {N_BUCKETS}) % {N_BUCKETS} AS bucket,
         {reg_sql} AS reg_idx, {rho_sql} AS rho
  FROM u
),
regs AS (
  SELECT s.bucket, s.reg_idx,
         CAST(COALESCE(MAX(hr.rho), 0) AS BIGINT) AS rho_max
  FROM spine s LEFT JOIN hr ON hr.bucket = s.bucket AND hr.reg_idx = s.reg_idx
  GROUP BY s.bucket, s.reg_idx
)"""


def _sad_run(spark: SparkSession, sf_dir: str, mem_name: str) -> DataFrame:
    from kol_bigdata_realtime_analytics_spark.streaming.approx_distinct import (
        N_BUCKETS,
        approx_distinct_stream,
    )

    _require_single_file_replay(sf_dir, "streaming_approx_distinct")
    keyed = events_stream_source(spark, sf_dir).select(
        F.col("user_id").alias("sketch_key")
    )
    _run_to_memory(
        approx_distinct_stream(keyed),
        mem_name,
        output_mode="update",
        state_partitions=N_BUCKETS,  # literal key domain: the 4 sketch shards
    )
    return spark.table(mem_name)


@register(
    "streaming_approx_distinct",
    oracle=f"""
    WITH {_sad_oracle_registers().lstrip()}
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(reg_idx AS BIGINT) AS reg_idx,
           rho_max
    FROM regs ORDER BY bucket, reg_idx
    """,
)
def streaming_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL bounded-state streaming distinct-count sketch: per key shard,
    the 16 HLL max-rank registers the applyInPandasWithState operator
    holds (total state O(4*16) longs at ANY stream length). Max-folding a
    deterministic hash is chunking-invariant (pinned by a Hypothesis
    property test), so this STREAMING query is hash-green directly — the
    oracle recomputes the registers from the same 32-bit hash, which
    DuckDB, Spark exprs, and the Python state fn each derive bit-for-bit
    (cross-checked in pytest)."""
    return _sad_run(spark, sf_dir, "sad_mem").orderBy("bucket", "reg_idx")


def _sad_check_oracle() -> str:
    from kol_bigdata_realtime_analytics_spark.streaming.approx_distinct import (
        M_REGISTERS,
        N_BUCKETS,
    )

    m = M_REGISTERS
    return f"""
    WITH {_sad_oracle_registers().lstrip()},
    per_bucket AS (
      SELECT bucket,
             CAST(SUM(CAST(power(2.0, -rho_max) AS DECIMAL(38,30))) AS DOUBLE)
               AS s,
             COUNT_IF(rho_max = 0) AS v
      FROM regs GROUP BY bucket
    ),
    est AS (
      SELECT bucket,
             CASE WHEN (0.673 * {m * m} / s) <= {2.5 * m} AND v > 0
                  THEN {m} * ln({m} / CAST(v AS DOUBLE))
                  ELSE 0.673 * {m * m} / s END AS e
      FROM per_bucket
    ),
    tot AS (
      SELECT CAST(SUM(CAST(e AS DECIMAL(28,12))) AS DOUBLE) AS est_total
      FROM est
    ),
    exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM u)
    SELECT CAST({N_BUCKETS} AS BIGINT) AS n_buckets,
           exact.exact_distinct,
           floor(tot.est_total * 1000000) / 1000000 AS estimate_t6,
           floor(ABS(tot.est_total - exact.exact_distinct)
                 / exact.exact_distinct * 1000000) / 1000000 AS rel_err_t6
    FROM tot, exact
    """


@register("streaming_approx_distinct_check", oracle=_sad_check_oracle())
def streaming_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy certificate for the streaming sketch: fold the STREAMED
    registers into the standard HLL estimate (harmonic mean, alpha_16 =
    0.673, linear-counting correction in the sparse regime) and put the
    estimate AND the exact distinct count under one hash — measured rel
    err 0.14 / 0.17 / 0.06 at sf0.001/0.01/0.1 with 64 longs of state.
    Every float step is an IEEE op on identical inputs (2^-rho is exact in
    DECIMAL(38,30) for rho <= 29; bucket estimates sum via decimal)."""
    from kol_bigdata_realtime_analytics_spark.streaming.approx_distinct import (
        M_REGISTERS,
        N_BUCKETS,
    )

    m = M_REGISTERS
    regs = _sad_run(spark, sf_dir, "sad_check_mem")
    per_bucket = regs.groupBy("bucket").agg(
        F.sum(
            F.pow(F.lit(2.0), -F.col("rho_max")).cast("decimal(38,30)")
        ).cast("double").alias("s"),
        F.sum(F.when(F.col("rho_max") == 0, 1).otherwise(0)).alias("v"),
    )
    raw = F.lit(0.673) * F.lit(m * m) / F.col("s")
    est = per_bucket.select(
        F.when(
            (raw <= F.lit(2.5 * m)) & (F.col("v") > 0),
            F.lit(m) * F.log(F.lit(m) / F.col("v").cast("double")),
        ).otherwise(raw).alias("e")
    )
    tot = est.agg(
        F.sum(F.col("e").cast("decimal(28,12)")).cast("double").alias("est_total")
    )
    exact = (
        table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return (
        tot.crossJoin(F.broadcast(exact))
        .select(
            F.lit(N_BUCKETS).cast("long").alias("n_buckets"),
            "exact_distinct",
            (F.floor(F.col("est_total") * 1e6) / 1e6).alias("estimate_t6"),
            (
                F.floor(
                    F.abs(F.col("est_total") - F.col("exact_distinct"))
                    / F.col("exact_distinct")
                    * 1e6
                )
                / 1e6
            ).alias("rel_err_t6"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming quantiles with bounded state — fixed 256-bin histogram per
# event_type in applyInPandasWithState (streaming/quantiles.py). The fold
# is pure integer addition (associative, commutative), so like the HLL
# registers — and unlike the Misra-Gries candidate set — the streamed
# state is bit-identical under any chunking and the STREAMING query gets
# a FULL hash oracle: DuckDB re-derives the identical bin counts.
# ---------------------------------------------------------------------------


def _sq_oracle_hist() -> str:
    from kol_bigdata_realtime_analytics_spark.streaming.quantiles import bin_sql

    return f"""
hist AS MATERIALIZED (
  SELECT event_type, {bin_sql("value")} AS bin_idx,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)"""


def _sq_run(spark: SparkSession, sf_dir: str, mem_name: str) -> DataFrame:
    from kol_bigdata_realtime_analytics_spark.streaming.quantiles import (
        bin_col,
        quantile_stream,
    )

    _require_single_file_replay(sf_dir, "streaming_quantile_sketch")
    binned = events_stream_source(spark, sf_dir).select(
        "event_type", bin_col(F.col("value")).alias("bin_idx")
    )
    _run_to_memory(
        quantile_stream(binned),
        mem_name,
        output_mode="update",
        state_partitions=8,  # key domain = event_type (~6 literal values)
    )
    return spark.table(mem_name)


@register(
    "streaming_quantile_sketch",
    oracle=f"""
    WITH {_sq_oracle_hist().lstrip()}
    SELECT event_type, bin_idx, cnt FROM hist ORDER BY event_type, bin_idx
    """,
)
def streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL bounded-state streaming quantile sketch: per event_type, the
    nonzero cells of the fixed 256-bin value histogram the
    applyInPandasWithState operator holds (state O(256) longs per key at
    ANY stream length; literal [0, $1024) domain in integer cents —
    adaptive bounds would make state order-dependent). Integer count
    folding is chunking-invariant (Hypothesis-pinned), so this STREAMING
    query is hash-green directly against a DuckDB oracle that re-derives
    the same bins via the ROUND(x*100) cents idiom
    distributed_kth_element certified."""
    return _sq_run(spark, sf_dir, "sq_mem").orderBy("event_type", "bin_idx")


#: (label, numerator, denominator): discrete quantile k = ceil(q * n),
#: computed as exact integer (q_num*n + q_den - 1) // q_den
_SQ_QUANTILES = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]


def _sq_check_oracle() -> str:
    from kol_bigdata_realtime_analytics_spark.streaming.quantiles import (
        BIN_WIDTH,
        LO_CENTS,
    )

    q_rows = ", ".join(f"('{lb}', {n}, {d})" for lb, n, d in _SQ_QUANTILES)
    return f"""
    WITH {_sq_oracle_hist().lstrip()},
    qs(q_label, q_num, q_den) AS (VALUES {q_rows}),
    n AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
    ks AS (
      SELECT n.event_type, qs.q_label, n.n,
             (qs.q_num * n.n + qs.q_den - 1) // qs.q_den AS k
      FROM n, qs
    ),
    cum AS (
      SELECT event_type, bin_idx,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin_idx) AS cum
      FROM hist
    ),
    est AS (
      SELECT ks.event_type, ks.q_label, ks.n, ks.k,
             {LO_CENTS} + MIN(cum.bin_idx) * {BIN_WIDTH} AS est_cents
      FROM ks JOIN cum ON cum.event_type = ks.event_type AND cum.cum >= ks.k
      GROUP BY 1, 2, 3, 4
    ),
    vals AS (
      SELECT event_type,
             CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(ROUND(CAST(value AS DOUBLE) * 100)
                                              AS BIGINT)) AS rn
      FROM events
    ),
    exact AS (
      SELECT e.event_type, e.q_label, e.n, e.k, e.est_cents,
             v.cents AS exact_cents
      FROM est e JOIN vals v ON v.event_type = e.event_type AND v.rn = e.k
    )
    SELECT event_type, q_label, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           CAST(est_cents AS BIGINT) AS est_cents,
           exact_cents,
           CAST({BIN_WIDTH} AS BIGINT) AS bin_width_cents,
           (exact_cents >= est_cents AND exact_cents < est_cents + {BIN_WIDTH})
             AS within_bound
    FROM exact ORDER BY event_type, q_label
    """


@register("streaming_quantile_check", oracle=_sq_check_oracle())
def streaming_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound certificate for the streaming quantile sketch: per
    (event_type, quantile in {p50, p90, p99}), the histogram estimate
    (lower edge of the bin where the cumulative count crosses k =
    ceil(q*n), exact integer k) AND the exact k-th smallest value, under
    one hash — with within_bound certifying the defining histogram
    guarantee est <= exact < est + bin_width (the k-th element lies in
    the bin the estimate names). Every quantity is integer cents; the
    exact leg is the definitional ORDER BY/row_number form, fine at this
    harness scale — at 100 TB the exact leg is what
    distributed_kth_element replaces with histogram refinement."""
    from kol_bigdata_realtime_analytics_spark.streaming.quantiles import (
        BIN_WIDTH,
        LO_CENTS,
    )
    from pyspark.sql import Window

    hist = _sq_run(spark, sf_dir, "sq_check_mem").localCheckpoint(eager=True)
    qs = spark.createDataFrame(
        _SQ_QUANTILES, "q_label string, q_num long, q_den long"
    )
    n = hist.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n"))
    ks = n.crossJoin(F.broadcast(qs)).select(
        "event_type",
        "q_label",
        "n",
        (
            (F.col("q_num") * F.col("n") + F.col("q_den") - 1) / F.col("q_den")
        )
        .cast("long")
        .alias("k"),
    )
    cum = hist.select(
        "event_type",
        "bin_idx",
        F.sum("cnt")
        .over(Window.partitionBy("event_type").orderBy("bin_idx"))
        .alias("cum"),
    )
    est = (
        ks.join(cum, "event_type")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("event_type", "q_label", "n", "k")
        .agg(
            (F.lit(LO_CENTS) + F.min("bin_idx") * F.lit(BIN_WIDTH)).alias(
                "est_cents"
            )
        )
    )
    vals = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value").cast("double") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    ranked = vals.select(
        "event_type", "cents", F.row_number().over(w).alias("rn")
    )
    exact = est.join(
        ranked,
        (est["event_type"] == ranked["event_type"]) & (F.col("rn") == F.col("k")),
    ).select(
        est["event_type"],
        "q_label",
        "n",
        "k",
        "est_cents",
        F.col("cents").alias("exact_cents"),
    )
    return exact.select(
        "event_type",
        "q_label",
        "n",
        "k",
        F.col("est_cents").cast("long").alias("est_cents"),
        "exact_cents",
        F.lit(BIN_WIDTH).cast("long").alias("bin_width_cents"),
        (
            (F.col("exact_cents") >= F.col("est_cents"))
            & (F.col("exact_cents") < F.col("est_cents") + F.lit(BIN_WIDTH))
        ).alias("within_bound"),
    ).orderBy("event_type", "q_label")
