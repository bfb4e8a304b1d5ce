"""Structured Streaming tests: the streaming plan must equal batch semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.streaming.trending import (
    run_trending_stream,
    scored,
    windowed_engagement,
)


@pytest.fixture(scope="module")
def event_rows():
    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(60):
        ts = base.replace(minute=i % 30, second=(i * 7) % 60)
        rows.append((i, ts, i % 5, "view", float(10 + i)))
    return rows


def test_streaming_equals_batch(spark, tmp_path, event_rows):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch_df = spark.createDataFrame(event_rows, schema)
    src = str(tmp_path / "stream_src")
    batch_df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    stream_out = run_trending_stream(spark, stream, query_name="t_stream_eq_batch")
    batch_out = scored(windowed_engagement(batch_df))

    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    assert s == b
    assert len(s) > 0


def test_windowed_engagement_window_bounds(spark, event_rows):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    df = spark.createDataFrame(event_rows, schema)
    out = windowed_engagement(df).select(
        F.col("w.start").alias("s"), F.col("w.end").alias("e")
    ).distinct().collect()
    for r in out:
        delta = r["e"] - r["s"]
        assert delta.total_seconds() == 300  # 5-minute windows
        assert r["s"].minute % 5 == 0 and r["s"].second == 0  # aligned
