#!/usr/bin/env python
"""Measured scale-up check: do the headline plans scale near-linearly?

Replicates the sf0.1 FACT tables (events, lineitem, documents) K times —
ids shifted per replica, document text tagged so exact-dedup structure is
preserved rather than inflated — into .scratch/sf_scaled/, copies the dim
tables as-is, then times a representative query per operator family at
both scales and prints wall-ratio / K. A ratio near 1.0 means the plan's
cost is linear in data volume at fixed parallelism (the property that
survives a 1000-executor scale-out); >> 1.0 means something super-linear
(pair fan-out, per-key quadratic window, driver bottleneck) crept in.

Usage: python scripts/scale_check.py [K] [query ...]   (default K=8)
Results recorded in PERF.md §6.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kol_bigdata_realtime_analytics_spark.plans import REGISTRY  # noqa: E402
from kol_bigdata_realtime_analytics_spark.plans.registry import table  # noqa: E402
from kol_bigdata_realtime_analytics_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALED = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf_scaled")

#: one representative per family: streaming-shape window agg, wide fixed-point
#: agg, latest-per-key window, corpus tokenize+agg, exact dedup, LSH banding
DEFAULT_QUERIES = [
    "trending_scores",
    "pricing_summary",
    "latest_event_per_user",
    "tfidf_top_terms",
    "dedup_exact",
    "minhash_lsh_candidates",
]


def build_scaled(spark, k: int) -> None:
    marker = os.path.join(SCALED, f".k{k}")
    if os.path.exists(marker):
        return  # same-K scaled copy already on disk — reuse it
    shutil.rmtree(SCALED, ignore_errors=True)
    os.makedirs(SCALED, exist_ok=True)
    rep = spark.range(k).select(F.col("id").alias("_r"))

    ev = table(spark, BASE, "events")
    n_ev = ev.count()
    (
        ev.crossJoin(F.broadcast(rep))
        .withColumn("event_id", F.col("event_id") + F.col("_r") * (n_ev + 1))
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(SCALED, "events.parquet"))
    )
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    (
        li.crossJoin(F.broadcast(rep))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r") * 100_000_000)
        # disjoint part domain per replica: the co-occurrence graph becomes
        # K copies of itself (pure volume), not a K-fold DENSER graph (the
        # support threshold would otherwise admit every one-off pair)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("_r") * 10_000_000)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(SCALED, "lineitem.parquet"))
    )
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_docs = docs.count()
    (
        docs.crossJoin(F.broadcast(rep))
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * (n_docs + 1))
        # suffix EVERY TOKEN with the replica id: replicas are lexically
        # disjoint, so neither exact nor near-dup machinery (minhash/simhash
        # signatures are token-content-based) links copies — replication
        # measures volume scaling, not planted duplicate-group blowup
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("_r").cast("string")),
                ),
            ),
        )
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(SCALED, "documents.parquet"))
    )
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n_emb = emb.count()
    dim = len(emb.select("embedding").first()[0])
    (
        emb.crossJoin(F.broadcast(rep))
        .withColumn("vec_id", F.col("vec_id") + F.col("_r") * (n_emb + 1))
        # circular dim rotation per replica: preserves every within-replica
        # cosine (it's a coordinate permutation) while decorrelating
        # replicas — copies are NOT planted near-dups of each other
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.element_at(
                    F.col("embedding"),
                    ((i + F.col("_r") * 7) % dim + 1).cast("int"),
                ),
            ),
        )
        .drop("_r")
        .write.mode("overwrite")
        .parquet(os.path.join(SCALED, "embeddings.parquet"))
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        src = os.path.join(BASE, f"{t}.parquet")
        if os.path.exists(src):
            dst = os.path.join(SCALED, f"{t}.parquet")
            shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)
    # marker LAST: an interrupted build must rebuild, not get silently
    # reused and time queries against a partial dataset
    open(marker, "w").close()


def time_query(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2:] or DEFAULT_QUERIES
    streaming = [n for n in names if n.startswith("streaming_") or n.startswith("stream_")]
    if streaming:
        # real readStream runs resolve sources differently against the
        # replicated layout (measured: x8 "finishing" 10x faster than base
        # = it read nothing) — their transformation lineage is the same
        # batch shapes audited above, so exclude rather than mislead
        print(f"skipping streaming queries (not scale_check-able): {streaming}")
        names = [n for n in names if n not in streaming]
    spark = get_spark(app_name="scale_check")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build_scaled(spark, k)
    print(f"{'query':32s} {'sf0.1':>8s} {f'x{k}':>8s} {'ratio':>7s} {'ratio/K':>8s}")
    for name in names:
        t1 = time_query(spark, name, BASE)
        tk = time_query(spark, name, SCALED)
        print(f"{name:32s} {t1:8.3f} {tk:8.3f} {tk / t1:7.2f} {tk / t1 / k:8.2f}")


if __name__ == "__main__":
    main()
