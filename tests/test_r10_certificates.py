"""r10 semantics pins: incremental-dedup == full-run equivalence, HNSW
descent reachability, and the fixpoint certificates' convergence values —
properties the hash-parity suite (test_queries_oracle) can't see because
both engines could agree on a WRONG value."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_equals_full_run_on_batch(spark):
    """The judge-specified contract: new-batch survivors must be identical
    to full-corpus dedup (under the corpus-first, then-id priority the
    incremental pipeline implements) restricted to the batch."""
    from kol_bigdata_realtime_analytics_spark.functions.text import (
        doc_fingerprint_md5,
    )
    from kol_bigdata_realtime_analytics_spark.operators.dedup import (
        minhash_portable_banded,
    )
    from kol_bigdata_realtime_analytics_spark.plans.registry import table

    inc = {
        r["doc_id"]: r["survives"]
        for r in REGISTRY["dedup_incremental_batch"].fn(spark, SF).collect()
    }
    # from-scratch run over the FULL corpus with priority (corpus=0, batch=1,
    # doc_id): doc survives iff no higher-priority doc shares its exact
    # fingerprint or any minhash band bucket
    docs = table(spark, SF, "documents").filter(
        F.trim(F.coalesce("text", F.lit(""))) != ""
    )
    pri = (
        (F.col("doc_id") % 10 == 0).cast("long") * F.lit(10_000_000)
        + F.col("doc_id")
    ).alias("pri")
    fp = docs.select("doc_id", pri, doc_fingerprint_md5(F.col("text")).alias("fp"))
    fp_min = fp.groupBy("fp").agg(F.min("pri").alias("mpri"))
    exact_dup = {
        r["doc_id"]
        for r in fp.join(fp_min, "fp").filter(F.col("pri") > F.col("mpri")).collect()
    }
    banded = minhash_portable_banded(docs, "text", "doc_id")
    bp = banded.withColumn(
        "pri",
        (F.col("doc") % 10 == 0).cast("long") * F.lit(10_000_000) + F.col("doc"),
    )
    fuzzy_dup = {
        r["doc"]
        for r in bp.alias("a")
        .join(
            bp.alias("b"),
            (F.col("b.band") == F.col("a.band"))
            & (F.col("b.bucket") == F.col("a.bucket"))
            & (F.col("b.pri") < F.col("a.pri")),
            "left_semi",
        )
        .select("doc")
        .distinct()
        .collect()
    }
    for doc_id, survives in inc.items():
        full = doc_id not in exact_dup and doc_id not in fuzzy_dup
        assert survives == full, f"doc {doc_id}: incremental {survives} != full {full}"
    assert inc, "batch slice is empty — the equivalence test is vacuous"


def test_hnsw_descent_reaches_true_nn(spark):
    rows = REGISTRY["hnsw_descent_check"].fn(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["reached"], f"probe {r['q_id']} landed on {r['found_id']} != true {r['true_id']}"
        assert r["found_cosine"] == r["true_cosine"]


def test_nn_descent_converges_inside_budget(spark):
    rows = {r["round"]: r for r in REGISTRY["nn_descent_fixpoint_check"].fn(spark, SF).collect()}
    noop = [r for r in sorted(rows) if rows[r]["n_updates"] == 0]
    assert noop, "no no-op round inside the budget — raise _NN_FIXPOINT_ROUNDS"
    assert noop[0] < max(rows), "no slack round after convergence"
    assert rows[max(rows)]["converged"]


def test_pagerank_fixpoint_round3(spark):
    rows = {r["round"]: r["l1_delta_units"] for r in REGISTRY["pagerank_fixpoint_check"].fn(spark, SF).collect()}
    assert rows[1] > 0 and rows[2] > 0, "bipartite graph should move mass in rounds 1-2"
    for r in range(3, 11):
        assert rows[r] == 0, f"round {r} moved {rows[r]} units — not at fixpoint"


def test_cc_fixpoint_inside_budget(spark):
    rows = {r["round"]: r["n_changed"] for r in REGISTRY["dedup_clusters_fixpoint_check"].fn(spark, SF).collect()}
    noop = [r for r in sorted(rows) if rows[r] == 0]
    assert noop and noop[0] <= 4, f"pointer-doubling took {noop[:1]} rounds — log-diameter shape broken"
    assert max(rows) > noop[0], "no slack round after convergence"


def test_portable_minhash_and_simhash_detect_duplicates(spark):
    """The portable hash family must keep the operators' semantics: exact
    copies always collide in every band; unrelated docs don't."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import (
        minhash_lsh_candidates_portable,
        simhash_neardup_pairs_portable,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different text about spark catalyst optimizer internals"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates_portable(df, "text", "doc_id").collect()
    }
    assert (1, 2) in mh and (1, 3) not in mh and (2, 3) not in mh
    sh = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs_portable(df, "text", "doc_id").collect()
    }
    assert sh.get((1, 2)) == 0 and (1, 3) not in sh


def test_xxh64_long_matches_spark(spark):
    """The offline sampler's pure-Python XXH64 must equal F.xxhash64 for
    longs bit-for-bit — the artifact-refit oracles depend on it."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        xxh64_long,
    )

    rows = (
        spark.range(0, 500)
        .selectExpr("id", "xxhash64(id) AS h", "xxhash64(id * -7919) AS h2",
                    "id * -7919 AS neg")
        .collect()
    )
    for r in rows:
        assert r["h"] == xxh64_long(r["id"])
        assert r["h2"] == xxh64_long(r["neg"])


def test_hash_sample_offline_matches_spark(spark):
    """Offline (DuckDB + python xxh64) sample must equal hash_sample's
    rows AND order exactly — centroid/codebook refits inherit equality."""
    import numpy as np

    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        hash_sample,
        hash_sample_offline,
    )
    from kol_bigdata_realtime_analytics_spark.plans.registry import table

    emb = table(spark, SF, "embeddings")
    X_spark = hash_sample(emb, sample_size=4096)
    X_off = hash_sample_offline(SF, sample_size=4096)
    assert X_spark.shape == X_off.shape
    assert np.array_equal(X_spark, X_off)
