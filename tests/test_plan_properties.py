"""Machine-checked physical-plan properties (the PERF.md §1 audit as tests).

These assert the load-bearing scale properties — partition pruning, parquet
filter/column pushdown, broadcast joins, no-driver-collect top-k — so a
regression in plan shape fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.plans.registry import table


def _formatted(df) -> str:
    jvm = df.sparkSession._sc._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_partition_pruning_on_dt(spark, tmp_path):
    """A dt-partitioned table read with a dt predicate must scan ONE
    partition directory — the property every medallion query at 100 TB
    stands on (SURVEY §4: dt partitioning on Bronze/Iceberg tables)."""
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 5) + 1:02d}", float(i)) for i in range(100)],
        "id long, dt string, v double",
    )
    path = str(tmp_path / "dt_table")
    df.write.partitionBy("dt").parquet(path)

    back = spark.read.parquet(path).filter(F.col("dt") == "2024-01-03")
    plan = _formatted(back)
    # predicate must land in PartitionFilters (metadata-only pruning),
    # not in the row-level PushedFilters
    assert "PartitionFilters" in plan
    assert "2024-01-03" in plan.split("PartitionFilters")[1].split("\n")[0]
    assert back.count() == 20
    # pruned scan reads exactly the one partition's files
    n_files = back.select(F.input_file_name()).distinct().count()
    all_files = spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    assert n_files < all_files


def test_parquet_filter_and_column_pushdown(spark, sf_oracle):
    """Row-group filter + column pruning must reach the parquet scan."""
    li = table(spark, sf_oracle, "lineitem")
    q = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    plan = _formatted(q)
    assert "PushedFilters" in plan
    assert "LessThan(l_quantity" in plan
    # ReadSchema pruned to the 2 needed columns
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


@pytest.mark.parametrize(
    "qname",
    ["customer_enriched", "top_spenders", "regional_supplier_revenue", "shipping_priority"],
)
def test_dim_joins_broadcast(spark, sf_oracle, qname):
    """Every dim-enrichment join must be a BroadcastHashJoin — the fact side
    is never allowed on a shuffle for these shapes."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY[qname].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, sf_oracle):
    """ORDER BY ... LIMIT k must plan as TakeOrderedAndProject (per-partition
    top-k + merge), never a global sort of the full table."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["top_spenders"].fn(spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_q6_all_predicates_pushed(spark, sf_oracle):
    """forecast_revenue_change (Q6 shape): date range, discount band, and
    quantity cap must ALL reach the parquet scan as PushedFilters."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["forecast_revenue_change"].fn(spark, sf_oracle))
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    for fragment in ("l_shipdate", "l_discount", "LessThan(l_quantity"):
        assert fragment in pushed, f"{fragment} not pushed: {pushed}"


def test_product_timeseries_single_exchange(spark, sf_oracle):
    """The sold-delta lag window and the latest-per-key row_number share the
    (product_id) partitioning: product_sold_latest must plan exactly ONE
    hash exchange, with the purchase filter pushed to the scan."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    import re

    plan = _formatted(REGISTRY["product_sold_latest"].fn(spark, sf_oracle))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "EqualTo(event_type,purchase)" in pushed


def test_wire_roundtrip_stays_one_stage(spark, sf_oracle):
    """wire_roundtrip is per-row (parse -> project -> serialize -> parse):
    no exchange at all — a 100 TB replay is embarrassingly parallel."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["wire_roundtrip"].fn(spark, sf_oracle))
    assert "Exchange" not in plan, plan


def test_trust_features_full_single_projection(spark, sf_oracle):
    """All 29 engineered features must stay ONE scan + projection: no
    exchange, no join; column pruning keeps the scan at the two source
    columns the synthesis needs."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["trust_features_full"].fn(spark, sf_oracle))
    assert "Exchange" not in plan, plan
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "c_custkey" in read_schema and "c_acctbal" in read_schema
    assert "c_name" not in read_schema


def test_document_chunks_no_exchange(spark, sf_oracle):
    """Chunk fan-out (tokenize -> posexplode -> slice) is a generator over
    the scan — zero shuffles; the corpus chunks in one pass."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["document_chunks"].fn(spark, sf_oracle))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # the posexplode generator


def test_bucketed_join_has_no_shuffle(spark, sf_oracle):
    """Bucketed tables co-locate join keys at WRITE time: a join of two
    tables bucketed on the same key must plan ZERO Exchange operators —
    the 100 TB repeated-join pattern (bucket once, join shuffle-free
    forever). SortMergeJoin over pre-bucketed inputs is expected."""
    from kol_bigdata_realtime_analytics_spark.plans.registry import table as t

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    t(spark, sf_oracle, "orders").write.bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).mode("overwrite").saveAsTable("b_orders")
    t(spark, sf_oracle, "customer").write.bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).mode("overwrite").saveAsTable("b_customer")
    try:
        # disable auto-broadcast so the join would OTHERWISE shuffle both sides
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("b_orders").join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = _formatted(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_pii_and_gopher_scan_only(spark, sf_oracle):
    """PII redaction and repetition filters are pure projections: zero
    exchanges — at 100 TB they run scan-local at input bandwidth."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    for name in ("pii_redaction", "gopher_repetition_filters", "c4_segment_filters"):
        plan = _formatted(REGISTRY[name].fn(spark, sf_oracle))
        assert "Exchange" not in plan, (name, plan)


def test_decontaminate_broadcasts_benchmark(spark, sf_oracle):
    """The deduped benchmark shingle set must broadcast: the corpus side of
    the contamination join never shuffles its exploded shingles."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["decontaminate_overlap"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_scd2_single_exchange(spark, sf_oracle):
    """Change detection (lag) and interval stitching (lead) share the
    (user_id) partitioning: exactly ONE hash exchange in the plan."""
    import re

    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["scd2_user_event_type"].fn(spark, sf_oracle))
    n = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n == 1, plan


def test_quantize_and_funnel_scan_only(spark, sf_oracle):
    """int8 quantization is a pure scan projection (zero exchanges); the
    quality funnel's only wide work is the 5-long agg row (<= 2 exchanges:
    partial->final agg)."""
    import re

    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["embedding_quantize_int8"].fn(spark, sf_oracle))
    assert "Exchange" not in plan, plan

    plan = _formatted(REGISTRY["quality_funnel"].fn(spark, sf_oracle))
    n = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n <= 2, plan


def test_ann_int8_broadcasts_queries(spark, sf_oracle):
    """int8 rescoring broadcasts the query side — the corpus codes never
    shuffle (same contract as brute_force_topk)."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["ann_int8_topk"].fn(spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dq_fk_checks_broadcast_dims(spark, sf_oracle):
    """FK orphan checks anti-join against broadcast key sets — the fact
    tables (orders/lineitem) never shuffle for a DQ gate."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["dq_constraint_checks"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan, plan


def test_profile_orders_single_scan(spark, sf_oracle):
    """The 6-column profile reads the orders table ONCE (one parquet scan
    in the plan) — multi-column distincts ride a single Expand."""
    import re

    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["profile_orders"].fn(spark, sf_oracle))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Expand" in plan, plan


def test_shingle_hash_rows_pre_partition_adds_no_window_exchange(spark, sf_small):
    """With pre_partition=True the doc-level repartition is the ONLY
    exchange up to shingle rows: posexplode preserves hash(doc) clustering,
    so the lead() window sorts locally instead of shuffling token rows
    (24 bytes/token ≈ 4x the raw text — the 100 TB reason this flag
    exists; see shingle_hash_rows docstring)."""
    import re

    from kol_bigdata_realtime_analytics_spark.operators.dedup import shingle_hash_rows

    docs = table(spark, sf_small, "documents")
    pre = _formatted(shingle_hash_rows(docs, "text", "doc_id", 4, pre_partition=True))
    assert len(re.findall(r"^\(\d+\) Exchange", pre, re.M)) == 1, pre
    assert "Window" in pre, pre
    # default path: exactly one exchange too, but it is the window's
    # token-row clustering (no doc-level repartition above it)
    default = _formatted(shingle_hash_rows(docs, "text", "doc_id", 4))
    assert len(re.findall(r"^\(\d+\) Exchange", default, re.M)) == 1, default


def test_salted_join_broadcasts_replicated_dim(spark, sf_oracle):
    """skew_salted_join: the replicated dim must still broadcast (it is
    dim x n_salt, not fact-sized), and the fact side must never sort-merge."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["skew_salted_join"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q21_single_fact_join(spark, sf_oracle):
    """late_sole_supplier_orders: the per-order counts are window
    aggregates, so exactly ONE lineitem x orders join appears — the
    groupBy+join-back form would plan two (lineage re-execution, PERF
    §2.2) — and the top-20 is TakeOrderedAndProject."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["late_sole_supplier_orders"].fn(spark, sf_oracle))
    n_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_joins <= 1, plan
    assert "TakeOrderedAndProject" in plan


def test_pricing_summary_long_partials(spark, sf_oracle):
    """Q1's fixed-point limb form: ONE exchange total (the limb sums and
    the group agg share a single hash aggregation), partial sums over
    LONG limbs, decimal only in the per-output-row recombination — the
    properties of PERF §2.10."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["pricing_summary"].fn(spark, sf_oracle))
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # limb split happens in the aggregate expressions (hi = shiftright, lo = mask)
    assert "shiftright" in plan.lower()
    # single aggregation pass -> exactly one exchange in the whole plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    # per-row quantization happens in the scan-side projection (round...cast to bigint)
    assert "round" in plan.lower()


def test_vocab_curve_window_is_post_aggregation(spark, sf_oracle):
    """vocab_coverage_curve: the single-partition window must consume the
    frequency HISTOGRAM (post-agg), never vocab- or corpus-sized rows —
    i.e. the plan has the two aggregates BEFORE the window."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["vocab_coverage_curve"].fn(spark, sf_oracle))
    window_pos = plan.find("Window")
    assert window_pos > 0
    # both aggregation passes appear below (later in formatted output =
    # deeper in tree = executed earlier) the window operator
    agg_section = plan[window_pos:]
    assert agg_section.count("HashAggregate") >= 2


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Joining a dt-partitioned fact to a FILTERED dim must inject a
    dynamic-partition-pruning subquery into the fact scan — at 100 TB this
    is the difference between scanning 3 partitions and 3000 when the
    partition predicate only exists on the dim side."""
    fact = spark.createDataFrame(
        [(i, f"d{i % 20}", float(i)) for i in range(2000)],
        "id long, dt string, v double",
    )
    fact_path = str(tmp_path / "dpp_fact")
    fact.write.partitionBy("dt").parquet(fact_path)
    dim = spark.createDataFrame(
        [(f"d{i}", "keep" if i < 2 else "drop") for i in range(20)],
        "dt string, flag string",
    )
    joined = (
        spark.read.parquet(fact_path)
        .join(dim.filter(F.col("flag") == "keep"), "dt")
    )
    plan = _formatted(joined)
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == 200


def test_band_join_is_hash_join_not_nested_loop(spark, sf_oracle):
    """acctbal_band_pairs: the bucket decomposition must plan a hash join
    (equi on bucket) — a raw non-equi |x-y|<=d condition would fall back
    to BroadcastNestedLoopJoin with O(n^2) compares."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["acctbal_band_pairs"].fn(spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_no_unexpected_nested_loop_joins(spark, sf_oracle):
    """Registry-wide fence: BroadcastNestedLoopJoin (O(n*m) compares) may
    appear ONLY where a tiny frame is deliberately broadcast-crossed
    (scalar totals, query vectors, bucket spines). Any other occurrence is
    a scale bug — a non-equi join that silently fell off the hash path."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY
    from scripts.plan_audit import SKIP

    # every name here crosses a frame that is O(1) / dim-sized by
    # construction (audited in PLANS.md; see each query's docstring)
    allowed = {
        "ann_cosine_topk",          # broadcast 5 query vectors x corpus (baseline scorer)
        "ann_ivfpq_topk",           # broadcast 8-row centroid frame x corpus (coarse assign)
        "ann_ivfpq_residual_topk",  # same 8-row centroid broadcast cross (IVFADC variant)
        "ann_ivfpq_residual_recall_check",  # brute-force reference + centroid broadcasts over the 512-row fixture
        "ann_int8_topk",            # broadcast 5 query codes x corpus
        "ann_lsh_recall_check",     # brute-force reference inside the invariant
        "ann_ivfpq_recall_check",   # brute-force reference over the 512-row clustered fixture + 8-row centroid broadcast
        "simhash_recall_check",     # brute-force hamming over a <=800-row broadcast slice + 1-row crosses
        "brands_above_global_avg_qty",  # broadcast 1-row global average
        "collocations_pmi",         # broadcast 1-row total
        "count_min_check",          # broadcast 1-row totals (rows_ok, n)
        "dsir_importance_weights",  # broadcast 1-row feature totals into the 256-row LR table
        "heavy_hitters_hotkeys",    # broadcast 1-row total for the threshold filter
        "hybrid_search_rrf",        # broadcast 1-row query vector + 1-row BM25 corpus stats
        "hybrid_rerank_containment",  # inherits RRF's 1-row crosses + broadcast 1-row query-grams
        "hybrid_recall_check",      # inherits RRF's 1-row crosses + 1-row x 1-row stat cross
        "hard_negative_mining",     # broadcast 32-row anchor page x corpus (bounded query side)
        "late_interaction_maxsim",  # broadcast 1-row query token-vector frame x corpus
        "matryoshka_overlap_check",  # broadcast 1-row (full, prefix) query vector pair x corpus
        "momentum_stream_batch_equiv_check",  # broadcast 1-row final-watermark scalar
        "join_size_ams_check",      # broadcast 1-row AGMS estimate x 1-row exact
        "rolling_hll_users_check",  # day-spine range join (days x days)
        "skew_salted_join",         # broadcast 8-row salt spine x dim
        "trending_scores_v2",       # broadcast 1-row corpus globals (ref time, avg views, counts)
        "source_mix_divergence",    # broadcast 1-row total
        "distinctive_terms_chi2",   # broadcast 1-row all-token total
        "tfidf_top_terms",          # broadcast 1-row doc count
        "unigram_xent_scores",      # broadcast 1-row total
        "bigram_xent_scores",       # broadcast 1-row unigram total
        "ann_binary_hamming_topk",  # broadcast 5 query codes x corpus (16B/row scan)
        "ann_binary_recall_check",  # brute-force reference + the 5-code broadcast
        "ann_lsh_multiprobe_recall_check",  # brute-force reference + 1-row hit totals
        "knn_graph_recall_check",   # brute-force reference (5-query broadcast x corpus) + 1-row hit-total crosses
        "hnsw_descent_check",       # broadcast 1-row entry node (beam seed + entry_id attach) + brute-force truth leg (3-probe broadcast x corpus)
        "ann_hnsw_topk",            # broadcast 1-row entry node seeding the 32-query beam descent
        "quality_classifier_train",  # broadcast 1-row per-round loss frame crossed onto the 65-row weight table
        "ann_hnsw_recall_check",    # inherits the descent's 1-row entry cross + brute-force truth leg (32-probe broadcast x corpus)
        "pps_systematic_sample",    # broadcast 1-row total-tokens cross + bucket-offset range join over the n/64-row bucket-sum frame
        "zipf_law_fit",             # rank-offset range join over the (freq -> n_terms) HISTOGRAM (distinct frequency values — two orders smaller than the vocab)
        "markov_removal_attribution",  # broadcast 1-row base-P(conv) + 1-row effect-total crosses into the 4-row credit frame
        "nn_descent_gain_check",    # brute-force reference (5-query broadcast x corpus) + 1-row sum/hit-total crosses
        "kneser_ney_xent_scores",   # broadcast 1-row bigram-type total (nt) into the scoring stream
        "streaming_quantile_check",  # broadcast 3-row quantile spine x 5-row per-key count frame
        "hnsw_layer_assign",        # <=9x9 level-census self range-join (layer population)
        "domain_quality_rollup",    # broadcast 1-row corpus-mean cross into the 20-row host frame
        "t_closeness_audit",        # class grid cross: 125 classes x ~13-band spine + scalar totals
        "equiheight_histogram_check",  # broadcast 3 predicate literals x scan (truth leg) + 8-row histogram
        "streaming_approx_distinct_check",  # broadcast 1-row exact-distinct total
        "benford_digit_audit",      # broadcast 1-row total x 9-digit grid
        "unigram_lm_prune_round",   # broadcast 1-row stat frames (inventory/round counts) + piece-total cross
        "skipgram_training_pairs",  # broadcast 1-row token total into the vocab-sized weight table
        "vocab_coverage_curve",     # broadcast 1-row total
        "ab_value_ttest",           # 1-row x 1-row arm cross
        "value_drift_psi",          # broadcast 1-row midpoint + 10-row bucket spine
        "bm25_search",              # broadcast 1-row corpus stats (n_docs, avgdl)
        "part_affinity_scores",     # broadcast 1-row order count
        "weighted_median_by_segment",
        "events_value_band_topk",
        "corpus_mix_plan",
        "token_budget_curve",
        "domain_temperature_weights",
        "embedding_neardup_pairs",
        "robust_value_stats",
        "daily_value_anomalies",    # broadcast 1-row median + 1-row MAD over the 30-row day frame
        "ewma_daily_event_volume",  # broadcast 30-row literal kernel x 30-row day frame
        "incremental_dedup_new_docs",
        "quality_funnel",
        "zonemap_pruning_stats",    # broadcast 1-row global-max cutoff x 30-row day frame
    }
    offenders = []
    for name in sorted(REGISTRY):
        if name in SKIP or name in allowed:
            continue
        try:
            plan = _formatted(REGISTRY[name].fn(spark, sf_oracle))
        except Exception:
            continue  # runtime-gated queries; covered elsewhere
        if "BroadcastNestedLoopJoin" in plan:
            offenders.append(name)
    assert not offenders, f"unexpected nested-loop joins in: {offenders}"


def test_training_shard_pipeline_scans_documents_once(spark, sf_oracle):
    """The fused pipeline fans into 5+ branches (bench shingles, dedup
    window, train shingles, both jaccard sides, packing) but the documents
    parquet file must be read ONCE: the quality projection is pinned via
    localCheckpoint, so the returned plan contains ZERO parquet scans —
    every branch reads the pinned survivor RDD. (The reference's medallion
    re-scans per stage; the composition is where re-scans sneak in.)"""
    import re

    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    plan = _formatted(REGISTRY["training_shard_pipeline"].fn(spark, sf_oracle))
    assert len(re.findall(r"Scan parquet", plan)) == 0, plan
    assert "Scan ExistingRDD" in plan, plan
