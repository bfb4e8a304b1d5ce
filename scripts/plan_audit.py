#!/usr/bin/env python
"""Generate PLANS.md: physical-plan shape stats for every registered query.

For each batch query, builds the DataFrame (no execution), renders the
executed plan, and counts the load-bearing operators: parquet scans,
exchanges, join strategies, window/sort/limit shapes. Streaming queries
(which execute on build) and pandas-UDF-gated queries are tagged instead
of planned. The table makes plan regressions reviewable in diffs — a new
SortMergeJoin or an extra Exchange shows up as a one-line change.

Usage: python scripts/plan_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kol_bigdata_realtime_analytics_spark.session import get_spark  # noqa: E402

# executing these on plan-build would run streams / iterative jobs; tag only
SKIP = {
    "streaming_trending": "streaming",
    "streaming_event_scores": "streaming",
    "streaming_momentum_stateful": "streaming",
    "streaming_ohlc": "streaming",
    "streaming_dedup_events": "streaming",
    "streaming_sessions": "streaming",
    "stream_static_enrichment": "streaming",
    "stream_stream_click_attribution": "streaming",
    "streaming_unattributed_views": "streaming",
    "streaming_heavy_hitters": "streaming (stateful MG shards)",
    "streaming_heavy_hitters_check": "streaming (runs the stateful stream on build)",
    "embedding_kmeans_lloyd": "iterative (collect-driven assign/update rounds)",
    "dedup_clusters": "iterative (collect-driven rounds)",
    "supplier_influence_pagerank": "iterative (collect-driven rounds)",
    "part_graph_triangles": "iterative (localCheckpoint stages)",
    "semantic_dedup_survivors": "iterative (collect-driven rounds)",
    "ann_ivf_topk": "centroid fit on build",
    "ann_ivf_recall_check": "centroid fit on build",
    "python_stream_datasource_scan": "streaming (runs a micro-batch on build)",
    "bpe_vocab_train": "iterative (collect-driven merge rounds on build)",
    "bpe_encode_stats": "merge-table fit on build (trains when cache cold)",
    "split_leakage_check": (
        "agg pinned as a pushdown fence (PERF §2.17) — the visible plan is "
        "the post-pin filter; the join pipeline above the fence is "
        "ngram_jaccard_pairs' shape"
    ),
}

COUNTERS = [
    ("scans", r"Scan parquet"),
    ("exch", r"Exchange"),
    ("bhj", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("win", r"Window\b"),
    ("topk", r"TakeOrderedAndProject"),
    ("gsort", r"(?<!TakeOrderedAndProject)\bSort\b"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cpus=4, shuffle_partitions=4)

    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    lines = [
        "# PLANS — physical-plan shape per registered query (generated)",
        "",
        f"`python scripts/plan_audit.py {sf_dir}` — counts from the executed",
        "plan string (AQE initial plan; runtime re-planning can only shrink",
        "exchanges). Columns: parquet scans, exchanges, broadcast-hash /",
        "sort-merge / nested-loop joins, window ops, top-k (TakeOrdered),",
        "other sorts. Streaming / iterative queries are tagged, not planned.",
        "",
        "| query | scans | exch | BHJ | SMJ | BNLJ | win | topk | sort |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        if name in SKIP:
            lines.append(f"| {name} | — | — | — | — | — | — | — | {SKIP[name]} |")
            continue
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - audit robustness
            lines.append(f"| {name} | ERROR: {str(e)[:60]} | | | | | | | |")
            continue
        counts = {key: len(re.findall(pat, plan)) for key, pat in COUNTERS}
        lines.append(
            "| {n} | {scans} | {exch} | {bhj} | {smj} | {bnlj} | {win} | {topk} | {gsort} |".format(
                n=name, **counts
            )
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(lines) - 9} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
