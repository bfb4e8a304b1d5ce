"""HNSW serving-side search (r10 verdict ask #3): the beam-search top-k
query a RAG user actually calls, over the layered graphs built by
`llm_ops.hnsw_layer_graphs`, plus its recall certificate against
brute-force truth. Completes the offline-HNSW arc: build (r10) ->
insert (r10) -> descend (r10) -> SEARCH (this module).

Reference parity: the reference repo has no ANN serving path at all —
this family is part of the beyond-reference LLM-pipeline surface
(SURVEY.md §2 extensions). Algorithm: Malkov & Yashunin 2016 (HNSW),
searched here with a fixed-unroll width-8 beam per layer so the whole
trajectory — not just the endpoints — is deterministic and DuckDB can
replay it CTE-for-hop (the `hnsw_descent_check` discipline, widened
from 3 probes/top-1 to a 32-query page/top-3).

Scale shape: per query the search work is beam x hops x M candidate
rescorings per layer — independent of corpus size except through the
~log4(n) layer count; the beam frames are (pages x beam) rows and
broadcast at every hop. Only the recall certificate's truth side scans
the corpus (one probes-x-corpus pass, the knn_graph_recall_check
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.plans.llm_ops import (
    _HNSW_BASE_SQL,
    _HNSW_BEAM,
    _HNSW_HOPS,
    _hnsw_build,
    _hnsw_layer_counts,
    _hnsw_layer_cte_sql,
    _hnsw_level_sql,
    _hnsw_pop_layers,
)
from kol_bigdata_realtime_analytics_spark.plans.registry import register, table

#: the serving page: one batch of query vectors per search call
_SEARCH_PROBES = 32
#: results returned per query (the ann_cosine_topk page shape)
_SEARCH_K = 3

#: session-scoped descent results keyed by (applicationId, sf_dir,
#: n_probes) — the search result feeds both the registered top-k query
#: and the recall certificate; same artifact-reuse rationale as
#: llm_ops._HNSW_BUILD_CACHE (and cleared with it by bench.py's
#: cold-billing hook).
_DESCEND_CACHE: dict = {}


def _descend_fin(
    spark: SparkSession, sf_dir: str, n_probes: int
) -> tuple[DataFrame, DataFrame]:
    """(pr, fin): the probe frame (q_id, q_vec, q_nrm) for vec_id <
    n_probes, and the deduped final candidate set (q_id, node, cosine)
    after a width-{_HNSW_BEAM} beam spends {_HNSW_HOPS} hops per layer
    descending the undirected layered graphs from the top layer's
    min-vec_id entry point. The probe's own node is excluded from the
    RESULT, not the walk; if the walk ends on it, its layer-0 neighbors
    are the natural last candidates (the hnsw_descent_check
    semantics, verbatim)."""
    key = (spark.sparkContext.applicationId, sf_dir, n_probes)
    hit = _DESCEND_CACHE.get(key)
    if hit is not None:
        return hit
    from kol_bigdata_realtime_analytics_spark.operators.similarity import dot

    base, counts, graph = _hnsw_build(spark, sf_dir)
    layers = _hnsw_pop_layers(counts)
    pr = base.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    bv = base.select(
        F.col("vec_id").alias("node"),
        F.col("vec").alias("n_vec"),
        F.col("nrm").alias("n_nrm"),
    )
    top = base.agg(F.max("level").alias("ml"))
    ent = (
        base.join(F.broadcast(top), F.col("level") == F.col("ml"))
        .agg(F.min("vec_id").alias("node"))
        .localCheckpoint(eager=True)  # 1 row
    )
    beam = pr.select("q_id").crossJoin(F.broadcast(ent))
    ed0 = None
    for l, _ in reversed(layers):
        fwd = graph.filter(F.col("level") == l).select(
            F.col("vec_id").alias("a"), F.col("neighbor_id").alias("b")
        )
        # lazily pinned (r12 opt, guide §5): the symmetrize+distinct ran
        # once per HOP before (6x per layer, + the probe-neighbor read on
        # layer 0); the checkpoint mark materializes it at the first hop's
        # job and every later hop reads the cached frame
        ed = (
            fwd.unionByName(
                fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        if l == 0:
            ed0 = ed
        for _h in range(_HNSW_HOPS):
            neigh = beam.join(ed, beam["node"] == ed["a"]).select(
                "q_id", F.col("b").alias("node")
            )
            cands = beam.select("q_id", "node").unionByName(neigh).distinct()
            scored = (
                bv.join(F.broadcast(cands), "node")
                .join(F.broadcast(pr), "q_id")
                .select(
                    "q_id",
                    "node",
                    F.round(
                        dot(F.col("q_vec"), F.col("n_vec"))
                        / (F.col("q_nrm") * F.col("n_nrm")),
                        6,
                    ).alias("cosine"),
                )
            )
            w = Window.partitionBy("q_id").orderBy(
                F.col("cosine").desc(), F.col("node").asc()
            )
            # TWO hops per eager pin (r12 opt, r11 verdict ask #6): odd
            # hops are checkpoint-MARKED lazily — the even hop's eager job
            # materializes and persists the odd beam mid-plan, so its two
            # consumers (the neighbor join and the candidate union) share
            # one computation and the job count on the certificate path
            # halves. EQUIVALENCE: each hop's beam is a pure function of
            # the previous beam (join -> union -> distinct -> score ->
            # top-8 window); eager vs lazy checkpointing changes only WHEN
            # the identical RDD materializes, never its rows, and lineage
            # still truncates at every hop, so hop k's plan never re-runs
            # hops 1..k-2. The descent trajectory — and therefore fin,
            # the top-k page, and the recall certificate — is unchanged.
            beam = (
                scored.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= _HNSW_BEAM)
                .select("q_id", "node", "cosine")
                .localCheckpoint(eager=(_h % 2 == 1))  # probes x beam rows
            )
    probe_neigh = (
        beam.filter(F.col("node") == F.col("q_id"))
        .join(ed0, beam["node"] == ed0["a"])
        .filter(F.col("b") != F.col("q_id"))
        .select("q_id", F.col("b").alias("node"))
        .join(F.broadcast(pr), "q_id")
        .join(bv, "node")
        .select(
            "q_id",
            "node",
            F.round(
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_nrm") * F.col("n_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    fin = (
        beam.filter(F.col("node") != F.col("q_id"))
        .select("q_id", "node", "cosine")
        .unionByName(probe_neigh)
        .distinct()
        .localCheckpoint(eager=True)  # <= probes x (beam + M) rows
    )
    _DESCEND_CACHE[key] = (pr, fin)
    return pr, fin


def _descend_cte_sql(sf_dir: str, n_probes: int) -> str:
    """DuckDB WITH-chain (no leading WITH) replaying the descent hop for
    hop, through `fin` — the oracle twin of _descend_fin. Mirrors
    llm_ops._hnsw_descent_oracle's unroll with a parameterized probe
    page."""
    counts = _hnsw_layer_counts(sf_dir)
    layers = _hnsw_pop_layers(counts)
    ctes = "".join(_hnsw_layer_cte_sql(l, n) for l, n in layers)
    eds = "".join(
        f",\ned{l} AS (SELECT DISTINCT a, b FROM ("
        f"SELECT q_id AS a, c_id AS b FROM knn{l} "
        f"UNION ALL SELECT c_id, q_id FROM knn{l}) t)"
        for l, _ in layers
    )
    steps = []
    prev = "beam0"
    for l, _ in reversed(layers):
        for h in range(1, _HNSW_HOPS + 1):
            cur = f"s{l}_{h}"
            steps.append(f""",
{cur} AS MATERIALIZED (
  SELECT q_id, node, cosine FROM (
    SELECT t.q_id, t.node, t.cosine,
           ROW_NUMBER() OVER (PARTITION BY t.q_id
             ORDER BY t.cosine DESC, t.node ASC) AS rk
    FROM (
      SELECT DISTINCT c.q_id, c.node,
             ROUND(list_dot_product(p.q_vec, v.vec) / (p.q_nrm * v.nrm), 6)
               AS cosine
      FROM (
        SELECT q_id, node FROM {prev}
        UNION ALL
        SELECT s.q_id, e.b AS node FROM {prev} s JOIN ed{l} e ON e.a = s.node
      ) c
      JOIN pr p ON p.q_id = c.q_id
      JOIN hbase v ON v.vec_id = c.node
    ) t
  ) WHERE rk <= {_HNSW_BEAM}
)""")
            prev = cur
    return f"""{_HNSW_BASE_SQL.format(level=_hnsw_level_sql()).lstrip()}{ctes}{eds},
    pr AS (SELECT vec_id AS q_id, vec AS q_vec, nrm AS q_nrm FROM hbase
           WHERE vec_id < {n_probes}),
    ent AS (SELECT MIN(vec_id) AS node FROM hbase
            WHERE level = (SELECT MAX(level) FROM hbase)),
    beam0 AS (SELECT q_id, node FROM pr, ent){''.join(steps)},
    fin AS (
      SELECT q_id, node, cosine FROM {prev} WHERE node <> q_id
      UNION ALL
      SELECT s.q_id, e.b AS node,
             (SELECT ROUND(list_dot_product(p.q_vec, v.vec)
                           / (p.q_nrm * v.nrm), 6)
              FROM pr p JOIN hbase v ON v.vec_id = e.b WHERE p.q_id = s.q_id)
      FROM {prev} s JOIN ed0 e
        ON e.a = s.node AND s.node = s.q_id AND e.b <> s.q_id
    )"""


def _hnsw_topk_oracle(sf_dir: str) -> str:
    return f"""
    WITH {_descend_cte_sql(sf_dir, _SEARCH_PROBES)}
    SELECT q_id, node AS c_id, cosine, CAST(rk AS BIGINT) AS rank FROM (
      SELECT q_id, node, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cosine DESC, node ASC) AS rk
      FROM (SELECT DISTINCT * FROM fin) t
    ) WHERE rk <= {_SEARCH_K}
    """


@register("ann_hnsw_topk", oracle=_hnsw_topk_oracle)
def ann_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW beam-search top-{_SEARCH_K} for a {_SEARCH_PROBES}-query
    serving page (vec_id < {_SEARCH_PROBES}): each query enters the
    layered graph at the top layer's entry point and a width-8 beam
    spends 6 hops per layer descending the undirected M=16 links to
    layer 0; the final candidate set (beam + the probe's own layer-0
    neighbors when the walk lands on itself) is ranked by exact cosine
    with id tie-breaks. Output is the ann_cosine_topk page shape
    (q_id, c_id, cosine, rank) — the drop-in approximate replacement
    for the brute-force scan, hash-exact over the whole trajectory
    because every hop is deterministic and replayed CTE-for-hop by the
    oracle.

    Scale shape: search work per query is beam x hops x M rescorings
    per layer (~log4(n) layers) — INDEPENDENT of corpus size; the beam
    frames ((page x beam) rows) broadcast at every hop and the layered
    graph joins are id-keyed. This is the whole point of descending a
    persisted HNSW index instead of running ann_cosine_topk's
    corpus scan per page."""
    pr, fin = _descend_fin(spark, sf_dir, _SEARCH_PROBES)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("node").asc())
    return (
        fin.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SEARCH_K)
        .select(
            "q_id",
            F.col("node").alias("c_id"),
            "cosine",
            F.col("rk").cast("long").alias("rank"),
        )
    )


def _hnsw_recall_oracle(sf_dir: str) -> str:
    return f"""
    WITH {_descend_cte_sql(sf_dir, _SEARCH_PROBES)},
    topk AS (
      SELECT q_id, node AS c_id, rk FROM (
        SELECT q_id, node, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine DESC, node ASC) AS rk
        FROM (SELECT DISTINCT * FROM fin) t
      ) WHERE rk <= {_SEARCH_K}
    ),
    bt AS (
      SELECT q_id, c_id, rk FROM (
        SELECT p.q_id, v.vec_id AS c_id,
               ROW_NUMBER() OVER (PARTITION BY p.q_id ORDER BY
                 ROUND(list_dot_product(p.q_vec, v.vec) / (p.q_nrm * v.nrm), 6)
                   DESC, v.vec_id ASC) AS rk
        FROM pr p JOIN hbase v ON v.vec_id <> p.q_id
      ) WHERE rk <= {_SEARCH_K}
    ),
    hits AS (
      SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM topk t JOIN bt b ON b.q_id = t.q_id AND b.c_id = t.c_id
      GROUP BY t.q_id
    )
    SELECT t1.q_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits_at_{_SEARCH_K},
           t1.c_id = b1.c_id AS top1_reached
    FROM (SELECT q_id, c_id FROM topk WHERE rk = 1) t1
    JOIN (SELECT q_id, c_id FROM bt WHERE rk = 1) b1 ON b1.q_id = t1.q_id
    LEFT JOIN hits h ON h.q_id = t1.q_id
    """


@register("ann_hnsw_recall_check", oracle=_hnsw_recall_oracle)
def ann_hnsw_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall certificate for ann_hnsw_topk: per serving-page query, how
    many of its beam-search top-{_SEARCH_K} appear in the brute-force
    cosine top-{_SEARCH_K} (n_hits_at_{_SEARCH_K}) and whether the
    approximate rank-1 IS the true nearest neighbor (top1_reached).
    Both sides are deterministic, so the certificate is value-hashed —
    the driver checks the actual recall surface, not a summary;
    tests/test_r11_certificates.py additionally pins the aggregate
    recall floor.

    Scale shape: the search side is the cached page descent (corpus-
    independent); the truth side is the one probes-x-corpus scan any
    recall measurement must pay — in production it runs on a sampled
    query page exactly like this one."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        brute_force_topk,
    )

    pr, fin = _descend_fin(spark, sf_dir, _SEARCH_PROBES)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("node").asc())
    topk = (
        fin.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SEARCH_K)
        .select("q_id", F.col("node").alias("c_id"), "rk")
    )
    emb = table(spark, sf_dir, "embeddings")
    bt = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < _SEARCH_PROBES), k=_SEARCH_K
    ).select("q_id", "c_id", F.col("rank").alias("rk"))
    hits = (
        topk.join(bt, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    t1 = topk.filter(F.col("rk") == 1).select("q_id", F.col("c_id").alias("t_c"))
    b1 = bt.filter(F.col("rk") == 1).select("q_id", F.col("c_id").alias("b_c"))
    return (
        t1.join(b1, "q_id")
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias(
                f"n_hits_at_{_SEARCH_K}"
            ),
            (F.col("t_c") == F.col("b_c")).alias("top1_reached"),
        )
    )


# ---------------------------------------------------------------------------
# RTBF -> index maintenance (r10 verdict ask #5): apply a forget set to
# the FROZEN layered HNSW index as tombstone deletes + per-list repair,
# and certify (a) the repaired index equals a from-scratch rebuild on
# the surviving corpus (same frozen hash family), (b) no deleted id is
# reachable afterwards. Connects the privacy family
# (forget_set_removal_audit) to the ANN family with the
# incremental==full-run discipline of dedup_incremental_batch, applied
# to deletion.
# ---------------------------------------------------------------------------

#: deterministic forget set: vec_id % 101 == 7 (~1% of the corpus — the
#: realistic RTBF batch scale; with M=16 lists this still touches
#: ~1-(1-0.01)^16 ~ 15% of lists, so repair is non-vacuous at every sf)
_FORGET_MOD = 101
_FORGET_RES = 7


def _forget_rebuild_cte_sql(l: int, planes: int) -> str:
    """Survivor rebuild for one layer with the FROZEN plane family (the
    live index's hash family does not drift on delete)."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        lsh_bucket_sql,
    )
    from kol_bigdata_realtime_analytics_spark.plans.llm_ops import (
        _HNSW_M,
        _KNN_PROBE_BITS,
    )

    bucket = lsh_bucket_sql("vec", dim=64, n_planes=planes)
    probe_list = ", ".join(
        ["bkt"] + [f"xor(bkt, {1 << i})" for i in range(_KNN_PROBE_BITS)]
    )
    return f""",
rbl{l} AS MATERIALIZED (
  SELECT vec_id, vec, nrm, {bucket} AS bkt FROM hbase
  WHERE level >= {l} AND vec_id % {_FORGET_MOD} <> {_FORGET_RES}),
rbq{l} AS (SELECT vec_id AS q_id, vec AS q_vec, nrm AS q_nrm,
              unnest([{probe_list}]) AS probe FROM rbl{l}),
rb{l} AS MATERIALIZED (
  SELECT q_id, c_id, cosine, rank FROM (
    SELECT s.q_id, s.c_id, s.cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY s.q_id
                 ORDER BY s.cosine DESC, s.c_id ASC) AS BIGINT) AS rank
    FROM (
      SELECT qp.q_id, b.vec_id AS c_id,
             ROUND(list_dot_product(qp.q_vec, b.vec) / (qp.q_nrm * b.nrm), 6)
               AS cosine
      FROM rbl{l} b JOIN rbq{l} qp
        ON b.bkt = qp.probe AND b.vec_id <> qp.q_id) s
  ) WHERE rank <= {_HNSW_M}
),
aff{l} AS MATERIALIZED (
  SELECT DISTINCT q_id FROM knn{l}
  WHERE q_id % {_FORGET_MOD} <> {_FORGET_RES}
    AND c_id % {_FORGET_MOD} = {_FORGET_RES})"""


def _forget_oracle(sf_dir: str) -> str:
    from kol_bigdata_realtime_analytics_spark.plans.llm_ops import (
        _hnsw_layer_cte_sql,
    )
    from kol_bigdata_realtime_analytics_spark.plans.llm_ops import _knn_planes
    from kol_bigdata_realtime_analytics_spark.plans.registry import sql_hash52

    layers = _hnsw_pop_layers(_hnsw_layer_counts(sf_dir))
    ctes = "".join(
        _hnsw_layer_cte_sql(l, n) + _forget_rebuild_cte_sql(l, _knn_planes(n))
        for l, n in layers
    )
    h = sql_hash52(
        f"CAST({{l}} AS VARCHAR) || '|' || CAST(q_id AS VARCHAR) || '|' || "
        "CAST(c_id AS VARCHAR) || '|' || CAST(rank AS VARCHAR)"
    )
    body = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({l} AS BIGINT) AS level,
      (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) FROM knn{l})
        AS n_frozen_lists,
      (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) FROM knn{l}
       WHERE q_id % {_FORGET_MOD} = {_FORGET_RES}) AS n_tombstoned_lists,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM aff{l}) AS n_affected_lists,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM knn{l} k
       WHERE k.q_id % {_FORGET_MOD} <> {_FORGET_RES}
         AND k.q_id NOT IN (SELECT q_id FROM aff{l})) AS n_kept_rows,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM rb{l} r
       WHERE r.q_id IN (SELECT q_id FROM aff{l})) AS n_repaired_rows,
      (SELECT CAST(COALESCE(bit_xor({h.format(l=l)}), 0) AS BIGINT)
       FROM rb{l}) AS id_checksum,
      (SELECT CAST(COALESCE(SUM(CAST(floor(cosine * 1000000) AS BIGINT)), 0)
                   AS BIGINT) FROM rb{l}) AS val_checksum,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM rb{l}
       WHERE c_id % {_FORGET_MOD} = {_FORGET_RES}) AS n_deleted_refs"""
        for l, _ in layers
    )
    head = _HNSW_BASE_SQL.format(level=_hnsw_level_sql()).lstrip()
    return f"""
    WITH {head}{ctes}
    {body}
    """


@register("ann_index_forget_check", oracle=_forget_oracle)
def ann_index_forget_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RTBF applied to the frozen layered HNSW index, certified: delete
    the forget set (vec_id % 101 == 7) as tombstones — their lists drop
    wholesale — then repair ONLY the affected surviving lists (those
    referencing a deleted neighbor) by re-ranking their frozen-plane
    bucket candidates over survivors. Per layer the row reports the
    frozen/tombstoned/affected census, kept vs repaired row counts, the
    repaired index's content checksums, and n_deleted_refs (deleted ids
    still referenced — 0 by construction AND certified). The ORACLE
    computes a from-scratch rebuild over survivors with the same frozen
    hash family, so hash-green == tombstone+targeted-repair is exactly
    equivalent to rebuilding the index without the forgotten users —
    the incremental==full-run discipline applied to deletion.

    Scale shape: tombstoning is two id-keyed anti/semi joins on the
    persisted graph; repair work is proportional to AFFECTED lists
    (~15% here, ~M x forget-fraction in general), each repaired from its
    ~125-row frozen bucket — never a corpus rebuild. The from-scratch
    comparison side lives only in the oracle."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        lsh_bucket_id,
    )
    from kol_bigdata_realtime_analytics_spark.plans.llm_ops import (
        _HNSW_M,
        _fused_layer_topk,
        _knn_planes,
        _probe_cols,
    )

    base, counts, graph = _hnsw_build(spark, sf_dir)
    qdel = F.col("vec_id") % _FORGET_MOD == _FORGET_RES
    ndel = F.col("neighbor_id") % _FORGET_MOD == _FORGET_RES
    # tombstone census over the frozen graph (one artifact scan)
    frozen = graph.groupBy("level").agg(
        F.countDistinct("vec_id").cast("long").alias("n_frozen_lists")
    )
    tomb = (
        graph.filter(qdel)
        .groupBy("level")
        .agg(F.countDistinct("vec_id").cast("long").alias("n_tombstoned_lists"))
    )
    aff = (
        graph.filter(~qdel & ndel)
        .select("level", "vec_id")
        .distinct()
        .localCheckpoint(eager=True)  # affected lists: ~M x forget-fraction
    )
    aff_n = aff.groupBy("level").agg(
        F.count("*").cast("long").alias("n_affected_lists")
    )
    kept = graph.filter(~qdel).join(aff, ["level", "vec_id"], "left_anti")
    kept_n = kept.groupBy("level").agg(
        F.count("*").cast("long").alias("n_kept_rows")
    )
    # targeted repair: per layer, re-rank the affected lists' frozen-plane
    # bucket candidates over survivors only — all layers fused into ONE
    # cogrouped scoring pass + one window (_fused_layer_topk, r11 opt)
    per_layer = []
    for l, n_l in _hnsw_pop_layers(counts):
        planes_l = _knn_planes(n_l)
        surv = base.filter((F.col("level") >= l) & ~qdel).withColumn(
            "bkt", lsh_bucket_id(F.col("vec"), dim=64, n_planes=planes_l)
        )
        q = (
            surv.join(
                aff.filter(F.col("level") == l).select("vec_id"),
                "vec_id",
                "left_semi",
            )
            .select(
                F.col("vec_id").alias("q_id"),
                F.col("vec").alias("q_vec"),
                F.col("nrm").alias("q_nrm"),
                F.explode(_probe_cols()).alias("probe"),
            )
        )
        c = surv.select(
            F.col("vec_id").alias("c_id"),
            F.col("vec").alias("c_vec"),
            F.col("nrm").alias("c_nrm"),
            F.col("bkt").alias("c_bkt"),
        )
        per_layer.append((l, q, c))
    # pin the repair result ONCE: rep_n, checks and del_refs all read it —
    # unpinned, rep_n re-executed the whole repair lineage a second time
    # (guide §2.4 / PERF §2.2: self-referencing branches re-run lineage;
    # measured 5.9 s -> 4.8 s warm before the fused kernel landed)
    repaired = _fused_layer_topk(per_layer, _HNSW_M).localCheckpoint(eager=True)
    rep_n = repaired.groupBy("level").agg(
        F.count("*").cast("long").alias("n_repaired_rows")
    )
    # kept is a cheap projection of the pinned graph; the union stays lazy
    final = kept.unionByName(repaired)
    from kol_bigdata_realtime_analytics_spark.plans.registry import hash52

    key = F.concat_ws(
        "|", F.col("level"), F.col("vec_id"), F.col("neighbor_id"), F.col("rank")
    )
    checks = (
        final.select(
            "level",
            hash52(key).alias("k"),
            F.floor(F.col("cosine") * 1000000).cast("long").alias("v"),
        )
        .groupBy("level")
        .agg(
            F.expr("bit_xor(k)").cast("long").alias("id_checksum"),
            F.sum("v").cast("long").alias("val_checksum"),
        )
    )
    del_refs = final.filter(ndel).groupBy("level").agg(
        F.count("*").cast("long").alias("n_deleted_refs")
    )
    out = (
        frozen.join(tomb, "level", "left")
        .join(aff_n, "level", "left")
        .join(kept_n, "level", "left")
        .join(rep_n, "level", "left")
        .join(checks, "level", "left")
        .join(del_refs, "level", "left")
    )
    zero = F.lit(0).cast("long")
    return out.select(
        F.col("level").cast("long").alias("level"),
        "n_frozen_lists",
        F.coalesce("n_tombstoned_lists", zero).alias("n_tombstoned_lists"),
        F.coalesce("n_affected_lists", zero).alias("n_affected_lists"),
        F.coalesce("n_kept_rows", zero).alias("n_kept_rows"),
        F.coalesce("n_repaired_rows", zero).alias("n_repaired_rows"),
        F.coalesce("id_checksum", zero).alias("id_checksum"),
        F.coalesce("val_checksum", zero).alias("val_checksum"),
        F.coalesce("n_deleted_refs", zero).alias("n_deleted_refs"),
    )
