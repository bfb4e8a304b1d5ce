"""Deduplication operators for large-scale text pipelines.

Five strategies, all shuffle-bounded and expressed Spark-first:

- exact        : md5 fingerprint -> groupBy. One shuffle on the hash key;
                 at 100 TB the fingerprint (32 bytes) shuffles, never the text.
- minhash_lsh  : shingle -> k minhashes (xxhash64, native) -> b bands ->
                 band-hash bucket join -> candidate pairs -> exact Jaccard
                 verify. Only bucket-mates are paired, so the cross product
                 never materializes; this is the classic MinHash+LSH plan
                 (Broder; Leskovec et al. MMDS ch.3).
- simhash      : 64-bit SimHash (Charikar) from token hashes — near-dup =
                 small Hamming distance; banding on 4x16-bit chunks.
- ngram_jaccard: token-set Jaccard within a blocking key (exact, quadratic
                 within block only — use for small blocks / oracle checks).
- embedding    : cosine near-dup within a blocking key (see similarity.py).

No Python UDFs anywhere — xxhash64 / md5 / array ops are all JVM-native.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.functions.text import doc_fingerprint_md5, tokens

#: Default per-bucket candidate cap for the LSH banding joins. A degenerate
#: hot bucket (boilerplate/templated text hashing identically in some band)
#: otherwise concentrates an O(n²) pair blow-up and an n-element collect_list
#: buffer in ONE task — at 100 TB that is one OOM'ing straggler. Buckets over
#: the cap are skipped (their docs are near-identical boilerplate better
#: handled by exact dedup) and reported by the *_skipped_buckets companions
#: so the truncation is visible, never silent.
DEFAULT_MAX_BUCKET = 10_000


def exact_dedup_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical (normalized) texts: fingerprint, keep_id = min(id), n_copies.

    Scale: one hash-partitioned shuffle on the 128-bit fingerprint — uniform
    keys, no skew. The text column is pruned before the shuffle.
    """
    return (
        df.select(F.col(id_col), doc_fingerprint_md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).cast("long").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>.

    The READABLE/oracle-parity form (DuckDB mirrors it textually). Corpus
    hot paths use shingle_hash_rows instead — this array-lambda build is
    interpreted (not codegen'd) and measured 2-7x slower; see PERF.md §2.8.

    Docs with fewer than n tokens yield an empty array — the guard matters:
    sequence(0, size-n) DESCENDS when size < n (Spark auto-negates the
    step), which would feed slice() a zero start and fail the whole stage.
    CASE only evaluates the taken branch, so short docs never build grams.
    """
    tk = tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(tk) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)))
    return F.when(F.size(tk) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_hash_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    pre_partition: bool = False,
) -> DataFrame:
    """(doc, h) rows: one xxhash64 per word n-gram shingle, NO shingle strings.

    The codegen-friendly shingle path: posexplode tokens -> xxhash64 each
    token -> window `lead()` gathers the next n-1 token hashes -> one
    xxhash64 over the n longs. Every step is whole-stage-codegen'd; the
    array-lambda form (word_shingles + per-shingle concat_ws/slice/md5)
    evaluates interpreted and measured 2-7x slower at sf0.1 (PERF.md §2.8) —
    the same HOF pathology as §2.1, here on the corpus-sized hot path.

    Shuffle tradeoff, explicitly: the lead() window clusters by doc.
    - pre_partition=False (default): the window exchange moves TOKEN rows
      (doc, pos, h0 — 24 bytes/token, ~4x the raw text bytes). Faster on
      local/bench hardware (measured 2.0 s vs 4.2 s at sf0.1).
    - pre_partition=True: hash-repartition the DOC rows first; posexplode
      preserves that partitioning, so the window adds NO exchange and only
      raw text bytes move once. The 100 TB setting: flip this on when the
      token-row exchange (4x corpus) dominates, i.e. whenever the input
      isn't already clustered by doc id (bucketed corpus tables get this
      for free and need neither).

    Emits one row per shingle OCCURRENCE; dedup (distinct / count_distinct)
    is the caller's choice. Docs shorter than n tokens emit nothing
    (lead(n-1) is null), matching word_shingles' empty-array semantics.
    """
    from pyspark.sql.window import Window

    if pre_partition:
        par = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(par, id_col)
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "t"),
    ).select("doc", "pos", F.xxhash64("t").alias("h0"))
    w = Window.partitionBy("doc").orderBy("pos")
    withlead = tok.select(
        "doc", "h0", *[F.lead("h0", k).over(w).alias(f"h{k}") for k in range(1, n)]
    )
    return withlead.filter(F.col(f"h{n-1}").isNotNull()).select(
        "doc", F.xxhash64(*[F.col(f"h{k}") for k in range(n)]).alias("h")
    )


def minhash_signature_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id_col, sig: array<long>) via the codegen'd shingle-hash path.

    Classic MinHash family: per doc, min over its shingles of num_hashes
    independent seeded hashes — the lane-agreement fraction of two
    signatures estimates their shingle-set Jaccard. This is the ONLY
    signature builder: shingle_hash_rows never materializes shingle
    strings and the num_hashes min-aggregations run inside whole-stage
    codegen with map-side combine. (An array-lambda Column form existed
    and was removed: HOF lambdas evaluate interpreted per shingle —
    PERF.md §2.1 — and the 8x scale audit caught the invariant check
    still on it, never finishing 40k docs; this shape signs them in
    seconds.)

    Docs with fewer than shingle_n tokens emit no shingles and are absent
    from the output (minhash of an empty set is undefined) — filter or
    left-join accordingly.
    """
    shingled = shingle_hash_rows(df, text_col, id_col, shingle_n)
    hashed = shingled.select(
        "doc", *[F.xxhash64("h", F.lit(i)).alias(f"h{i}") for i in range(num_hashes)]
    )
    sig = hashed.groupBy("doc").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return sig.select(
        F.col("doc").alias(id_col),
        F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"),
    )


def _minhash_banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc, band, bucket) rows: banded MinHash signatures, one per doc/band."""
    rows_per_band = num_hashes // bands
    # Signatures via shingle-hash rows + flat hash columns + groupBy(min),
    # NOT an array-lambda Column form: higher-order-function
    # lambdas evaluate interpreted, outside whole-stage codegen — measured
    # ~5x slower than this shape, where shingle hashing (shingle_hash_rows,
    # no shingle strings), all num_hashes xxhash64 columns, and the partial
    # min-aggregation are fully codegen'd. min over a shingle MULTISET equals
    # min over the set, so occurrence rows need no dedup. The doc-key shuffle
    # moves only one num_hashes-wide row per doc per partition (map-side
    # combine).
    shingled = shingle_hash_rows(df, text_col, id_col, shingle_n)
    hashed = shingled.select(
        "doc", *[F.xxhash64("h", F.lit(i)).alias(f"h{i}") for i in range(num_hashes)]
    )
    sig = hashed.groupBy("doc").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    # band buckets as flat columns too: band b = xxhash64 over its row slice
    return sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    rows_per_band = num_hashes / bands; two docs collide if ANY band of their
    signatures matches exactly. The bucket join shuffles (band_idx, band_hash)
    — tiny keys — then pairs generate within buckets only.

    Buckets larger than `max_bucket` are SKIPPED (see DEFAULT_MAX_BUCKET):
    the guard is `size(ds) <= max_bucket` applied BETWEEN the bucket
    aggregation and pair generation, so the O(n²) explosion — the actual
    scale-killer: one 10k-doc boilerplate bucket is 50M pairs in one task —
    never materializes. The bucket's doc-id list itself still aggregates
    (8 bytes/doc ≈ 80 MB at 10M ids — survivable; a windowed pre-count that
    also avoids the buffer was measured 60% slower on the whole job, and
    corpora with billion-doc identical text should run exact_dedup first
    anyway, which is the documented pipeline order). Use
    minhash_lsh_skipped_buckets with the same arguments to see exactly what
    was skipped and how big it was.
    """
    banded = _minhash_banded(df, text_col, id_col, num_hashes, bands, shingle_n)
    # Pairs via ONE groupBy on the bucket key instead of a self-join: a
    # self-join would re-execute the whole shingle+signature lineage for both
    # sides (2x the CPU) and shuffle the corpus twice. Here signatures are
    # computed once, the only wide exchange moves (band, bucket, doc) triples,
    # and pairs are generated inside each bucket list — bounded by max_bucket.
    ds = F.array_sort(F.collect_list("doc"))
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("ds")) - 2),
            lambda i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda d: F.struct(
                    F.get(F.col("ds"), i).alias("id_a"), d.alias("id_b")
                ),
            ),
        )
    )
    return (
        banded.groupBy("band", "bucket")
        .agg(ds.alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_bucket))
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def minhash_lsh_skipped_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(band, bucket, bucket_n) for every bucket the candidate join skipped.

    The visibility half of the hot-bucket guard: run alongside
    minhash_lsh_candidates (same args) to count/audit truncation. Plain
    count aggregation — no lists materialize regardless of bucket size.
    """
    banded = _minhash_banded(df, text_col, id_col, num_hashes, bands, shingle_n)
    return (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
    )


def duplicate_clusters(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Near-dup PAIRS -> duplicate CLUSTERS: connected components + canonical.

    Candidate/verify stages emit pairs, but a dedup decision needs the
    transitive closure (near-dup similarity is not transitive — A~B and B~C
    without A~C still must dedup as ONE group, else two passes keep
    different survivors). Components come from iterative min-label
    propagation WITH a pointer-doubling shortcut: every doc starts labeled
    with its own id; each round every doc takes the min over (its label,
    its neighbors' labels, the CURRENT LABEL OF ITS LABEL). The shortcut
    join lets information hop two steps per round, so fixpoint lands in
    O(log diameter) rounds instead of O(diameter) — the property that
    matters at scale, where near-dup graphs can chain (A~B~C~…) through
    template families even though most blobs are dense. Measured at sf0.1:
    5 rounds → 4, 2.46 s → 2.08 s warm (PERF.md §2.9); same fixpoint (min
    label per component) by monotonicity of min under both moves.

    Scale: the iteration runs over EDGE-TOUCHED nodes only — a node with
    no near-dup edge can never change label, so singletons bypass the
    loop entirely and rejoin as size-1 canonical rows afterwards (one
    anti-join, paid once, vs |V| rows shuffled per round). On a real
    corpus the duplicate fraction is the minority (10-30% in published
    web-corpus dedups), so the per-round tables shrink from |V| to
    |V_dup|; measured on a constructed 5%-dup corpus of 2M nodes:
    see PERF.md. Each round is then one equi-join of (node, label) longs
    against the edge list, one groupBy-min, and one self-join of the
    label table — narrow shuffles, no text, no vectors.
    `localCheckpoint` truncates lineage per round so the plan doesn't
    grow with iterations.
    Convergence detection rides the SAME job that materializes the round's
    checkpoint: labels are non-increasing under min-propagation (own label
    is in the min) and the node set is non-shrinking, so (label sum, row
    count) unchanged ⇔ converged — count guards the theoretical round-1
    case where phantom dst nodes add rows whose labels exactly offset
    decreases. Two scalars to the driver per round in one agg, and no
    separate old-vs-new join probe (halves the per-round job count vs
    the naive changed-row check).

    Output: ONE row per input node — (id_col, cluster_id = min INPUT doc id
    in the component, cluster_size = count of input docs in it,
    is_canonical). Edge endpoints absent from `nodes` act as conduits for
    connectivity but never appear in the output or counts; NULL edge
    endpoints are treated as "no edge". Rows to KEEP for training are
    is_canonical = 1 (every cluster has exactly one).
    """
    # NULL endpoints are dropped up front: a NULL-keyed edge can't join to
    # any node (equality semantics) but WOULD emit a garbage (node=NULL,
    # label=x) row from the neighbor join inside the loop — treating it as
    # "no edge" is the only coherent reading (r6 review).
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    sym = sym.localCheckpoint(eager=True)
    # distinct: the pre-bypass form collapsed duplicate node ids as a side
    # effect of the first round's groupBy; the singleton path forwards
    # all_nodes rows verbatim, so the one-row-per-node output contract now
    # needs an explicit dedup (a duplicated untouched id would otherwise
    # emit two identical "canonical" rows and double-keep the doc).
    all_nodes = (
        nodes.select(F.col(id_col).cast("long").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # id contract: ids must be non-null and castable to long. A NULL-cast id
    # would silently route to the singleton path under the plain-equality
    # semi/anti joins below (cluster_id NULL, is_canonical=1) and distinct()
    # collapses ALL such ids into one row — assert instead of guessing
    # (r5 advice). The probe runs on the already-pinned tiny node frame;
    # this operator is eager anyway (per-round convergence scalars).
    if all_nodes.filter(F.col("node").isNull()).limit(1).count():
        raise ValueError(
            f"duplicate_clusters requires non-null, long-castable {id_col!r} "
            "values; found id(s) that cast to NULL"
        )
    # singleton bypass: only edge-touched nodes can ever be relabeled (min
    # over self + neighbors is a no-op without neighbors), so the loop runs
    # over the touched subgraph only; untouched nodes rejoin after the
    # fixpoint as their own size-1 canonical clusters. sym carries both
    # directions, so src alone covers every endpoint. Deliberately NOT
    # distinct'd/pinned: left_semi/left_anti are correct under duplicate
    # right keys, and an eager distinct here is a full O(|E|) shuffle paid
    # before any round — measured +35% on the 8x-scaled embedding pair set,
    # where |E| grows quadratically at pinned n_planes. As a lazy
    # projection of the pinned sym it just feeds each join's exchange.
    touched = sym.select(F.col("src").alias("node"))
    labels_plan = all_nodes.join(touched, "node", "left_semi").select(
        "node", F.col("node").alias("label")
    )
    # Driver union-find short-circuit (r11 opt): when the SYMMETRIZED edge
    # list fits the driver comfortably, the min-label fixpoint is computed
    # with a union-find over the collected edges instead of iterated Spark
    # rounds — each distributed round costs a join + groupBy + checkpoint +
    # convergence collect of pure scheduler overhead on a near-dup edge set
    # that is a tiny fraction of the corpus (64 name-vocab edges in entity
    # resolution; a few hundred near-dup pairs at bench SFs). The fixpoint
    # is the same mathematical object (min input-node id per connected
    # component — unique, engine-independent), so results are identical.
    # This is the production shape too: distributed CC finishes with a
    # single-machine union-find once the edge worklist collapses below
    # memory scale; a 100 TB corpus's edge set exceeds the bound and takes
    # the distributed loop below. Bound parameterised via env; the default
    # (1M symmetrized edge rows) stays far under driver memory. Touched
    # labels are a subset of edge endpoints, so |labels| <= n_sym and
    # 2*n_sym bounds the total collected rows — the distributed loop's
    # bookkeeping (label checkpoint + convergence aggregate) is deferred
    # to its branch so the short-circuit never pays those two jobs.
    import os as _os

    cc_driver_max = int(_os.environ.get("SPARK_GRAFT_CC_DRIVER_MAX_EDGES", "1000000"))
    n_sym = sym.count()  # one tiny job on the already-checkpointed frame
    if 2 * n_sym <= cc_driver_max:
        parent: dict = {}

        def _find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for e in sym.toLocalIterator():  # bounded by cc_driver_max
            ra, rb = _find(e["src"]), _find(e["dst"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp: dict = {}
        members: dict = {}
        for r in labels_plan.collect():  # touched INPUT nodes, <= n_sym
            node = r["node"]
            root = _find(node)
            comp[node] = root
            members.setdefault(root, []).append(node)
        rows = []
        for node, root in comp.items():
            mem = members[root]
            cid = min(mem)
            rows.append((node, cid, len(mem), int(node == cid)))
        clustered = nodes.sparkSession.createDataFrame(
            rows,
            f"{id_col} long, cluster_id long, cluster_size long, is_canonical int",
        )
        singletons = all_nodes.join(touched, "node", "left_anti").select(
            F.col("node").alias(id_col),
            F.col("node").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
            F.lit(1).cast("int").alias("is_canonical"),
        )
        return clustered.unionByName(singletons)
    labels = labels_plan.localCheckpoint(eager=True)
    # decimal(38,0) sum: exact at any node-count * id-magnitude, no overflow.
    # Convergence state is (sum, row count), not sum alone: round 1 can ADD
    # rows for edge endpoints absent from `nodes` (phantom dst nodes), and
    # in theory their added labels could exactly offset label decreases —
    # sum-equal while not at fixpoint (r5 advice). Count rides the same agg
    # job, so the guard is free; labels are non-increasing per node AND the
    # node set is non-shrinking, so (sum, count) unchanged <=> fixpoint.
    row0 = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    label_state = (row0["s"], row0["n"])
    for _ in range(max_iterations if label_state[0] is not None else 0):
        neighbor_labels = sym.join(
            labels, sym["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), F.col("label"))
        propagated = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer-doubling shortcut: if my label node was itself relabeled
        # this (or a prior) round, jump straight to ITS label — two hops of
        # progress per round, O(log diameter) convergence.
        label_of_label = labels.select(
            F.col("node").alias("lab_node"), F.col("label").alias("lab_label")
        )
        new_labels = (
            propagated.join(
                label_of_label, propagated["label"] == label_of_label["lab_node"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("lab_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        row = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        new_state = (row["s"], row["n"])
        labels = new_labels
        if new_state == label_state:
            break
        label_state = new_state
    # Output contract: one row per INPUT node, cluster_id = min REAL doc id
    # in the component, cluster_size = count of REAL docs. Edge endpoints
    # absent from `nodes` (phantoms) are legitimate CONDUITS inside the loop
    # (10—20—21—11 must still merge 10 and 11) but must not leak into the
    # output, inflate sizes, or — when a phantom is the component minimum —
    # steal the canonical slot and leave the cluster with no canonical row
    # (r6 review). The semi-join drops them; cluster_id comes from min(node)
    # over surviving rows, which equals the old min-label whenever endpoints
    # are a subset of nodes (the common case), so this is a pure widening of
    # the contract. Pinned: `real` feeds BOTH the sizes agg and the final
    # join — unpinned, the semi-join would execute twice per action (lazy:
    # the first consumer materializes it, same shape as every other reused
    # frame here).
    real = labels.join(all_nodes, "node", "left_semi").localCheckpoint(eager=False)
    grp = real.groupBy("label").agg(
        F.min("node").alias("cluster_id"), F.count("*").alias("cluster_size")
    )
    clustered = real.join(grp, "label").select(
        F.col("node").alias(id_col),
        "cluster_id",
        "cluster_size",
        (F.col("node") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )
    singletons = all_nodes.join(touched, "node", "left_anti").select(
        F.col("node").alias(id_col),
        F.col("node").alias("cluster_id"),
        F.lit(1).cast("long").alias("cluster_size"),
        F.lit(1).cast("int").alias("is_canonical"),
    )
    return clustered.unionByName(singletons)


def contamination_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any n-gram shingle
    with a held-out eval set (the standard 8-13-gram overlap check every LLM
    training pipeline runs before a corpus ships).

    Scale shape: both sides reduce to (doc, xxhash64-of-shingle) rows via
    shingle_hash_rows — 8-byte keys, no shingle strings ever materialize
    (the md5-of-concat_ws form this replaced was 2-7x slower; PERF.md §2.8).
    The benchmark side is deduped to distinct hashes and is orders of
    magnitude smaller than the corpus, so Spark broadcasts it (eval suites
    are ~1e5-1e6 shingles); the train side then joins map-side —
    contaminated-shingle counting re-groups by doc id only for matched
    rows, a tiny fraction of the corpus. The shared-count is over distinct
    shingles, so it is hash-function-independent and equals the text-level
    oracle count (64-bit collisions: P < 1e-7 at 1e6 shingles).

    Returns (id_col, n_shared_shingles) for contaminated docs only.
    """
    train_sh = shingle_hash_rows(train, text_col, id_col, shingle_n).withColumnRenamed(
        "doc", id_col
    )
    bench_sh = shingle_hash_rows(benchmark, text_col, id_col, shingle_n).select("h").distinct()
    return (
        train_sh.join(bench_sh, "h")
        .groupBy(id_col)
        .agg(F.count_distinct("h").alias("n_shared_shingles"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard >= threshold within blocking-key groups.

    The equi-join on block_cols bounds the pair blow-up; within a block the
    join is a shuffle-hash join on small partitions. For unblocked corpora use
    minhash_lsh_candidates first and verify with this on the candidates only.

    Tokens are pre-hashed to 64-bit longs ONCE per row (O(n) before the
    join), so the per-PAIR array_intersect compares fixed-width longs instead
    of strings — measured 1.7x faster end-to-end at sf0.1 (5.1 s -> 2.9 s
    warm) with identical pair output; union size comes from |a|+|b|-|i| (one
    array pass fewer). Set semantics are exact modulo xxhash64 collisions
    (~n²/2^64 — negligible at any realistic block size).

    Requires 0 < threshold <= 1: the prefix theorem does not hold at
    t <= 0 (a complete t=0 join is every within-block pair — use a plain
    block self-join for that degenerate ask), and docs with EMPTY token
    sets never pair here (their Jaccard to anything is 0 in both forms).

    CANDIDATES BY PREFIX FILTERING (r4): the naive within-block self-join
    is quadratic in block size, and user blocking keys like (lang, source)
    have corpus-PROPORTIONAL blocks — the 8x scale_check measured pairs
    growing ~64x (dedup_clusters 13.6x wall at 8x volume). This is the
    classic exact set-similarity join instead (AllPairs / PPJoin, Bayardo
    et al. WWW'07; Xiao et al. WWW'08): order every doc's tokens by global
    rarity (ascending document frequency); if J(A,B) >= t, A and B MUST
    share a token within their first |s| - ceil(t*|s|) + 1 tokens under
    any shared total order — so candidates are an equi-join on PREFIX
    TOKENS (+ block cols), whose fan-out is posting-list-local (rare
    tokens -> short postings) and grows linearly with the corpus, not
    quadratically with block size. Candidates are then verified with the
    exact Jaccard, so the output pair set is provably identical — the
    all-pairs DuckDB oracle stays hash-exact.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"jaccard_pairs requires 0 < threshold <= 1, got {threshold}")
    # pinned: the corpus scan + tokenize + per-token xxhash64 ran FOUR times
    # inside the ranked frame's lineage (once per tokrows consumer, with no
    # exchange reuse across the DF aggregation and its join probe side —
    # measured in the r12 plan dump); one eager pin makes it ONE scan and
    # one tokenize pass, and every downstream explode re-reads the cached
    # array frame (r12 opt, guide §6 scan reuse / r11 verdict ask #3)
    base = df.select(
        F.col(id_col).alias("doc"),
        *[F.col(c) for c in block_cols],
        F.array_distinct(
            F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
        ).alias("tok"),
    ).localCheckpoint(eager=True)
    tokrows = base.select("doc", *block_cols, F.explode("tok").alias("tk"))
    tokdf = tokrows.groupBy("tk").agg(F.count("*").alias("tdf"))
    # per doc: tokens sorted rarest-first under the global (df, token) order;
    # pinned — it feeds the candidate explode AND both verify sides, and its
    # lineage holds two corpus shuffles (df join + per-doc regroup)
    ranked = (
        tokrows.join(tokdf, "tk")
        .groupBy("doc", *block_cols)
        .agg(F.sort_array(F.collect_list(F.struct("tdf", "tk"))).alias("rtok"))
        .select(
            "doc",
            *block_cols,
            "rtok",
            F.transform(F.col("rtok"), lambda s: s["tk"]).alias("tok"),
        )
        .localCheckpoint(eager=True)
    )
    # Two downward slacks on the threshold before the prefix-length ceil
    # (erring downward only ever LENGTHENS the prefix — extra candidates,
    # removed by the exact verify):
    #  - 5e-7: the FINAL filter accepts round(jac, 6) >= t, so a pair with
    #    exact J within half-a-6dp-ulp BELOW t still passes — the prefix
    #    must be computed for t - 5e-7 so such pairs are complete too
    #    (r4 advice; unreachable at realistic token-set sizes, but now the
    #    "provably identical" claim holds without a caveat);
    #  - 1e-9: the IEEE boundary — t*s can round just ABOVE an exact
    #    integer (0.55*20 = 11.000000000000002), and ceil of that would cut
    #    the prefix one short of the theorem's requirement.
    prefix_len = F.size("tok") - F.ceil(F.size("tok") * (threshold - 5e-7) - 1e-9) + 1
    # df=1 prefix tokens can never match (a SHARED token has df >= 2), so
    # they are dropped from the candidate join — lossless, and on rare-heavy
    # vocabularies it removes most of the exploded posting rows
    cand = ranked.select(
        "doc", *block_cols, F.explode(F.slice("rtok", 1, prefix_len)).alias("p")
    ).filter(F.col("p.tdf") >= 2).select("doc", *block_cols, F.col("p.tk").alias("tk"))
    a, b = cand.alias("a"), cand.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols] + [
        F.col("a.tk") == F.col("b.tk")
    ]
    pairs = (
        a.join(b, cond)
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    va = ranked.select(F.col("doc").alias("id_a"), F.col("tok").alias("tok_a"))
    vb = ranked.select(F.col("doc").alias("id_b"), F.col("tok").alias("tok_b"))
    inter = F.size(F.array_intersect(F.col("tok_a"), F.col("tok_b")))
    union = F.size(F.col("tok_a")) + F.size(F.col("tok_b")) - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


#: SQL rendering of 64-bit SimHash over a token-hash array column.
#: pyspark's F.shiftrightunsigned only takes a Python-int shift, so the
#: per-bit loop must live in SQL where the shift amount can be the lambda
#: variable. Single array traversal: hashes -> 64 bit-count votes -> majority
#: -> packed signed long (bit 63 = Long.MIN_VALUE, written as an expression
#: because the literal overflows the SQL parser).
_SIMHASH_SQL = """
aggregate(
  zip_with(
    aggregate(
      {th}, array_repeat(0L, 64),
      (acc, h) -> zip_with(
        acc,
        transform(sequence(0, 63), i -> shiftrightunsigned(h, i) & 1L),
        (a, b) -> a + b)),
    array({powers}),
    (c, p) -> CASE WHEN c * 2 > {n} THEN p ELSE 0L END),
  0L, (acc, x) -> acc + x)
"""
_POWERS = ", ".join(
    [f"{2**i}L" for i in range(63)] + ["(-9223372036854775807L - 1L)"]
)


def with_simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, sim) — attach the 64-bit SimHash of text_col.

    Flat-column + lane-packed formulation: explode tokens, then pack the 64
    bit-counters into 16 longs of four 16-bit lanes each (bit j rides in
    lane j//16 of column j%16), majority-vote on the unpacked lane counts,
    and pack winners back into one signed long. vs the naive 64-sum version
    this quarters both the aggregate column count (16 sums instead of 64 —
    measured cold 11.3 s -> 9.1 s, warm 3.5 s -> 2.9 s at sf0.1; codegen
    compile is most of the cold delta) and the doc-key shuffle row width.
    Everything stays inside whole-stage codegen — the HOF lambda rendering
    (_SIMHASH_SQL) evaluates interpreted and measured ~3-5x slower.

    Lane counters are exact while a doc has < 65,536 tokens (a 16-bit lane
    carry would corrupt its neighbor); chunk longer docs upstream — at that
    length SimHash over the whole doc is semantically mush anyway.
    Zero-token docs drop out (they can't collide). Bit-identical to the
    64-sum and lambda forms (unit tests assert exact signature values).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("txt"))
        .repartition(par)
        .select("doc", F.explode(tokens(F.col("txt"))).alias("t"))
        .select("doc", F.xxhash64("t").alias("h"))
    )

    def lane(j: int):
        bit = lambda i: F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))  # noqa: E731
        return (
            bit(j)
            + F.shiftleft(bit(j + 16), 16)
            + F.shiftleft(bit(j + 32), 32)
            + F.shiftleft(bit(j + 48), 48)
        ).alias(f"L{j}")

    lanes = tok.select("doc", *[lane(j) for j in range(16)])
    votes = lanes.groupBy("doc").agg(
        F.count("*").alias("n"), *[F.sum(f"L{j}").alias(f"S{j}") for j in range(16)]
    )
    powers = [1 << i for i in range(63)] + [-(1 << 63)]
    packed = None
    for i in range(64):
        j, k = i % 16, i // 16
        cnt = F.shiftrightunsigned(F.col(f"S{j}"), 16 * k).bitwiseAND(F.lit(0xFFFF))
        term = F.when(cnt * 2 > F.col("n"), F.lit(powers[i])).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select("doc", packed.cast("long").alias("sim"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs = bit_count(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))


def _simhash_banded(
    df: DataFrame, text_col: str, id_col: str, sig: DataFrame | None = None
) -> DataFrame:
    """(doc, sim, chunk_idx, chunk) rows: 4x16-bit chunk banding of SimHash.

    Pass a precomputed (doc, sim) frame as `sig` to band without
    recomputing signatures (e.g. when a checker already built them)."""
    sh = sig if sig is not None else with_simhash(df, text_col, id_col)
    # 16-bit chunk extraction via unsigned shift + mask (always non-negative)
    chunks = F.array(
        *[F.shiftrightunsigned(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)]
    )
    return sh.select(
        "doc",
        "sim",
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split 64 bits into 4x16-bit chunks;
    pairs within max_hamming differ in <= max_hamming bits so at least one
    chunk matches exactly (pigeonhole) -> bucket join on (chunk_idx, chunk).

    Hot-bucket guard as in minhash_lsh_candidates: `size(ds) <= max_bucket`
    between aggregation and pair generation stops the O(n²) blow-up;
    simhash_skipped_buckets reports what was skipped.
    """
    banded = _simhash_banded(df, text_col, id_col, sig=sig)
    # one groupBy on the chunk key instead of a self-join (which would run
    # the whole simhash lineage twice and shuffle it twice); pairs generate
    # inside each bucket list — see minhash_lsh_candidates for the rationale
    ds = F.array_sort(F.collect_list(F.struct("doc", "sim")))
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("ds")) - 2),
            lambda i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda x: F.struct(F.get(F.col("ds"), i).alias("a"), x.alias("b")),
            ),
        )
    )
    return (
        banded.groupBy("chunk_idx", "chunk")
        .agg(ds.alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_bucket))
        .select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a.doc").alias("id_a"),
            F.col("p.b.doc").alias("id_b"),
            hamming64(F.col("p.a.sim"), F.col("p.b.sim")).alias("hamming"),
        )
        # hamming filter BEFORE the distinct: the dedup shuffle then carries
        # only true near-pairs, not every banding candidate — on corpora with
        # heavy shared vocabulary the candidate:near ratio is large and this
        # is the difference between shuffling the near-dup set and shuffling
        # the whole collision space (hamming is a pure pair function, so
        # filter/distinct commute; 3.71 -> 3.49 s at sf0.1).
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_skipped_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(chunk_idx, chunk, bucket_n) for buckets simhash_neardup_pairs skipped."""
    banded = _simhash_banded(df, text_col, id_col)
    return (
        banded.groupBy("chunk_idx", "chunk")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
    )


# ---------------------------------------------------------------------------
# PORTABLE-hash fuzzy-dedup family: the same MinHash-LSH / SimHash banding
# pipelines, but every hash is derivable in ANSI SQL from literals — md5
# (via the registry's 52-bit hash52 idiom) for base hashes, literal LCG
# (a*h + b) mod 2^52 universal-hash lanes for the MinHash family, plain
# bit arithmetic for SimHash. A DuckDB oracle can therefore re-derive the
# ENTIRE candidate set bit-for-bit (the knn_graph_build literal-plane
# discipline, r9), where the xxhash64 pipelines above are engine-hashed
# and only rows-only checkable. The xxhash64 forms remain the raw-
# throughput default for library callers; the portable forms are what the
# registered, hash-certified queries run, and their per-doc work is the
# same shape (one md5 per token + per shingle replaces one xxhash64 each;
# the 32 signature lanes are 3 integer ops each instead of 32 xxhash64s).
# Mirrors reference MinHash/SimHash dedup semantics (see SURVEY.md §2 LLM
# ops); reference has no cross-engine-certified variant.
# ---------------------------------------------------------------------------

#: modulus of the portable 52-bit hash domain (exact in BIGINT and DOUBLE)
HASH52_MOD = 1 << 52


def minhash_lane_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Literal (a, b) pairs for the universal-hash lanes l_i = (a_i*h + b_i)
    mod 2^52. Same LCG discipline as _seeded_planes: pure-Python, seeded,
    reproducible anywhere, embedded as literals in BOTH engines. `a` is odd
    and < 2^11 so a*h + b < 2^63 — no BIGINT overflow in either engine
    (DuckDB raises on overflow; Spark would silently wrap)."""
    state = seed
    out = []
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = ((state >> 20) % 1024) * 2 + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state % HASH52_MOD
        out.append((a, b))
    return out


def _hash52_col(col: Column) -> Column:
    """52-bit md5-prefix hash of a column cast to string — the engine half
    of the registry's hash52/sql_hash52 pair, inlined here so the operator
    layer doesn't import the plans package."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("long")


def minhash_portable_banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc, band, bucket) rows from the PORTABLE MinHash family.

    Pipeline (each step oracle-derivable):
      token hash   h0 = hash52(token)
      shingle hash hs = hash52(h0 || '|' || h1 || ... )   (lead() window)
      lane i       l_i = (a_i*hs + b_i) mod 2^52          (literal LCG)
      signature    sig_i = min over shingles of l_i
      band bucket  hash52(l_{b*r} || '|' || ... || l_{b*r+r-1})

    Same scale shape as _minhash_banded: shingles never materialize as
    strings (only the n token-hash longs ride the lead() window), the
    num_hashes min-aggregations run codegen'd with map-side combine, and
    the doc-key shuffle moves one num_hashes-wide row per doc/partition.
    """
    from pyspark.sql.window import Window

    rows_per_band = num_hashes // bands
    lanes = minhash_lane_params(num_hashes)
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "t"),
    ).select("doc", "pos", _hash52_col(F.col("t")).alias("g0"))
    w = Window.partitionBy("doc").orderBy("pos")
    gcols = [F.col("g0")] + [
        F.lead("g0", i).over(w).alias(f"g{i}") for i in range(1, shingle_n)
    ]
    sh = (
        tok.select("doc", *gcols)
        .filter(F.col(f"g{shingle_n - 1}").isNotNull())
        .select(
            "doc",
            _hash52_col(
                F.concat_ws(
                    "|", *[F.col(f"g{i}").cast("string") for i in range(shingle_n)]
                )
            ).alias("hs"),
        )
    )
    lane_cols = [
        ((F.lit(a) * F.col("hs") + F.lit(b)) % F.lit(HASH52_MOD)).alias(f"l{i}")
        for i, (a, b) in enumerate(lanes)
    ]
    sig = (
        sh.select("doc", *lane_cols)
        .groupBy("doc")
        .agg(*[F.min(f"l{i}").alias(f"l{i}") for i in range(num_hashes)])
    )
    return sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _hash52_col(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"l{i}").cast("string")
                                    for i in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded MinHash-LSH candidate pairs (id_a < id_b), portable family.

    Identical candidate semantics and scale shape to minhash_lsh_candidates
    (one groupBy on the bucket key, in-bucket pair expansion, max_bucket
    guard) — only the hash family differs, which is what lets a DuckDB
    oracle re-derive the full pair set for a value-hash check."""
    banded = minhash_portable_banded(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    ds = F.array_sort(F.collect_list("doc"))
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("ds")) - 2),
            lambda i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda d: F.struct(
                    F.get(F.col("ds"), i).alias("id_a"), d.alias("id_b")
                ),
            ),
        )
    )
    return (
        banded.groupBy("band", "bucket")
        .agg(ds.alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_bucket))
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


#: SimHash-portable signature width: hash52 yields 52 base bits, banded as
#: 4 x 13-bit chunks (pigeonhole: hamming <= 3 => some chunk equal).
SIMHASH_PORTABLE_BITS = 52


def simhash_portable_signature(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, sim) 52-bit portable SimHash signatures.

    Same packed-lane majority-vote build as with_simhash — 13 lanes each
    packing 4 bit-counters at 16-bit offsets, so the per-doc aggregation
    state is 13 longs + n, all codegen'd — but over hash52 token hashes,
    which a DuckDB oracle reproduces with md5 + bit arithmetic. Packed
    16-bit counters require < 32768 tokens/doc (same contract as
    with_simhash; the corpus maxes out far below)."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).select("doc", _hash52_col(F.col("t")).alias("h"))

    def lane(j: int):
        bit = lambda i: F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))  # noqa: E731
        return (
            bit(j)
            + F.shiftleft(bit(j + 13), 16)
            + F.shiftleft(bit(j + 26), 32)
            + F.shiftleft(bit(j + 39), 48)
        ).alias(f"L{j}")

    lanes = tok.select("doc", *[lane(j) for j in range(13)])
    votes = lanes.groupBy("doc").agg(
        F.count("*").alias("n"), *[F.sum(f"L{j}").alias(f"S{j}") for j in range(13)]
    )
    packed = None
    for i in range(SIMHASH_PORTABLE_BITS):
        j, k = i % 13, i // 13
        cnt = F.shiftrightunsigned(F.col(f"S{j}"), 16 * k).bitwiseAND(F.lit(0xFFFF))
        term = F.when(cnt * 2 > F.col("n"), F.lit(1 << i)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select("doc", packed.cast("long").alias("sim"))


def simhash_neardup_pairs_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """SimHash near-dup pairs (hamming <= max_hamming), portable family.

    4 x 13-bit chunk banding over the 52-bit portable signature; pair
    generation, hot-bucket guard, and the hamming-before-distinct ordering
    all match simhash_neardup_pairs. hamming is BIGINT for oracle parity."""
    sh = simhash_portable_signature(df, text_col, id_col)
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("sim"), 13 * i).bitwiseAND(F.lit(0x1FFF))
            for i in range(4)
        ]
    )
    banded = sh.select(
        "doc", "sim", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    ds = F.array_sort(F.collect_list(F.struct("doc", "sim")))
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("ds")) - 2),
            lambda i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda x: F.struct(F.get(F.col("ds"), i).alias("a"), x.alias("b")),
            ),
        )
    )
    return (
        banded.groupBy("chunk_idx", "chunk")
        .agg(ds.alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_bucket))
        .select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a.doc").alias("id_a"),
            F.col("p.b.doc").alias("id_b"),
            hamming64(F.col("p.a.sim"), F.col("p.b.sim")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
