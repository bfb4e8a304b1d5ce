"""Operator tests: dedup family, similarity search, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kol_bigdata_realtime_analytics_spark.operators.dedup import (
    exact_dedup_fingerprints,
    jaccard_pairs,
    minhash_lsh_candidates,
    simhash_neardup_pairs,
    with_simhash,
    word_shingles,
)
from kol_bigdata_realtime_analytics_spark.operators.multimodal import (
    decode_features,
    with_binary_payload,
)
from kol_bigdata_realtime_analytics_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    lsh_neardup_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank", "en", "a"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend", "en", "a"),  # near-dup of 1
    (3, "completely different text about spark query engines and shuffles", "en", "a"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank", "en", "a"),  # exact dup of 1
    (5, "  The  quick brown fox jumps over the lazy dog near the river bank ", "en", "a"),  # ws/case-normalized dup of 1
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string, source string")


def test_exact_dedup_groups_normalized_dups(spark, docs_df):
    out = exact_dedup_fingerprints(docs_df, "text", "doc_id").collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[1] == 3  # docs 1, 4, 5 share a normalized fingerprint
    assert groups[2] == 1 and groups[3] == 1


def test_jaccard_finds_near_dup(spark, docs_df):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(
        docs_df, "text", "doc_id", ["lang", "source"], threshold=0.5
    ).collect()}
    assert pairs[(1, 2)] > 0.8  # 12 shared tokens of 13
    assert pairs[(1, 4)] == 1.0
    assert (1, 3) not in pairs


def test_jaccard_prefix_filter_complete_vs_bruteforce(spark):
    """The prefix-filter join returns EXACTLY the brute-force pair set on
    adversarial pseudo-random docs: Zipf-skewed vocabulary (hot tokens ->
    long postings), doc lengths 1..40 (prefix-length edge cases incl.
    single-token docs), and thresholds 0.3/0.5/0.8 (prefix share shrinks
    as t grows — completeness must hold at every t)."""

    def lcg(state):
        while True:
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            yield state >> 33

    rng = lcg(7)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(120):
        n = 1 + next(rng) % 40
        # Zipf-ish: token index skewed toward the low ids
        toks = [vocab[(next(rng) % 60) * (next(rng) % 60) // 60] for _ in range(n)]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "blk", F.lit(1)
    )

    def brute(threshold):
        sets = {i: set(t.split()) for i, t in docs}
        out = set()
        for a in range(120):
            for b in range(a + 1, 120):
                u = sets[a] | sets[b]
                if u and len(sets[a] & sets[b]) / len(u) >= threshold:
                    out.add((a, b))
        return out

    # 0.55 exercises the IEEE prefix-length boundary: 0.55 * 20 rounds to
    # 11.000000000000002, whose unguarded ceil shortens the prefix below
    # the completeness requirement (the epsilon in jaccard_pairs fixes it)
    for t in (0.3, 0.5, 0.55, 0.8):
        got = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs(df, "text", "doc_id", ["blk"], threshold=t).collect()
        }
        assert got == brute(t), f"pair set mismatch at threshold {t}"


def test_minhash_lsh_finds_planted_dups(spark, docs_df):
    cand = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs_df, "text", "doc_id").collect()}
    assert (1, 2) in cand  # near-dup must collide in some band
    assert (1, 4) in cand  # identical text -> identical signature
    assert (1, 3) not in cand  # unrelated text should not collide


def test_simhash_identical_and_near(spark, docs_df):
    sims = {r["doc"]: r["sim"] for r in with_simhash(docs_df, "text", "doc_id").collect()}
    assert sims[1] == sims[4]  # exact same tokens -> same simhash

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # near-dup (1 token of 13 changed) must be closer than unrelated text;
    # short docs flip several bits per edit, so no absolute threshold here
    assert hamming(sims[1], sims[2]) < hamming(sims[1], sims[3])

    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_neardup_pairs(
        docs_df, "text", "doc_id", max_hamming=10
    ).collect()}
    assert pairs[(1, 4)] == 0  # exact dups collide in every chunk


def test_chunk_documents_overlap_and_edges(spark):
    """Chunk fan-out: full coverage, overlap attested twice, tiny docs one
    chunk, empty docs none."""
    from kol_bigdata_realtime_analytics_spark.functions.text import chunk_documents

    long_text = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, long_text), (2, "a b c"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=10, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}  # blank/null docs emit nothing
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # 25 tokens, chunk 10, step 8 -> ceil(23/8) = 3 chunks: [0:10),[8:18),[16:25)
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    assert c1[0]["chunk_text"].split() == [f"t{i}" for i in range(10)]
    assert c1[1]["chunk_text"].split() == [f"t{i}" for i in range(8, 18)]
    assert c1[2]["chunk_text"].split() == [f"t{i}" for i in range(16, 25)]
    assert c1[2]["chunk_tokens"] == 9  # final partial chunk
    # overlap: last 2 tokens of chunk 0 reappear at the start of chunk 1
    assert c1[0]["chunk_text"].split()[-2:] == c1[1]["chunk_text"].split()[:2]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=10, overlap=10)


def test_duplicate_clusters_transitive_closure(spark):
    """A~B and B~C without an A~C edge must still land in ONE cluster
    (transitive closure); canonical = min id; singletons stay alone."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 7, 9, 10)], "doc_id long")
    # chain 1-2-3, pair 9-10, singleton 7
    edges = spark.createDataFrame([(1, 2), (2, 3), (9, 10)], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in duplicate_clusters(nodes, edges).collect()}
    assert {d: r["cluster_id"] for d, r in out.items()} == {
        1: 1, 2: 1, 3: 1, 7: 7, 9: 9, 10: 9
    }
    assert out[1]["cluster_size"] == 3 and out[9]["cluster_size"] == 2
    assert out[7]["cluster_size"] == 1 and out[7]["is_canonical"] == 1
    assert [out[d]["is_canonical"] for d in (1, 2, 3)] == [1, 0, 0]
    # long chain: diameter > 1 iteration (propagation must iterate)
    chain_nodes = spark.createDataFrame([(i,) for i in range(20, 30)], "doc_id long")
    chain_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20, 29)], "id_a long, id_b long"
    )
    chain = duplicate_clusters(chain_nodes, chain_edges).collect()
    assert {r["cluster_id"] for r in chain} == {20}
    assert all(r["cluster_size"] == 10 for r in chain)


def test_lsh_hot_bucket_guard(spark):
    """A planted degenerate bucket (500 identical boilerplate docs) must not
    blow up the pair join: its buckets are skipped, reported with counts, and
    genuine near-dups outside the hot bucket are still found."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import (
        minhash_lsh_skipped_buckets,
        simhash_neardup_pairs,
        simhash_skipped_buckets,
    )

    boiler = "subscribe to our newsletter for daily updates and exclusive offers today"
    rows = [(i, boiler) for i in range(500)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1001, "the quick brown fox jumps over the lazy dog near the river bend"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(df, "text", "doc_id", max_bucket=100).collect()
    }
    assert (1000, 1001) in cand  # genuine near-dup survives the guard
    assert not any(a < 500 and b < 500 for a, b in cand)  # hot bucket skipped

    skipped = minhash_lsh_skipped_buckets(df, "text", "doc_id", max_bucket=100).collect()
    assert len(skipped) == 8  # identical docs collide in every band
    assert all(r["bucket_n"] == 500 for r in skipped)

    sim_pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(
            df, "text", "doc_id", max_hamming=10, max_bucket=100
        ).collect()
    }
    assert not any(a < 500 and b < 500 for a, b in sim_pairs)
    sim_skipped = simhash_skipped_buckets(df, "text", "doc_id", max_bucket=100).collect()
    assert len(sim_skipped) == 4 and all(r["bucket_n"] == 500 for r in sim_skipped)

    # without the guard the same corpus yields the full O(n^2) hot-bucket
    # pair set — the guard is the only thing between this plan and ~125k pairs
    unguarded = minhash_lsh_candidates(df, "text", "doc_id").count()
    assert unguarded > 100_000


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    out = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
    assert out == ["a b c", "b c d"]


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [0.999, 0.001, 0.0, 0.0], 0),  # near-dup of 0
    (2, [0.0, 1.0, 0.0, 0.0], 0),
    (3, [0.0, 0.0, 1.0, 0.0], 1),
    (4, [0.0, 0.0, 0.999, 0.001], 1),  # near-dup of 3
]


@pytest.fixture(scope="module")
def vecs_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk(spark, vecs_df):
    out = brute_force_topk(vecs_df, vecs_df.filter(F.col("vec_id") == 0), k=2).collect()
    ranked = [(r["c_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0][0] == 1  # nearest neighbour of 0 is 1
    assert out[0]["cosine"] <= 1.0


def test_cosine_neardup_blocked(spark, vecs_df):
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(vecs_df, threshold=0.95).collect()}
    assert pairs == {(0, 1), (3, 4)}  # blocking by label keeps only same-label pairs


def test_lsh_neardup_agrees_with_exact(spark, vecs_df):
    got = {(r["id_a"], r["id_b"]) for r in lsh_neardup_pairs(vecs_df, dim=4, threshold=0.95).collect()}
    # LSH may drop pairs (probabilistic) but must not invent them
    assert got <= {(0, 1), (3, 4)}
    assert (0, 1) in got  # sign-pattern of near-identical vectors matches


def test_multimodal_decode_schema_and_values(spark, docs_df):
    out = decode_features(with_binary_payload(docs_df, "text", "doc_id")).collect()
    by_id = {r["doc_id"]: r for r in out}
    expected_len = len(DOCS[0][1].encode())
    assert by_id[1]["byte_len"] == expected_len
    assert by_id[1]["width"] == expected_len % 640
    assert by_id[1]["height"] == (expected_len * 7) % 480
    assert set(out[0].asDict()) == {"doc_id", "byte_len", "width", "height", "n_frames"}


def test_ivf_topk_recall_on_testdata(spark, sf_small):
    """IVF probe-2-of-8 must recover most of the exact top-3 (recall@3 bound)."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import ivf_topk
    from kol_bigdata_realtime_analytics_spark.plans.registry import table

    emb = table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r["q_id"], r["c_id"]) for r in brute_force_topk(emb, queries, k=3).collect()}
    approx = {(r["q_id"], r["c_id"]) for r in ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2).collect()}
    assert len(approx & exact) / len(exact) >= 0.2  # random-ish vectors; probing 1/4 of lists
    # every query must still return a full top-k (lists are non-empty)
    per_q = {}
    for q, _ in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(v == 3 for v in per_q.values())


def test_ivf_kmeans_recall_on_clustered_data(spark):
    """On CLUSTERED embeddings the k-means quantizer must recover nearly all
    of the exact top-3 with probe 2-of-4.

    The data is adversarial for the old lowest-id stand-in: the 8 lowest ids
    all sit in cluster 0, so id-based 'centroids' would put every coarse
    cell in one corner of the space and probing would prune the true
    neighbours of queries from the other three clusters (recall collapses).
    Sampled spherical k-means must place centroids in every cluster."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    dim = 8
    centers = []
    for c in range(4):
        v = [0.05] * dim
        v[2 * c] = 1.0
        v[2 * c + 1] = 0.6
        centers.append(v)
    rows = []
    vid = 0
    # ids 0..19 ALL in cluster 0 (the stand-in's trap), then round-robin
    for _ in range(20):
        base = centers[0]
        rows.append((vid, [x + 0.01 * ((vid * 7 + i) % 5) for i, x in enumerate(base)]))
        vid += 1
    for j in range(60):
        base = centers[1 + j % 3]
        rows.append((vid, [x + 0.01 * ((vid * 7 + i) % 5) for i, x in enumerate(base)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # centroids must cover all four clusters, not just cluster 0
    cents = kmeans_centroids(emb, n_centroids=4, sample_size=80)
    cluster_of = [max(range(4), key=lambda c: sum(a * b for a, b in zip(cent, centers[c])))
                  for cent in cents]
    assert set(cluster_of) == {0, 1, 2, 3}

    queries = emb.filter(F.col("vec_id").isin([0, 25, 45, 70]))
    exact = {(r["q_id"], r["c_id"]) for r in brute_force_topk(emb, queries, k=3).collect()}
    approx = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=2).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.9


def test_pq_adc_recall_on_clustered_data(spark):
    """On clustered embeddings PQ-ADC (2 subspaces x 4 centroids) must rank
    the query's OWN cluster on top: every approximate top-3 hit comes from
    the query's cluster (ids ≡ q mod 4). Within-cluster fine ordering is
    exactly what quantization discards (same codes -> tied scores, id
    tie-break), so the assertion is coarse membership, not pair equality —
    a collapsed codebook scores all clusters identically and fails it."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
    )

    dim = 8
    centers = []
    for c in range(4):
        v = [0.05] * dim
        v[2 * c] = 1.0
        v[2 * c + 1] = 0.6
        centers.append(v)
    rows = []
    vid = 0
    for j in range(80):
        base = centers[j % 4]
        rows.append((vid, [x + 0.01 * ((vid * 7 + i) % 5) for i, x in enumerate(base)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = pq_codebooks(emb, m=2, ksub=4, sample_size=80)
    assert len(books) == 2 and all(len(b) == 4 for b in books)

    queries = emb.filter(F.col("vec_id").isin([0, 1, 2, 3]))
    approx = [
        (r["q_id"], r["c_id"])
        for r in pq_adc_topk(emb, queries, k=3, m=2, ksub=4, sample_size=80).collect()
    ]
    assert len(approx) == 12  # full top-3 for each of 4 queries
    assert all(c % 4 == q % 4 for q, c in approx)


def test_opq_rotation_orthonormal_and_balanced():
    """The OPQ rotation is orthonormal (pure rotation — cosine-preserving)
    and its eigenvalue-BALANCED allocation separates the two high-variance
    directions into different subspaces, where pure PCA would stack them
    into the first (the concentration failure mode the registered
    distortion check pins end-to-end)."""
    import numpy as np

    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        opq_rotation,
    )

    rng_ids = np.arange(512)
    dim, m = 16, 8
    u = ((rng_ids * 13) % 97) / 97.0 * 8 - 4
    v = ((rng_ids * 29) % 89) / 89.0 * 8 - 4
    jit = np.array(
        [[(((i * 7 + j * 31) % 53) / 53.0 - 0.5) for j in range(dim)] for i in rng_ids]
    )
    X = 0.1 * jit
    X[:, 0] += u
    X[:, 1] += v
    R = np.array(opq_rotation(None, m=m, sample=X, cache_key=None))
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-9)
    # the two dominant principal directions (~axes 0 and 1) must land in
    # DIFFERENT subspaces: per subspace, the rotated variance concentrates
    # in at most one of them
    Z = X @ R.T
    var = Z.var(axis=0)
    dsub = dim // m
    heavy_per_sub = [
        int((var[s * dsub : (s + 1) * dsub] > 1.0).sum()) for s in range(m)
    ]
    assert max(heavy_per_sub) == 1 and sum(heavy_per_sub) == 2


def test_opq_topk_contract_and_clustered_recall(spark):
    """opq_topk returns a full top-3 per query with the brute-force output
    contract, and on clustered data a 2/3 majority of hits comes from the
    query's own cluster (deterministic: measured 8/12). This axis-aligned
    fixture is plain-PQ-FRIENDLY — raw subspaces coincide with cluster
    axes — so OPQ's rotation costs a little coarse membership here; OPQ's
    win case (anisotropic variance) is pinned end-to-end by the registered
    hash-green ann_opq_distortion_check instead. A scrambled/non-orthogonal
    rotation collapses this to chance (3/12)."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        opq_topk,
    )

    dim = 8
    centers = []
    for c in range(4):
        v = [0.05] * dim
        v[2 * c] = 1.0
        v[2 * c + 1] = 0.6
        centers.append(v)
    rows = []
    for vid in range(80):
        base = centers[vid % 4]
        rows.append(
            (vid, [x + 0.01 * ((vid * 7 + i) % 5) for i, x in enumerate(base)])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2, 3]))
    out = opq_topk(emb, queries, k=3, m=2, ksub=4, sample_size=80).collect()
    assert len(out) == 12
    assert all(
        set(r.asDict()) == {"q_id", "c_id", "cosine", "rank"} for r in out
    )
    in_cluster = sum(1 for r in out if r["c_id"] % 4 == r["q_id"] % 4)
    assert in_cluster >= 8, f"in-cluster hits {in_cluster}/12"


def test_pq_encode_deterministic_and_full_topk(spark, sf_small):
    """Encoding is stable across runs/partitionings and every query gets a
    full top-k on TESTDATA (codes cover the corpus — no empty result sets)."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode_udf,
    )
    from kol_bigdata_realtime_analytics_spark.plans.registry import table

    emb = table(spark, sf_small, "embeddings")
    books = pq_codebooks(emb, m=8, ksub=16)
    enc = pq_encode_udf(books)
    a = {r["vec_id"]: r["c"] for r in emb.select("vec_id", enc(F.col("embedding")).alias("c")).collect()}
    b = {
        r["vec_id"]: r["c"]
        for r in emb.repartition(7)
        .select("vec_id", enc(F.col("embedding")).alias("c"))
        .collect()
    }
    assert a == b
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in a.values())

    queries = emb.filter(F.col("vec_id") < 5)
    out = pq_adc_topk(emb, queries, k=3).collect()
    per_q = {}
    for r in out:
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert all(v == 3 for v in per_q.values()) and len(per_q) == 5


def test_ivfpq_topk_clustered_and_contract(spark):
    """IVF-PQ on clustered data: full top-3 per query, every hit from the
    query's own cluster (coarse probe finds the right list, ADC ranks
    inside it); on TESTDATA every query still gets a full top-k."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import ivfpq_topk

    dim = 8
    centers = []
    for c in range(4):
        v = [0.05] * dim
        v[2 * c] = 1.0
        v[2 * c + 1] = 0.6
        centers.append(v)
    rows = []
    for vid in range(80):
        base = centers[vid % 4]
        rows.append((vid, [x + 0.01 * ((vid * 7 + i) % 5) for i, x in enumerate(base)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2, 3]))
    got = [
        (r["q_id"], r["c_id"])
        for r in ivfpq_topk(
            emb, queries, k=3, n_centroids=4, n_probe=1, m=2, ksub=4, sample_size=80
        ).collect()
    ]
    assert len(got) == 12
    assert all(c % 4 == q % 4 for q, c in got)


def test_pq_adc_clamped_codebook_tiny_corpus(spark):
    """Fewer vectors than ksub: pq_codebooks clamps k = min(ksub, sample);
    the ADC payload must size its LUTs/offsets from the FITTED tensor, not
    the ksub parameter (regression: mismatched flat offsets crashed)."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        ivfpq_topk,
        pq_adc_topk,
    )

    rows = [(i, [0.1 * ((i * 7 + j) % 5) + 0.01 for j in range(8)]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 2)
    out = pq_adc_topk(emb, queries, k=2, m=2, ksub=16, sample_size=6).collect()
    assert len(out) == 4  # full top-2 per query despite k_eff = 6 < ksub
    out2 = ivfpq_topk(
        emb, queries, k=2, n_centroids=2, n_probe=2, m=2, ksub=16, sample_size=6
    ).collect()
    assert len(out2) == 4


def test_ivfpq_residual_distortion_beats_plain(spark):
    """IVFADC's structural property: with cluster centers spread in every
    coordinate and ksub SMALLER than the cluster count, plain PQ must merge
    cluster centers into shared codes (distortion ~ inter-center distance)
    while residual PQ only has to quantize the small per-id jitter (plus
    whatever bimodality a merged coarse list leaves) — measured 0.50 vs
    5.0, a structural ~10x gap, asserted at 5x for margin."""
    import numpy as np

    from kol_bigdata_realtime_analytics_spark.operators import similarity as S

    dim, ncl = 16, 8
    emb = spark.range(512).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), i -> "
            f"CAST(((id % {ncl}) * 31 + i * 17) % 7 AS DOUBLE) - 3.0d"
            f" + 0.05d * CAST((id * 13 + i * 29) % 97 AS DOUBLE) / 97.0d)"
        ).alias("embedding"),
    )
    X = S.hash_sample(emb, sample_size=512)
    coarse = S.kmeans_centroids(emb, n_centroids=ncl, sample_size=512, sample=X)
    bp = np.array(S.pq_codebooks(emb, m=8, ksub=4, sample_size=512, sample=X))
    br = np.array(
        S.pq_residual_codebooks(emb, coarse, m=8, ksub=4, sample_size=512, sample=X)
    )

    def mean_err(X0, B):
        m, _, dsub = B.shape
        err = np.zeros(len(X0))
        for s in range(m):
            Xs = X0[:, s * dsub : (s + 1) * dsub]
            err += ((Xs[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2).min(axis=1)
        return float(err.mean())

    anchors = S.coarse_anchors(X, coarse)
    plain_err = mean_err(X, bp)
    resid_err = mean_err(X - anchors[S._coarse_assign(X, coarse)], br)
    assert resid_err < plain_err / 5


def test_ivfpq_residual_topk_contract_and_recall(spark):
    """residual=True keeps the output contract (full top-k per query) and,
    on the cluster-spread fixture, beats the plain form's recall@3 (the
    registered invariant ann_ivfpq_residual_recall_check certifies the
    same property in the driver hash)."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    dim, ncl = 16, 8
    emb = spark.range(512).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), i -> "
            f"CAST(((id % {ncl}) * 31 + i * 17) % 7 AS DOUBLE) - 3.0d"
            f" + 0.05d * CAST((id * 13 + i * 29) % 97 AS DOUBLE) / 97.0d)"
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < ncl)
    exact = set(
        (r["q_id"], r["c_id"]) for r in brute_force_topk(emb, queries, k=3).collect()
    )
    kw = dict(k=3, n_centroids=ncl, n_probe=2, m=8, ksub=16, sample_size=512)
    res_rows = ivfpq_topk(emb, queries, residual=True, **kw).collect()
    per_q = {}
    for r in res_rows:
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert all(v == 3 for v in per_q.values()) and len(per_q) == ncl
    res = set((r["q_id"], r["c_id"]) for r in res_rows)
    plain = set(
        (r["q_id"], r["c_id"]) for r in ivfpq_topk(emb, queries, **kw).collect()
    )
    assert len(exact & res) > len(exact & plain)  # measured 16/24 vs 12/24


def test_ivfpq_topk_full_topk_on_testdata(spark, sf_small):
    from kol_bigdata_realtime_analytics_spark.operators.similarity import ivfpq_topk
    from kol_bigdata_realtime_analytics_spark.plans.registry import table

    emb = table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivfpq_topk(emb, queries, k=3, n_centroids=8, n_probe=2).collect()
    per_q = {}
    for r in out:
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert all(v == 3 for v in per_q.values()) and len(per_q) == 5


def test_approx_percentiles_bounded_error(spark, sf_oracle):
    """approx_percentile (sketch scale path) stays within 1% of exact."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    exact = {r["event_type"]: r for r in REGISTRY["value_percentiles"].fn(spark, sf_oracle).collect()}
    approx = {r["event_type"]: r for r in REGISTRY["approx_value_percentiles"].fn(spark, sf_oracle).collect()}
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        for p in ("p50", "p90", "p99"):
            assert abs(a[p] - e[p]) <= max(1.0, 0.01 * abs(e[p]))


def test_word_shingles_short_docs(spark):
    """Docs shorter than the shingle width yield an EMPTY array — the
    sequence() step auto-negates when size < n and would otherwise feed
    slice() a zero start and fail the whole stage."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d"), (3, ""), (4, None)], "id long, text string"
    )
    out = {
        r["id"]: r["s"]
        for r in df.select("id", word_shingles(F.col("text"), 3).alias("s")).collect()
    }
    assert out[1] == [] and out[3] == [] and out[4] == []
    assert out[2] == ["a b c", "b c d"]


def test_contamination_overlap_counts(spark):
    """Shared-shingle counting: only training docs overlapping the benchmark
    appear, with exact distinct-shingle counts."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import contamination_overlap

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox runs"),   # shares 2 distinct 3-grams
            (2, "quick brown fox jumps high"), # shares 2
            (3, "totally different words here"),
            (4, "fox the quick brown"),        # shares 1 ('the quick brown')
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in contamination_overlap(train, bench, "text", "doc_id", 3).collect()
    }
    assert out == {1: 2, 2: 2, 4: 1}


def test_scd2_intervals(spark):
    """Runs of equal attribute values merge; intervals chain exactly
    (valid_to[k] == valid_from[k+1]); last run open + current; ties broken
    by the tiebreak column."""
    from datetime import datetime

    from kol_bigdata_realtime_analytics_spark.operators.scd import scd2_from_changelog

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, "free", t(1), 10),
        (1, "free", t(2), 11),   # same value: merges into first run
        (1, "pro", t(3), 12),
        (1, "free", t(4), 13),   # value recurs: NEW run, not merged backwards
        (2, "pro", t(1), 14),
        (3, "a", t(5), 16),      # same ts as below: event_id orders them
        (3, "b", t(5), 15),
    ]
    df = spark.createDataFrame(rows, "uid long, plan string, ts timestamp, eid long")
    out = scd2_from_changelog(df, "uid", "plan", "ts", "eid").collect()
    by_uid = {}
    for r in sorted(out, key=lambda r: (r["uid"], r["valid_from_us"])):
        by_uid.setdefault(r["uid"], []).append(r)
    u1 = by_uid[1]
    assert [r["plan"] for r in u1] == ["free", "pro", "free"]
    assert [r["is_current"] for r in u1] == [0, 0, 1]
    # intervals chain with no gaps
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert u1[2]["valid_to_us"] is None
    assert len(by_uid[2]) == 1 and by_uid[2][0]["is_current"] == 1
    u3 = by_uid[3]  # tie on ts: eid 15 ('b') sorts first, 16 ('a') is current
    assert [r["plan"] for r in u3] == ["b", "a"]
    assert [r["is_current"] for r in u3] == [0, 1]


def test_pagerank_matches_numpy(spark):
    """Spark PageRank == dense NumPy PageRank to 1e-9 on a planted graph
    (hub, chain, dangling node, weighted multi-edges)."""
    import numpy as np

    from kol_bigdata_realtime_analytics_spark.operators.graph import pagerank

    edges = [
        (0, 1, 1.0), (0, 2, 2.0), (1, 2, 1.0), (2, 0, 1.0),
        (3, 0, 1.0), (3, 2, 3.0), (4, 3, 1.0),  # 1 also reached from 0 only
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, n_iter=10).collect()}

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for s, d, w in edges:
        P[idx[d], idx[s]] += w
    col = P.sum(axis=0)
    for j in range(n):
        if col[j] > 0:
            P[:, j] /= col[j]
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - 0.85) / n + 0.85 * (P @ r)
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-9, (node, got[node], r[idx[node]])


def test_pagerank_fixedpoint_tracks_float(spark):
    """Fixed-point integer PageRank stays within floor-division error of the
    float operator on the planted graph: each of the 10 rounds floors at
    most 1e-12 per edge plus 1e-12 in the damped sum, so the final gap is
    bounded well below 1e-9 rank units — and determinism is exact (two runs
    produce identical longs)."""
    from kol_bigdata_realtime_analytics_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
        pagerank_fixedpoint,
    )

    edges = [
        (0, 1, 1), (0, 2, 2), (1, 2, 1), (2, 0, 1),
        (3, 0, 1), (3, 2, 3), (4, 3, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    fp1 = {r["node"]: r["rank_fp"] for r in pagerank_fixedpoint(df, n_iter=10).collect()}
    fp2 = {r["node"]: r["rank_fp"] for r in pagerank_fixedpoint(df, n_iter=10).collect()}
    assert fp1 == fp2  # exact determinism, not tolerance
    flt = {
        r["node"]: r["rank"]
        for r in pagerank(
            df.selectExpr("src", "dst", "CAST(weight AS DOUBLE) AS weight"), 0.85, 10
        ).collect()
    }
    assert fp1.keys() == flt.keys()
    for node, fp in fp1.items():
        assert abs(fp / PAGERANK_SCALE - flt[node]) < 1e-9, (node, fp, flt[node])


def test_int8_matmul_rescore_equals_hof_scorer(spark, sf_small):
    """The Arrow-matmul int8 rescorer must be ROW-IDENTICAL to the exact
    HOF-lambda scorer — same integer dots, same rounding, same ranking."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    a = {tuple(r) for r in REGISTRY["ann_int8_topk"].fn(spark, sf_small).collect()}
    b = {tuple(r) for r in REGISTRY["ann_int8_matmul_topk"].fn(spark, sf_small).collect()}
    assert a == b
    assert len(a) > 0


def test_int8_matmul_on_pruned_candidates(spark, sf_small):
    """Candidate-set-agnostic: on an IVF/LSH-style pruned candidate list the
    matmul rescorer returns exactly the exact ranking restricted to it."""
    import numpy as np

    from kol_bigdata_realtime_analytics_spark.operators.similarity import int8_topk_matmul
    from kol_bigdata_realtime_analytics_spark.plans.registry import table

    emb = table(spark, sf_small, "embeddings")
    cand = emb.filter(F.col("vec_id") % 2 == 0)  # stand-in for a probed list
    queries = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["q_id"], r["c_id"], r["rank"])
        for r in int8_topk_matmul(cand, queries, k=3).collect()
    }

    # expected: quantize + exact integer cosine in numpy over the same subset
    rows = emb.select("vec_id", "embedding").collect()
    codes = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype="float64")
        scale = np.abs(v).max() / 127.0
        codes[r["vec_id"]] = (
            np.round(v / scale).astype("int64") if scale > 0 else np.zeros_like(v, dtype="int64")
        )
    expected = set()
    for qid in sorted(k for k in codes if k < 5):
        qv = codes[qid]
        qn = np.sqrt(float((qv * qv).sum()))
        if qn == 0:
            continue
        scored = []
        for cid, cv in codes.items():
            if cid == qid or cid % 2 != 0:
                continue
            cn = np.sqrt(float((cv * cv).sum()))
            if cn == 0:
                continue
            scored.append((round(float((qv * cv).sum()) / (qn * cn), 6), cid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, cid) in enumerate(scored[:3], start=1):
            expected.add((qid, cid, rank))
    assert got == expected


# ---------------------------------------------------------------------------
# Broadcast-Bloom prefiltered anti-join
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    """Every key actually in the index must test bloom_maybe=True — the
    soundness property that lets definite-new rows skip the exact check."""
    from kol_bigdata_realtime_analytics_spark.operators.bloom import (
        bloom_bitmap,
        with_bloom_maybe,
    )

    index = spark.range(0, 1000).select(F.concat(F.lit("k"), "id").alias("key"))
    bitmap = bloom_bitmap(index, "key")
    flagged = with_bloom_maybe(index, "key", bitmap)
    assert flagged.filter(~F.col("bloom_maybe")).count() == 0


def test_bloom_filters_most_absent_keys(spark):
    """At m=2^20/k=5 with 1k index keys the FP rate is ~1e-4: of 1000
    absent keys, essentially all must be flagged definite-new (the whole
    point of the prefilter). Allow a generous 5% FP margin."""
    from kol_bigdata_realtime_analytics_spark.operators.bloom import (
        bloom_bitmap,
        with_bloom_maybe,
    )

    index = spark.range(0, 1000).select(F.concat(F.lit("k"), "id").alias("key"))
    absent = spark.range(5000, 6000).select(F.concat(F.lit("k"), "id").alias("key"))
    bitmap = bloom_bitmap(index, "key")
    n_maybe = with_bloom_maybe(absent, "key", bitmap).filter("bloom_maybe").count()
    assert n_maybe <= 50


def test_bloom_anti_join_equals_exact_anti_join(spark):
    """bloom_anti_join == plain left_anti on overlapping key sets."""
    from kol_bigdata_realtime_analytics_spark.operators.bloom import bloom_anti_join

    index = spark.range(0, 600).select(F.concat(F.lit("k"), "id").alias("key"))
    batch = spark.range(300, 900).select(
        F.concat(F.lit("k"), "id").alias("key"), F.col("id").alias("payload")
    )
    got = {tuple(r) for r in bloom_anti_join(batch, index, "key").collect()}
    expected = {tuple(r) for r in batch.join(index, "key", "left_anti").collect()}
    assert got == expected
    assert len(expected) == 300


def test_bloom_bitmap_is_broadcast_sized(spark):
    """The bitmap never exceeds m/64 rows regardless of index size."""
    from kol_bigdata_realtime_analytics_spark.operators.bloom import bloom_bitmap

    index = spark.range(0, 20000).select(F.concat(F.lit("x"), "id").alias("key"))
    m_bits = 1 << 14
    assert bloom_bitmap(index, "key", m_bits=m_bits).count() <= m_bits // 64


def test_bloom_big_side_never_shuffles_for_prefilter(spark):
    """Plan property: the bloom membership test must join via
    BroadcastHashJoin only — no Exchange on the probed side before the
    definite-new filter resolves."""
    from kol_bigdata_realtime_analytics_spark.operators.bloom import (
        bloom_bitmap,
        with_bloom_maybe,
    )

    index = spark.range(0, 100).select(F.concat(F.lit("k"), "id").alias("key"))
    big = spark.range(0, 10000).select(F.concat(F.lit("k"), "id").alias("key"))
    flagged = with_bloom_maybe(big, "key", bloom_bitmap(index, "key"))
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_count_min_exact_on_collision_free_data(spark):
    """With far fewer keys than width, estimates equal exact counts."""
    from kol_bigdata_realtime_analytics_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    df = spark.range(0, 10000).select((F.col("id") % 20).alias("k"))
    sketch = count_min_build(df, "k", width=4096, depth=4)
    est = count_min_estimate(df.select("k").distinct(), sketch, "k", width=4096, depth=4)
    rows = {r["k"]: r["cm_estimate"] for r in est.collect()}
    assert rows == {k: 500 for k in range(20)}


def test_count_min_error_bound_under_collisions(spark):
    """Heavy collisions (width 64, 1000 keys): every estimate must stay
    >= exact, and within the classic e*N/width bound for all keys here
    (empirical for this data+seeds; the structural floor is exact)."""
    import math

    from kol_bigdata_realtime_analytics_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    n, width, depth = 20000, 64, 4
    df = spark.range(0, n).select((F.col("id") % 1000).alias("k"))
    sketch = count_min_build(df, "k", width=width, depth=depth)
    est = count_min_estimate(df.select("k").distinct(), sketch, "k", width=width, depth=depth)
    exact = n // 1000
    bound = math.e * n / width
    for r in est.collect():
        assert r["cm_estimate"] >= exact
        assert r["cm_estimate"] <= exact + bound


def test_count_min_sketches_merge_by_union(spark):
    """Mergeability: sketch(a) + sketch(b) re-grouped == sketch(a ∪ b)."""
    from kol_bigdata_realtime_analytics_spark.operators.sketch import count_min_build

    a = spark.range(0, 5000).select((F.col("id") % 30).alias("k"))
    b = spark.range(5000, 9000).select((F.col("id") % 50).alias("k"))
    merged = (
        count_min_build(a, "k")
        .unionByName(count_min_build(b, "k"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = count_min_build(a.unionByName(b), "k")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_asof_three_forms_agree_on_adversarial_inputs(spark):
    """The equi-join, union-window, and cogrouped-pandas as-of forms must
    return IDENTICAL results on the inputs that historically split them:
    a newer right row with a genuinely NULL payload field (the union form
    used to stitch the older row's value in), NULL join keys (a window
    partition groups NULLs; an equi-join never matches them), equal
    timestamps (<= semantics), and right_ts sharing the left's column
    name `ts` (the pandas form used to drop the left column)."""
    from kol_bigdata_realtime_analytics_spark.operators.asof import (
        as_of_join,
        as_of_join_pandas,
        as_of_join_union,
    )

    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 3, "L2"), (2, 5, "L3"), (None, 5, "L4")],
        "k int, ts int, lv string",
    )
    right = spark.createDataFrame(
        [(1, 1, "a1", "b1"), (1, 3, None, "b2"), (2, 9, "a3", "b3"), (None, 1, "ax", "bx")],
        "k int, ts int, ra string, rb string",
    )
    r_aliased = right.select("k", "ts", F.col("ra").alias("xa"), F.col("rb").alias("xb"))

    def rows(df):
        return sorted(
            (r["lv"], r["xa"], r["xb"]) for r in df.select("lv", "xa", "xb").collect()
        )

    expected = [
        ("L1", None, "b2"),  # latest right row (ts=3) carried ATOMICALLY: ra IS NULL
        ("L2", None, "b2"),  # ts tie matches (<=)
        ("L3", None, None),  # only right row for k=2 is later
        ("L4", None, None),  # NULL keys never match
    ]
    a = as_of_join(left, r_aliased, "k", "ts", "ts", ["xa", "xb"], left_unique=["lv"])
    b = as_of_join_union(left, r_aliased, "k", "ts", "ts", ["xa", "xb"])
    c = as_of_join_pandas(left, r_aliased, "k", "ts", "ts", ["xa", "xb"])
    assert rows(a) == expected
    assert rows(b) == expected
    assert rows(c) == expected

    # carrying the right timestamp column itself must be rejected up front
    # (r4 advice: rpdf[[right_ts, *right_cols]] + the rename would produce a
    # duplicate '_r_ts' column and fail deep inside merge_asof instead)
    with pytest.raises(ValueError, match="collide"):
        as_of_join_pandas(left, r_aliased, "k", "ts", "ts", ["ts", "xa"])


def test_agms_join_size_accuracy_and_merge(spark):
    """AGMS join-size estimate: exact on collision-free domains, within the
    sqrt(F2*F2)/sqrt(width) error regime on skewed data, and mergeable
    (sketch of union == bucket-wise sum of part sketches)."""
    import math

    from kol_bigdata_realtime_analytics_spark.operators.sketch import (
        agms_build,
        agms_join_size,
    )

    # collision-free: 17 and 13 keys vs width 256 -> exact inner product
    a = spark.range(0, 1000).select((F.col("id") % 17).alias("k"))
    b = spark.range(0, 500).select((F.col("id") % 13).alias("k"))
    est = agms_join_size(agms_build(a, "k"), agms_build(b, "k")).collect()[0]["est"]
    exact = a.join(b, "k").count()
    assert est == exact

    # skewed: zipf-ish key frequencies, 2000 keys vs width 256
    sk = spark.range(0, 30000).select((F.col("id") % 2000 * (F.col("id") % 7 + 1) % 2000).alias("k"))
    t = spark.range(0, 10000).select((F.col("id") % 500).alias("k"))
    est2 = agms_join_size(agms_build(sk, "k"), agms_build(t, "k")).collect()[0]["est"]
    exact2 = sk.join(t, "k").count()
    f2a = sk.groupBy("k").count().agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0]
    f2b = t.groupBy("k").count().agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0]
    bound = 3 * math.sqrt(f2a * f2b / 256)
    assert abs(est2 - exact2) <= bound

    # disjoint key domains: every depth row's inner product is 0 and the
    # estimate must be exactly 0 (not a median over missing rows)
    d1 = spark.range(0, 300).select((F.col("id") % 7).alias("k"))
    d2 = spark.range(0, 300).select((F.col("id") % 5 + 1000).alias("k"))
    assert agms_join_size(agms_build(d1, "k"), agms_build(d2, "k")).collect()[0]["est"] == 0

    # mergeability
    a1 = spark.range(0, 600).select((F.col("id") % 17).alias("k"))
    a2 = spark.range(600, 1000).select((F.col("id") % 17).alias("k"))
    merged = (
        agms_build(a1, "k")
        .unionByName(agms_build(a2, "k"))
        .groupBy("d", "bucket")
        .agg(F.sum("s").alias("s"))
        .filter(F.col("s") != 0)
    )
    direct = agms_build(a1.unionByName(a2), "k").filter(F.col("s") != 0)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; a 4-cycle has 0; a star has 0; duplicate and
    reversed edge listings must not change counts."""
    from kol_bigdata_realtime_analytics_spark.operators.graph import triangle_count

    def tc(pairs):
        df = spark.createDataFrame(pairs, "src long, dst long")
        return triangle_count(df).collect()[0]["n_triangles"]

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert tc(k4) == 4
    assert tc(k4 + [(b, a) for a, b in k4] + k4) == 4  # dup + reversed
    assert tc([(0, 1), (1, 2), (2, 3), (3, 0)]) == 0  # 4-cycle
    assert tc([(0, i) for i in range(1, 8)]) == 0  # star
    # two triangles sharing an edge
    assert tc([(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]) == 2


def test_duplicate_clusters_long_chain_converges(spark):
    """A 60-node chain needs ~60 rounds under plain min-propagation — more
    than max_iterations=25 — but pointer doubling closes it in O(log n)
    rounds. Every node must end labeled with the chain's minimum."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import duplicate_clusters

    n = 60
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = duplicate_clusters(nodes, edges)
    rows = out.collect()
    assert len(rows) == n
    assert all(r["cluster_id"] == 0 for r in rows)
    assert all(r["cluster_size"] == n for r in rows)
    assert sum(r["is_canonical"] for r in rows) == 1


def test_bloom_empty_index_everything_definite_new(spark):
    """An empty index bitmap must classify every batch row definite-new
    (no bits set -> bloom_maybe False) and the anti-join returns the
    whole batch."""
    from kol_bigdata_realtime_analytics_spark.operators.bloom import bloom_anti_join

    index = spark.createDataFrame([], "key string")
    batch = spark.range(0, 50).select(F.concat(F.lit("k"), "id").alias("key"))
    assert bloom_anti_join(batch, index, "key").count() == 50


def test_triangle_count_empty_and_selfloop_edges(spark):
    """Empty edge lists and self-loops must yield zero triangles, not
    errors."""
    from kol_bigdata_realtime_analytics_spark.operators.graph import triangle_count

    empty = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(empty).collect()[0]["n_triangles"] == 0
    loops = spark.createDataFrame([(1, 1), (2, 2), (1, 2)], "src long, dst long")
    assert triangle_count(loops).collect()[0]["n_triangles"] == 0


def test_count_min_estimate_for_unseen_keys_is_zero_or_small(spark):
    """Keys absent from the build set probe empty buckets -> estimate 0
    (coalesce path), unless they collide; with a huge width they are 0."""
    from kol_bigdata_realtime_analytics_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    built = spark.range(0, 100).select(F.concat(F.lit("a"), "id").alias("k"))
    probe = spark.range(0, 20).select(F.concat(F.lit("zzz"), "id").alias("k"))
    sketch = count_min_build(built, "k", width=1 << 16, depth=4)
    est = count_min_estimate(probe, sketch, "k", width=1 << 16, depth=4)
    assert all(r["cm_estimate"] == 0 for r in est.collect())


def test_pagerank_fixedpoint_shuffle_path_identical(spark):
    """The above-broadcast-limit fallback (rank joins run as shuffle joins,
    r3 advice) must produce BIT-IDENTICAL longs to the broadcast path —
    integer arithmetic makes join strategy invisible to the result."""
    from kol_bigdata_realtime_analytics_spark.operators.graph import (
        pagerank_fixedpoint,
    )

    edges = [
        (0, 1, 1), (0, 2, 2), (1, 2, 1), (2, 0, 1),
        (3, 0, 1), (3, 2, 3), (4, 3, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    bc = {r["node"]: r["rank_fp"]
          for r in pagerank_fixedpoint(df, n_iter=6, broadcast_ranks=True).collect()}
    sh = {r["node"]: r["rank_fp"]
          for r in pagerank_fixedpoint(df, n_iter=6, broadcast_ranks=False).collect()}
    assert bc == sh


# ---------------------------------------------------------------------------
# MERGE INTO (operators/merge.py)
# ---------------------------------------------------------------------------


def _merge_fixture(spark):
    from kol_bigdata_realtime_analytics_spark.operators.merge import merge_changelog

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    delta = spark.createDataFrame(
        [
            (2, "U", "b2", 22),   # matched update
            (3, "D", None, None), # matched delete
            (4, "U", "d", 40),    # unmatched insert
            (5, "D", None, None), # unmatched delete -> no-op
        ],
        "k long, op string, s string, v long",
    )
    return merge_changelog, base, delta


def test_merge_changelog_all_four_clauses(spark):
    merge_changelog, base, delta = _merge_fixture(spark)
    rows = {r.k: r for r in merge_changelog(base, delta, "k").collect()}
    assert set(rows) == {1, 2, 4}
    assert (rows[1].s, rows[1].v, rows[1].merge_action) == ("a", 10, "carry")
    assert (rows[2].s, rows[2].v, rows[2].merge_action) == ("b2", 22, "update")
    assert (rows[4].s, rows[4].v, rows[4].merge_action) == ("d", 40, "insert")


def test_merge_changelog_shuffle_path_identical(spark):
    merge_changelog, base, delta = _merge_fixture(spark)
    a = merge_changelog(base, delta, "k", broadcast_delta=True).collect()
    b = merge_changelog(base, delta, "k", broadcast_delta=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_merge_changelog_base_never_shuffles_on_broadcast_path(spark):
    merge_changelog, base, delta = _merge_fixture(spark)
    plan = merge_changelog(base, delta, "k")._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_merge_changelog_rejects_duplicate_delta_keys(spark):
    """Two delta rows for one key would make the outcome order-dependent
    (and duplicate matched base rows) — rejected up front, like Delta/
    Iceberg MERGE INTO's multiple-source-match error."""
    import pytest

    merge_changelog, base, _ = _merge_fixture(spark)
    dup_delta = spark.createDataFrame(
        [(2, "U", "b2", 22), (2, "D", None, None)],
        "k long, op string, s string, v long",
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_changelog(base, dup_delta, "k")


def test_changelog_roundtrip_rebuilds_new_snapshot(spark):
    from kol_bigdata_realtime_analytics_spark.operators.merge import (
        changelog_from_snapshots,
        merge_changelog,
    )

    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, payload string"
    )
    new = spark.createDataFrame(
        [(2, "y"), (3, "z2"), (9, "w")], "k long, payload string"
    )
    log = changelog_from_snapshots(old, new, "k", F.col("payload"))
    ops = {r.k: r.op for r in log.collect()}
    assert ops == {1: "D", 3: "U", 9: "U"}  # unchanged key 2 absent from the log
    rebuilt = merge_changelog(old, log, "k").drop("merge_action")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_basket_cap_keeps_null_basket_keys(spark):
    """A NULL basket key is a legitimate groupBy group: the cap pre-filter
    must cap it like any other basket (null-safe semi-join), not silently
    drop it (plain equi join) or unconditionally keep it (anti form)."""
    from kol_bigdata_realtime_analytics_spark.operators.graph import (
        cooccurrence_pairs,
        oversized_baskets,
    )

    rows = [(None, "a"), (None, "b"), (1, "a"), (1, "b"), (1, "c")]
    df = spark.createDataFrame(rows, "basket int, item string")
    # cap 10: both baskets under cap -> NULL basket's pair survives
    got = sorted(
        (r["a"], r["b"])
        for r in cooccurrence_pairs(df, "basket", "item", max_basket_size=10).collect()
    )
    assert got == [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c")]
    # cap 2: NULL basket (2 items) kept, basket 1 (3 items) skipped + audited
    got2 = sorted(
        (r["a"], r["b"])
        for r in cooccurrence_pairs(df, "basket", "item", max_basket_size=2).collect()
    )
    assert got2 == [("a", "b")]
    audit = {(r["basket"], r["basket_n"]) for r in oversized_baskets(df, "basket", "item", 2).collect()}
    assert audit == {(1, 3)}
    # cap 1: NULL basket itself oversized -> skipped and audited
    got1 = cooccurrence_pairs(df, "basket", "item", max_basket_size=1).collect()
    assert got1 == []
    audit1 = {(r["basket"], r["basket_n"]) for r in oversized_baskets(df, "basket", "item", 1).collect()}
    assert audit1 == {(None, 2), (1, 3)}


def test_duplicate_clusters_dedups_duplicate_node_ids(spark):
    """A node id appearing twice in `nodes` must yield ONE output row on
    both paths — the loop collapses duplicates via groupBy, and the
    singleton bypass must match (explicit distinct)."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(1,), (1,), (2,), (2,), (3,)], "doc_id long")
    edges = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    rows = duplicate_clusters(nodes, edges).collect()
    assert len(rows) == 3  # one row per distinct node, both paths
    out = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"]) for r in rows}
    assert out == {1: (1, 2, 1), 3: (1, 2, 0), 2: (2, 1, 1)}


def test_basket_cap_survives_a_hot_basket(spark):
    """A 100k-item single basket (5e9 pairs uncapped — an OOM/stall) must
    cost the capped run only its counting pass: the guard skips it before
    any array builds, the audit names it, and normal baskets still expand."""
    from pyspark.sql import functions as F

    from kol_bigdata_realtime_analytics_spark.operators.graph import (
        cooccurrence_pairs,
        oversized_baskets,
    )

    hot = spark.range(100_000).select(
        F.lit(0).alias("basket"), F.concat(F.lit("i"), F.col("id")).alias("item")
    )
    normal = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "x"), (2, "y"), (2, "z")], "basket bigint, item string"
    )
    df = hot.unionByName(normal)
    got = sorted(
        (r["a"], r["b"])
        for r in cooccurrence_pairs(df, "basket", "item", max_basket_size=1000).collect()
    )
    assert got == [("a", "b"), ("x", "y"), ("x", "z"), ("y", "z")]
    audit = {
        (r["basket"], r["basket_n"])
        for r in oversized_baskets(df, "basket", "item", 1000).collect()
    }
    assert audit == {(0, 100_000)}


def test_fit_cache_memoizes_and_preserves_results(spark):
    """The quantizer-fit memo (r5 verdict ask #3) must (a) return identical
    artifacts on a second call with the same cache_key, (b) serve them
    WITHOUT re-collecting (we poison the frame between calls to prove the
    cached artifact wins), and (c) stay disabled when cache_key is None."""
    from kol_bigdata_realtime_analytics_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    key = "fit-cache-test-key"
    S._FIT_CACHE.clear()
    c1 = S.kmeans_centroids(emb, n_centroids=4, sample_size=64, cache_key=key)
    assert any(k[0] == "sample" for k in S._FIT_CACHE)
    assert any(k[0] == "kmeans" for k in S._FIT_CACHE)
    # a DIFFERENT frame under the same key must not be re-fit: the cache is
    # keyed by declared data identity, not DataFrame object identity.
    # AFFINE poison (2x+1): a pure scaling is invariant under spherical
    # k-means' L2 normalization (r6 review found the original x100 poison
    # only "worked" via 1-ulp sqrt wobble); 2x+1 changes the direction of
    # every non-constant vector, so a re-fit provably produces different
    # centroids.
    poisoned = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x * 2.0 + 1.0)
    )
    c2 = S.kmeans_centroids(poisoned, n_centroids=4, sample_size=64, cache_key=key)
    assert c1 == c2
    # cache_key=None bypasses the memo entirely (fits the poisoned data)
    c3 = S.kmeans_centroids(poisoned, n_centroids=4, sample_size=64, cache_key=None)
    assert c3 != c1
    # isolate the KMEANS-level memo from the sample-level one (r6 review:
    # with both layers live, a broken kmeans memo is masked by the cached
    # sample reproducing identical centroids): pop the sample entry — a
    # kmeans hit must still serve c1 WITHOUT re-collecting a sample
    for k in [k for k in S._FIT_CACHE if k[0] == "sample"]:
        S._FIT_CACHE.pop(k)
    c4 = S.kmeans_centroids(poisoned, n_centroids=4, sample_size=64, cache_key=key)
    assert c4 == c1
    assert not any(k[0] == "sample" for k in S._FIT_CACHE)
    # cache hits hand out COPIES: mutating a returned artifact must not
    # corrupt the cached one
    c4[0][0] = 1e9
    c5 = S.kmeans_centroids(poisoned, n_centroids=4, sample_size=64, cache_key=key)
    assert c5 == c1
    b1 = S.pq_codebooks(emb, m=2, ksub=4, sample_size=64, cache_key=key)
    b2 = S.pq_codebooks(poisoned, m=2, ksub=4, sample_size=64, cache_key=key)
    assert b1 == b2
    b2[0][0][0] = 1e9
    assert S.pq_codebooks(poisoned, m=2, ksub=4, sample_size=64, cache_key=key) == b1
    S._FIT_CACHE.clear()


def test_fit_cache_invalidates_on_data_regeneration(spark, tmp_path):
    """Path-keyed memos must carry the parquet's (mtime, size) identity
    (r6 advisory): rewriting the file at the SAME path must trigger a
    re-fit, never serve the stale artifact."""
    from kol_bigdata_realtime_analytics_spark.operators import similarity as S

    d = tmp_path / "regen_sf"
    d.mkdir()
    path = str(d)

    def write(scale_rows: int):
        spark.createDataFrame(
            [
                (i, [float(((i * 7 + j) % 5) + scale_rows) for j in range(8)])
                for i in range(32 + scale_rows)
            ],
            "vec_id long, embedding array<double>",
        ).toPandas().to_parquet(str(d / "embeddings.parquet"))

    S._FIT_CACHE.clear()
    write(0)
    emb1 = spark.read.parquet(str(d / "embeddings.parquet"))
    c1 = S.kmeans_centroids(emb1, n_centroids=4, sample_size=64, cache_key=path)
    # same data, same path -> memo hit
    assert S.kmeans_centroids(emb1, n_centroids=4, sample_size=64, cache_key=path) == c1
    # regenerate the parquet in place (different rows AND size) -> re-fit
    write(16)
    emb2 = spark.read.parquet(str(d / "embeddings.parquet"))
    c2 = S.kmeans_centroids(emb2, n_centroids=4, sample_size=64, cache_key=path)
    assert c2 != c1
    S._FIT_CACHE.clear()


def test_fit_cache_explicit_sample_not_discarded(spark):
    """A memo hit under a reused cache_key must NOT discard a caller-supplied
    `sample` (r6 advisory): the sample's content is folded into the key, so
    two different samples under one key fit independently."""
    import numpy as np

    from kol_bigdata_realtime_analytics_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    key = "sample-fp-test-key"
    S._FIT_CACHE.clear()
    s1 = np.array([[float((i * 7 + j) % 5) for j in range(8)] for i in range(64)])
    s2 = s1 * 2.0 + 1.0  # affine: different directions -> different centroids
    c1 = S.kmeans_centroids(emb, n_centroids=4, sample_size=64, sample=s1, cache_key=key)
    c2 = S.kmeans_centroids(emb, n_centroids=4, sample_size=64, sample=s2, cache_key=key)
    assert c1 != c2  # pre-fix: the s1 memo hit silently served c1 for s2
    # and the same sample memoizes (second call is a hit, identical result)
    assert S.kmeans_centroids(
        emb, n_centroids=4, sample_size=64, sample=s2, cache_key=key
    ) == c2
    S._FIT_CACHE.clear()


def test_duplicate_clusters_rejects_null_cast_ids(spark):
    """NULL ids silently became NULL-keyed singletons pre-r6 (the semi/anti
    joins use plain equality, and distinct() collapsed them all into one
    row). The id contract is now asserted. (Malformed STRING ids already
    fail loudly under ANSI cast — only genuine NULLs slip through.)"""
    import pytest as _pytest

    from kol_bigdata_realtime_analytics_spark.operators.dedup import (
        duplicate_clusters,
    )

    nodes = spark.createDataFrame([(1,), (2,), (None,)], "doc_id long")
    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError, match="non-null"):
        duplicate_clusters(nodes, edges).collect()


def test_duplicate_clusters_phantom_dst_nodes(spark):
    """Edge endpoints absent from `nodes` (phantoms) are connectivity
    conduits only: the chain 10-20-21-11 must merge 10 and 11, but 20/21
    must NOT appear in the output or inflate cluster_size, and a phantom
    that is the component MINIMUM (id 5 below) must not steal the
    canonical slot. NULL edge endpoints are ignored entirely."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import (
        duplicate_clusters,
    )

    nodes = spark.createDataFrame([(10,), (11,), (30,)], "doc_id long")
    # 20/21 phantom conduits; 5 a phantom SMALLER than every real id;
    # one NULL-endpoint edge that must behave as "no edge"
    edges = spark.createDataFrame(
        [(10, 20), (20, 21), (21, 11), (10, 5), (30, None)],
        "id_a long, id_b long",
    )
    rows = {r["doc_id"]: r for r in duplicate_clusters(nodes, edges).collect()}
    assert set(rows) == {10, 11, 30}  # phantoms never in output
    assert rows[10]["cluster_id"] == 10 and rows[11]["cluster_id"] == 10
    assert rows[10]["cluster_size"] == 2 and rows[11]["cluster_size"] == 2
    assert rows[10]["is_canonical"] == 1 and rows[11]["is_canonical"] == 0
    # 30's only edge had a NULL endpoint -> stays a singleton
    assert rows[30]["cluster_id"] == 30 and rows[30]["cluster_size"] == 1
    assert rows[30]["is_canonical"] == 1


def test_cooccurrence_with_audit_shares_mode(spark):
    """with_audit=True returns the oversized_baskets complement built with
    the SAME distinct mode as the guard — the audit can't diverge (r5
    advice). Basket 1 has 3 rows / 2 distinct items: under cap=2 it is
    kept by distinct=True but skipped by distinct=False, and each mode's
    paired audit must agree with its own expansion."""
    from kol_bigdata_realtime_analytics_spark.operators.graph import (
        cooccurrence_pairs,
        cooccurrence_triples,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "x"), (2, "y"), (2, "z")],
        "basket bigint, item string",
    )
    pairs_d, audit_d = cooccurrence_pairs(
        df, "basket", "item", distinct=True, max_basket_size=2, with_audit=True
    )
    assert sorted((r["a"], r["b"]) for r in pairs_d.collect()) == [("a", "b")]
    assert {(r["basket"], r["basket_n"]) for r in audit_d.collect()} == {(2, 3)}

    pairs_m, audit_m = cooccurrence_pairs(
        df, "basket", "item", distinct=False, max_basket_size=2, with_audit=True
    )
    assert pairs_m.collect() == []  # basket 1 has 3 rows -> over cap too
    assert {(r["basket"], r["basket_n"]) for r in audit_m.collect()} == {(1, 3), (2, 3)}

    triples, audit_t = cooccurrence_triples(
        df, "basket", "item", max_basket_size=3, with_audit=True
    )
    assert sorted((r["a"], r["b"], r["c"]) for r in triples.collect()) == [
        ("x", "y", "z")
    ]
    assert audit_t.collect() == []

    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires max_basket_size"):
        cooccurrence_pairs(df, "basket", "item", with_audit=True)


def test_dsir_weights_favor_target_domain(spark, sf_small):
    """DSIR's defining property: documents FROM the target domain must
    score a higher mean importance weight than the rest of the corpus
    (their features are, by construction, more likely under the target
    distribution). Deterministic on the fixed TESTDATA."""
    from kol_bigdata_realtime_analytics_spark.plans.llm_ops import (
        _DSIR_TARGET_SOURCE,
        dsir_importance_weights,
    )

    out = dsir_importance_weights(spark, sf_small)
    rows = out.groupBy(
        (F.col("source") == _DSIR_TARGET_SOURCE).alias("is_target")
    ).agg(F.avg("avg_log_weight").alias("m")).collect()
    m = {r["is_target"]: r["m"] for r in rows}
    assert m[True] > m[False]


def test_misra_gries_no_false_negatives_under_eviction(spark):
    """Adversarial MG stream: a huge distinct tail forces constant
    eviction; every key with count > n/(k+1) must still be in the
    candidate set (mergeable-summaries guarantee) and heavy_hitters_exact
    must equal the brute-force answer exactly."""
    from kol_bigdata_realtime_analytics_spark.operators.sketch import (
        heavy_hitters_exact,
        misra_gries_candidates,
    )

    rows = []
    # 3 frequent keys: 400 each; 4000 distinct singletons (the tail)
    for key in (1, 2, 3):
        rows += [(key,)] * 400
    rows += [(10_000 + i,) for i in range(4000)]
    # deterministic interleave so frequents aren't contiguous
    rows = [rows[i] for i in range(0, len(rows), 2)] + [
        rows[i] for i in range(1, len(rows), 2)
    ]
    df = spark.createDataFrame(rows, "k long").repartition(8)
    n = len(rows)
    k = 16
    true_heavy = {1, 2, 3}  # 400 * 17 > 5200
    assert all(400 * (k + 1) > n for _ in true_heavy)
    cand = {r["k"] for r in misra_gries_candidates(df, "k", k).collect()}
    assert true_heavy <= cand
    got = {
        (r["k"], r["n_events"])
        for r in heavy_hitters_exact(df, "k", k).collect()
    }
    assert got == {(1, 400), (2, 400), (3, 400)}


def test_pca_fit_orthonormal_and_deterministic(spark):
    """pca_fit: components are orthonormal rows in descending-eigenvalue
    order with canonical signs; two fits on the same data are identical
    (no RNG); projection matches numpy."""
    import numpy as np

    from kol_bigdata_realtime_analytics_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float(((i * 7 + j) % 5) + (j < 2) * 3 * (i % 4)) for j in range(8)])
         for i in range(128)],
        "vec_id long, embedding array<double>",
    )
    mu1, P1 = S.pca_fit(emb, n_components=4, sample_size=128)
    mu2, P2 = S.pca_fit(emb, n_components=4, sample_size=128)
    assert mu1 == mu2 and P1 == P2
    P = np.array(P1)
    assert np.allclose(P @ P.T, np.eye(4), atol=1e-9)
    for row in P:  # canonical sign
        assert row[int(np.abs(row).argmax())] > 0
    # projection UDF == numpy
    proj = S.pca_project_udf(mu1, P1)
    got = {
        r["vec_id"]: np.array(r["p"])
        for r in emb.select("vec_id", proj(S.as_double_vec(F.col("embedding"))).alias("p")).collect()
    }
    X = np.array([[float(((i * 7 + j) % 5) + (j < 2) * 3 * (i % 4)) for j in range(8)]
                  for i in range(128)])
    want = (X - np.array(mu1)) @ P.T
    for i in range(128):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_markov_credits_diverge_from_shapley(spark):
    """The signal the removal-effect model family exists for: the chain
    sees touch ORDER and path structure that Shapley's set-based view
    cannot, so the two models distribute credit differently over the
    SAME corpus (at sf0.01 the normalized shares differ by >5 points on
    several channels, e.g. Shapley concentrates on error/click while the
    chain is near-uniform). Markov credits are also nonnegative by
    construction — removal only diverts probability mass away from
    'conv' — where Shapley marginals can go negative."""
    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.01"
    mk = {
        r["channel"]: r["credit_t6"]
        for r in REGISTRY["markov_removal_attribution"].fn(spark, sf).collect()
    }
    sh = {
        r["channel"]: r["shapley_t6"]
        for r in REGISTRY["shapley_attribution"].fn(spark, sf).collect()
    }
    assert set(mk) == set(sh)
    assert all(v >= 0 for v in mk.values()), mk
    mk_tot = sum(mk.values())
    sh_tot = sum(sh.values())
    assert mk_tot > 0 and sh_tot != 0
    max_gap = max(abs(mk[c] / mk_tot - sh[c] / sh_tot) for c in mk)
    assert max_gap > 0.01, (mk, sh)


def test_kneser_ney_ranks_unlike_jelinek_mercer(spark, tmp_path):
    """The continuation-count signal KN exists for, on a planted corpus:
    doc A's singleton transition lands on 'francisco' (HIGH unigram count
    from the 'san francisco' collocation, but only 2 distinct
    predecessors), doc B's lands on 'the' (lower unigram count, 21
    distinct predecessors). JM's unigram fallback scores A better; KN's
    continuation distribution scores B better — the orderings INVERT."""
    import pandas as pd

    from kol_bigdata_realtime_analytics_spark.plans import REGISTRY

    rows = [(1, "of francisco"), (2, "of the")]
    rows += [(100, " ".join(["san francisco"] * 50))]
    rows += [(200 + i, f"aa{i} the") for i in range(20)]
    rows += [(300 + i, f"of xx{i}") for i in range(20)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    jm = {
        r["doc_id"]: r["xent_nats"]
        for r in REGISTRY["bigram_xent_scores"].fn(spark, sf_dir).collect()
    }
    kn = {
        r["doc_id"]: r["xent_nats"]
        for r in REGISTRY["kneser_ney_xent_scores"].fn(spark, sf_dir).collect()
    }
    # JM: A (rare transition onto a frequent token) beats B
    assert jm[1] < jm[2], jm
    # KN: B (transition onto a VERSATILE token) beats A — inverted
    assert kn[2] < kn[1], kn
