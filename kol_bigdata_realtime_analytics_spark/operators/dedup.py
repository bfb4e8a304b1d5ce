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
    """Distinct word n-gram shingles as array<string> (empty-safe)."""
    tk = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(tk) - n, F.lit(-1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)))
    return F.array_distinct(grams)


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """array<long> of `num_hashes` min-hash values over the shingle set.

    Each hash_i = min over shingles of xxhash64(shingle, seed=i). xxhash64 is
    a JVM-native expression — the whole signature stays in codegen.
    """
    sigs = [
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    rows_per_band = num_hashes / bands; two docs collide if ANY band of their
    signatures matches exactly. The bucket join shuffles (band_idx, band_hash)
    — tiny keys — then self-joins within buckets only.
    """
    rows_per_band = num_hashes // bands
    # signature computation is CPU-bound: spread a coarse input (e.g. one
    # parquet file locally) across all cores before hashing. At cluster scale
    # the scan already has many splits and this shuffle is round-robin-cheap
    # relative to the signature work it parallelizes.
    par = df.sparkSession.sparkContext.defaultParallelism
    sig = (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("txt"))
        .repartition(par)
        .select("doc", word_shingles(F.col("txt"), shingle_n).alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc", minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    )
    # explode signature into (band_idx, band_hash) bucket keys
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sig.select(
        "doc",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band))).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
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
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        *[F.col(c) for c in block_cols],
        F.array_distinct(tokens(F.col(text_col))).alias("tok"),
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    inter = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok")))
    union = F.size(F.array_union(F.col("a.tok"), F.col("b.tok")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        a.join(b, cond)
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
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
    """(doc, sim) — attach the 64-bit SimHash of text_col."""
    par = df.sparkSession.sparkContext.defaultParallelism
    prepared = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("txt")).repartition(par).select(
        "doc",
        F.transform(tokens(F.col("txt")), lambda t: F.xxhash64(t)).alias("_th"),
        F.size(tokens(F.col("txt"))).alias("_n"),
    )
    sim = F.expr(_SIMHASH_SQL.format(th="_th", n="_n", powers=_POWERS))
    return prepared.select("doc", sim.alias("sim"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs = bit_count(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split 64 bits into 4x16-bit chunks;
    pairs within max_hamming differ in <= max_hamming bits so at least one
    chunk matches exactly (pigeonhole) -> bucket join on (chunk_idx, chunk)."""
    sh = with_simhash(df, text_col, id_col)
    # 16-bit chunk extraction via unsigned shift + mask (always non-negative)
    chunks = F.array(
        *[F.shiftrightunsigned(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)]
    )
    banded = sh.select(
        "doc",
        "sim",
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx")) & (F.col("a.chunk") == F.col("b.chunk")))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
