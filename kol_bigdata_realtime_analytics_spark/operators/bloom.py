"""Broadcast Bloom-filter prefilter for anti-joins at corpus scale.

The 100 TB incremental-dedup problem: an arriving batch must anti-join the
standing fingerprint index, but a plain shuffle anti-join moves the WHOLE
batch (and, unbucketed, the whole index) every ingestion cycle. A Bloom
filter built from the index collapses that: the bitmap is m/8 bytes
(128 KiB at m=2^20) regardless of index size, broadcasts to every
executor, and filters the batch IN ITS SCAN STAGE — rows with any unset
bit are *guaranteed* new (Bloom filters have no false negatives) and skip
the shuffle entirely; only the maybe-present fraction (false positives +
true dups) proceeds to the exact anti-join. At a 1% FP rate the exchange
shrinks ~100x on a mostly-new batch.

Everything is DataFrame-native: the bitmap is built with one groupBy
`bit_or` aggregation (<= m/64 rows), membership is a broadcast hash join
against that bitmap table — no driver collect, no Python in the row path.

Mirrors Spark's own runtime-bloom-join idea (spark.sql.optimizer.runtime.
bloomFilter.enabled) but as an explicit, reusable operator whose bitmap can
be PERSISTED next to the index and reused across ingestion cycles instead
of being rebuilt per query.

Reference parity: the reference's ingestion path re-reads its corpus table
per batch (kafka_to_bronze_tiktok.py upsert pattern); this operator is the
scale-path replacement, verified equal to the exact anti-join by the
`bloom_antijoin_check` invariant query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default sizing: m = 2^20 bits (128 KiB bitmap), k = 5 hash functions.
# FP rate ~ (1 - e^{-kn/m})^k: ~1e-4 at n=10k keys, ~2% at n=100k. For a
# real index of n keys pick m ~ 10-15 bits/key; m is a parameter, the
# bitmap table stays a broadcast-sized m/64 rows.
DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def _positions(col, m_bits: int, k: int):
    """k bit positions for a key: pmod(xxhash64(key, seed), m)."""
    return [F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits)) for seed in range(k)]


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """(word, bits) bitmap table for the key set: word = pos >> 6, bits =
    bit_or of (1 << (pos & 63)). At most m_bits/64 rows — broadcastable at
    any key count; build cost is one narrow groupBy over k rows per key."""
    pos = (
        keys.select(
            F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
        )
    )
    return (
        pos.select(
            F.shiftright("pos", 6).alias("word"),
            # shiftleft's amount arg must be a literal int in the DSL; go via expr
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def with_bloom_maybe(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """df + boolean `out_col`: True iff all k bits for df[key_col] are set
    in the bitmap (key MAYBE in the set); False => key definitely absent.

    Plan shape: k scalar bit tests per row, each a broadcast hash join of
    the <= m/64-row bitmap — the big side stays in its scan stage, no
    exchange. Implemented as k successive joins on distinct word aliases
    (not explode+groupBy, which would shuffle the big side k-fold). The
    bitmap is localCheckpointed first: the k broadcast builds otherwise
    each re-execute its build lineage (measured 23 exchanges on the
    registered check query; the pin collapses them to one tiny job) —
    mirroring production, where the bitmap is STAGED next to the index."""
    bitmap = bitmap.localCheckpoint(eager=True)
    out = df
    tests = []
    for i, pos in enumerate(_positions(F.col(key_col), m_bits, k)):
        bm = bitmap.select(
            F.col("word").alias(f"_bw{i}"), F.col("bits").alias(f"_bb{i}")
        )
        out = out.withColumn(f"_bp{i}", pos).join(
            F.broadcast(bm),
            F.shiftright(f"_bp{i}", 6) == F.col(f"_bw{i}"),
            "left",
        )
        tests.append(
            F.coalesce(F.col(f"_bb{i}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 64 AS INT))")
            )
            != 0
        )
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    drop = [c for i in range(k) for c in (f"_bp{i}", f"_bw{i}", f"_bb{i}")]
    return out.withColumn(out_col, cond).drop(*drop)


def bloom_anti_join(
    batch: DataFrame,
    index: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """batch rows whose key_col is NOT in index[key_col] — same result as
    `batch.join(index, key_col, "left_anti")`, but only the bloom-maybe
    fraction of the batch reaches the anti-join exchange; definite-new rows
    (any unset bit) short-circuit in the scan stage. The definite/maybe
    split re-executes the flagged lineage twice — two columnar SCANS of
    the batch (cheap; the membership joins are all broadcast), never two
    shuffles; stage `flagged` in a pipeline if the batch's own source
    scan is expensive. Exactness: no false
    negatives (definite-new is sound), and false positives are removed by
    the exact anti-join on the survivors."""
    flagged = with_bloom_maybe(batch, key_col, bloom_bitmap(index, key_col, m_bits, k),
                               m_bits, k)
    definite_new = flagged.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
    maybe = flagged.filter(F.col("bloom_maybe")).drop("bloom_maybe")
    # no distinct() on the index: anti-join semantics ignore duplicate
    # build keys, and the dedup would cost an extra index shuffle
    verified_new = maybe.join(index.select(F.col(key_col)), key_col, "left_anti")
    return definite_new.unionByName(verified_new)
