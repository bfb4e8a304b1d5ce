"""Hypothesis property tests for operator contracts the oracles can't see.

The DuckDB oracles pin exact values on fixed TESTDATA; these pin the
*invariants* on adversarial inputs — quantization error bounds, whitespace
normalization — which is what actually holds an operator together on 100 TB
of messy real data.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_floats32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=st.lists(st.lists(_floats32, min_size=1, max_size=8), min_size=1, max_size=4))
def test_quantize_int8_error_bound(spark, vecs):
    """For every element: code in [-127, 127] and |x - code*scale| <=
    scale/2 (one quantization step), with scale = max|x|/127; all-zero
    vectors quantize to scale 0 and all-zero codes."""
    from kol_bigdata_realtime_analytics_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, embedding array<float>"
    )
    scale, codes = quantize_int8(F.col("embedding"))
    rows = df.select(
        "embedding", scale.alias("scale"), codes.alias("codes")
    ).collect()
    for r in rows:
        absmax = max(abs(x) for x in r["embedding"])
        if absmax == 0.0:
            assert r["scale"] == 0.0
            assert all(c == 0 for c in r["codes"])
            continue
        assert math.isclose(r["scale"], absmax / 127.0, rel_tol=1e-12)
        for x, c in zip(r["embedding"], r["codes"]):
            assert -127 <= c <= 127
            # one-step bound, float32->double slack only
            assert abs(x - c * r["scale"]) <= r["scale"] / 2 * (1 + 1e-9) + 1e-12


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    # ASCII alphanumerics: case-fold roundtrip (upper then lower) is only
    # an identity for ASCII — Unicode has one-way mappings (ß -> SS) that
    # are outside the fingerprint's lowercase-normalization contract
    tokens=st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    ),
    seps=st.lists(st.sampled_from([" ", "  ", "\t", " \t ", "\n"]), min_size=6, max_size=6),
)
def test_fingerprint_whitespace_invariance(spark, tokens, seps):
    """doc_fingerprint_md5 must be invariant to the amount/kind of
    whitespace between tokens, leading/trailing whitespace, and case —
    the contract that makes it a dedup key for scraped text."""
    from kol_bigdata_realtime_analytics_spark.functions.text import doc_fingerprint_md5

    canonical = " ".join(tokens)
    messy = seps[5] + seps[0].join(tokens) + seps[4]
    messy2 = "".join(t + seps[i % 6] for i, t in enumerate(tokens)).upper()
    df = spark.createDataFrame(
        [(0, canonical), (1, messy), (2, messy2)], "id long, text string"
    )
    fps = [
        r["fp"]
        for r in df.select(doc_fingerprint_md5("text").alias("fp")).collect()
    ]
    assert fps[0] == fps[1] == fps[2]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_shingle_hash_rows_matches_string_shingles(spark, docs):
    """The codegen shingle path (shingle_hash_rows) is a drop-in for the
    string path (word_shingles): per doc, the DISTINCT hash set is exactly
    the image of the distinct string-shingle set (same size), and two docs
    share a hash iff they share a string shingle. A tiny 5-word alphabet
    forces heavy shingle reuse across docs, which is where a broken window
    (off-by-one lead, wrong null trim) would diverge."""
    from kol_bigdata_realtime_analytics_spark.operators.dedup import (
        shingle_hash_rows,
        word_shingles,
    )

    n = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "id long, text string"
    )
    str_sets = {
        r["id"]: set(r["s"])
        for r in df.select("id", word_shingles(F.col("text"), n).alias("s")).collect()
    }
    hash_sets: dict[int, set] = {i: set() for i in range(len(docs))}
    for r in shingle_hash_rows(df, "text", "id", n).collect():
        hash_sets[r["doc"]].add(r["h"])
    for i in range(len(docs)):
        assert len(hash_sets[i]) == len(str_sets[i]), (i, docs[i])
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            assert bool(str_sets[i] & str_sets[j]) == bool(hash_sets[i] & hash_sets[j])
