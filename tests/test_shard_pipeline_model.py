"""Pin the fused training-shard pipeline against an independent pure-Python
model on a PLANTED corpus — one doc per failure mode (boilerplate flags,
length gates, kept-ratio gate, whitespace-variant exact dup, near-dup,
benchmark contamination) plus enough clean volume to cross a bin boundary.
The DuckDB oracle shadows the same algorithm in SQL; this model re-derives
every stage from the written semantics with plain Python containers."""

from __future__ import annotations

import math
import re
from collections import defaultdict


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return re.split(r"\s+", t) if t else []


def _c4_keep(text: str) -> bool:
    if "lorem ipsum" in text.lower() or "{" in text:
        return False
    wc = [
        0 if not s.strip() else len(re.split(r"\s+", s.strip()))
        for s in text.split(". ")
    ]
    total = sum(wc)
    kept = sum(c for c in wc if c >= 5)
    n_tok = len(_tokens(text))
    return total > 0 and kept / total >= 0.8 and 50 <= n_tok <= 100000


def _fingerprint(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip().lower()


def _shingles(text: str) -> set[str]:
    tok = _tokens(text)
    return {" ".join(tok[i : i + 4]) for i in range(max(len(tok) - 3, 0))}


def _model(rows: list[tuple]) -> set[tuple]:
    """rows: (doc_id, source, lang, text) -> expected pipeline output set
    of (source, bin, n_docs, bin_tokens, fill_ratio)."""
    docs = [(d, s, l, t) for d, s, l, t in rows if t and t.strip()]
    bench = [(d, s, l, t) for d, s, l, t in docs if d % 13 == 0]
    train = [
        (d, s, l, t)
        for d, s, l, t in docs
        if d % 13 != 0 and _c4_keep(t)
    ]
    # exact dedup: min doc_id per normalized fingerprint
    by_fp: dict = {}
    for d, s, l, t in sorted(train):
        by_fp.setdefault(_fingerprint(t), (d, s, l, t))
    train1 = sorted(by_fp.values())
    # decontaminate: any shared 4-gram with any bench doc
    bench_sh = set().union(*(_shingles(t) for _, _, _, t in bench)) if bench else set()
    train2 = [r for r in train1 if not (_shingles(r[3]) & bench_sh)]
    # fuzzy: jaccard >= 0.5 within (lang, source), drop the higher id
    dropped = set()
    by_block = defaultdict(list)
    for d, s, l, t in train2:
        by_block[(l, s)].append((d, set(_tokens(t))))
    for blk in by_block.values():
        blk.sort()
        for i in range(len(blk)):
            for j in range(i + 1, len(blk)):
                a, ta = blk[i]
                b, tb = blk[j]
                if round(len(ta & tb) / len(ta | tb), 6) >= 0.5:
                    dropped.add(b)
    train3 = [r for r in train2 if r[0] not in dropped]
    # pack: per source, order by doc_id, 4096-token contiguous bins
    out = defaultdict(lambda: [0, 0])  # (source, bin) -> [n_docs, bin_tokens]
    cum = defaultdict(int)
    for d, s, l, t in sorted(train3):
        n = len(_tokens(t))
        b = cum[s] // 4096
        out[(s, b)][0] += 1
        out[(s, b)][1] += n
        cum[s] += n
    return {
        (s, b, nd, bt, math.floor(bt / 4096.0 * 1000000) / 1000000)
        for (s, b), (nd, bt) in out.items()
    }


def _clean_text(prefix: str, n: int = 60) -> str:
    return " ".join(f"{prefix}w{j}" for j in range(n))


def test_shard_pipeline_planted_corpus(spark):
    from kol_bigdata_realtime_analytics_spark.plans.llm_ops import shard_pipeline

    rows = [
        (1, "s1", "en", _clean_text("a")),  # survives, canonical of the dup pair
        # exact dup of 1 modulo whitespace -> same fingerprint, dropped
        (2, "s1", "en", "  " + _clean_text("a").replace(" ", "   ") + " "),
        # near-dup of 1: 55 shared + 5 new tokens, jaccard 55/65 = 0.846
        (3, "s1", "en", " ".join([f"aw{j}" for j in range(55)] + [f"cx{j}" for j in range(5)])),
        (13, "s1", "en", _clean_text("bench")),  # eval slice (13 % 13 == 0)
        # contaminated: shares the 4-gram benchw0..benchw3 with doc 13
        (4, "s1", "en", _clean_text("e") + " benchw0 benchw1 benchw2 benchw3"),
        (5, "s1", "en", _clean_text("f") + " contains Lorem Ipsum filler"),  # flagged
        (6, "s1", "en", _clean_text("g") + " code { brace"),  # flagged
        (7, "s1", "en", "tiny doc under the gate"),  # < 50 tokens
        # kept-ratio fail: one 40-word segment + four 4-word segments = 40/56
        (8, "s1", "en", _clean_text("h", 40) + ". p q r s. p q r s. p q r s. p q r s"),
        (9, "s2", "en", _clean_text("i")),  # clean doc in another source
        (10, "s1", "en", _clean_text("k")),  # clean, survives beside 1
        (11, "s1", "en", ""),  # empty text -> out before anything
    ]
    # 80 clean disjoint docs in s3 (60 tokens each) -> crosses the 4096 bin
    # boundary; ids 100..179 include six % 13 == 0 rows that become (unique,
    # harmless) bench docs and must be excluded from packing
    rows += [(100 + i, "s3", "en", _clean_text(f"s3d{i}")) for i in range(80)]

    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {
        (r["source"], r["bin"], r["n_docs"], r["bin_tokens"], r["fill_ratio"])
        for r in shard_pipeline(df).collect()
    }
    want = _model(rows)
    assert got == want, f"\ngot:  {sorted(got)}\nwant: {sorted(want)}"
    # sanity on the planted cases: s3 crossed a bin boundary, s1 kept
    # exactly docs 1 and 10, s2 exactly doc 9
    assert len({b for (s, b, *_) in want if s == "s3"}) >= 2
    s1 = [(nd, bt) for (s, b, nd, bt, _) in want if s == "s1"]
    assert s1 == [(2, 120)]
    s2 = [(nd, bt) for (s, b, nd, bt, _) in want if s == "s2"]
    assert s2 == [(1, 60)]
