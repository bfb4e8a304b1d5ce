"""Text-analysis column functions for the LLM-data-pipeline surface.

All native expressions (split/regexp/aggregate) — these run inside
whole-stage codegen over billions of documents; a Python UDF here would be
the single slowest thing in a 100 TB pipeline.

Mirrored DuckDB SQL for each function lives next to it so the oracle can't
drift from the Spark expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# whitespace tokenization; trim first so no leading/trailing empty tokens
def tokens(text: Column | str) -> Column:
    """array<string> of whitespace-separated tokens (empty array for blank/null)."""
    t = F.trim(F.coalesce(_c(text), F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


TOKEN_COUNT_ORACLE_SQL = (
    "CASE WHEN trim(COALESCE({col}, '')) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END"
)


def avg_token_length(text: Column | str) -> Column:
    """Mean token length in characters, 0.0 for empty docs."""
    tk = tokens(text)
    n = F.size(tk)
    total = F.aggregate(tk, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


AVG_TOKEN_LENGTH_ORACLE_SQL = (
    "CASE WHEN trim(COALESCE({col}, '')) = '' THEN 0.0 "
    "ELSE CAST(list_sum(list_transform(regexp_split_to_array(trim({col}), '\\s+'), t -> len(t))) AS DOUBLE)"
    "     / len(regexp_split_to_array(trim({col}), '\\s+')) END"
)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation (.,!?;:'\"()-), 0.0 for empty."""
    t = F.coalesce(_c(text), F.lit(""))
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.,!?;:'\"()\-]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


PUNCT_RATIO_ORACLE_SQL = (
    "CASE WHEN len(COALESCE({col}, '')) > 0 "
    "THEN CAST(len(regexp_replace({col}, '[^.,!?;:''\"()\\-]', '', 'g')) AS DOUBLE) / len({col}) "
    "ELSE 0.0 END"
)

#: tiny English stopword list used by the n-gram-heuristic language id and
#: the stopword-ratio quality feature. Deliberately small + fixed: the point
#: is a deterministic, vectorizable heuristic, not linguistic accuracy.
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are EN stopwords (lowercased exact match)."""
    tk = tokens(text)
    n = F.size(tk)
    sw = F.size(F.filter(tk, lambda x: F.lower(x).isin(*EN_STOPWORDS)))
    return F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))


def _sw_list_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


STOPWORD_RATIO_ORACLE_SQL = (
    "CASE WHEN trim(COALESCE({col}, '')) = '' THEN 0.0 "
    "ELSE CAST(len(list_filter(regexp_split_to_array(trim({col}), '\\s+'), "
    f"t -> list_contains({_sw_list_sql()}, lower(t)))) AS DOUBLE) "
    "/ len(regexp_split_to_array(trim({col}), '\\s+')) END"
)


def language_id(text: Column | str) -> Column:
    """Heuristic language id: 'en' if >= 3% of tokens are EN stopwords and the
    text is ASCII-dominant; 'unknown' otherwise. (The reference never does
    language id; this is the LLM-pipeline extension — a real deployment swaps
    in fastText via a pandas UDF, same column contract.)"""
    ratio = stopword_ratio(text)
    ascii_ok = _c(text).rlike(r"^[\x00-\x7F]*$")
    return F.when((ratio >= 0.03) & ascii_ok, "en").otherwise("unknown")


LANGUAGE_ID_ORACLE_SQL = (
    "CASE WHEN ({sw_ratio}) >= 0.03 AND regexp_matches(COALESCE({col}, ''), '^[\\x00-\\x7F]*$') "
    "THEN 'en' ELSE 'unknown' END"
)


def quality_score(text: Column | str) -> Column:
    """Document quality in [0, 1]: rewards mid-length docs, light punctuation,
    and a natural stopword rate. quality = length_term * (1 - min(punct, .5))
    * (0.5 + min(stopword_ratio, 0.5)); length_term = min(n_tokens/100, 1)."""
    n = token_count(text).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    p = F.least(punct_ratio(text), F.lit(0.5))
    s = F.least(stopword_ratio(text), F.lit(0.5))
    return length_term * (F.lit(1.0) - p) * (F.lit(0.5) + s)


def doc_fingerprint_md5(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lowercased text. Stable across engines (md5 is md5 everywhere) — the
    exact-dedup key at any scale."""
    norm = F.lower(F.regexp_replace(F.trim(F.coalesce(_c(text), F.lit(""))), r"\s+", " "))
    return F.md5(norm)


DOC_FINGERPRINT_ORACLE_SQL = (
    "md5(lower(regexp_replace(trim(COALESCE({col}, '')), '\\s+', ' ', 'g')))"
)


def chunk_bounds(n_tokens: Column, chunk_tokens: int, overlap: int) -> Column:
    """array of chunk start indices (0-based) covering n_tokens tokens with
    fixed-size overlapping windows: starts at 0, step = chunk - overlap;
    n_chunks = ceil((n - overlap) / step), min 1 for non-empty docs."""
    step = chunk_tokens - overlap
    n_chunks = F.greatest(
        F.lit(1), ((n_tokens - overlap + step - 1) / step).cast("long")
    )
    return F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * step)


def chunk_documents(
    df,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
):
    """Split documents into fixed-token overlapping chunks — the unit every
    LLM training/embedding pipeline feeds downstream (context windows are
    bounded; overlap keeps boundary sentences attested in two chunks).

    Fully native: tokenize once, posexplode the start-index array, slice
    the token array per chunk, re-join with spaces. One generator, no UDF;
    the chunk fan-out is columnar so a 100 TB corpus chunks in one scan.
    Empty docs emit no chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    tok = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), tok.alias("_tok"), F.size(tok).cast("long").alias("_n")
    ).filter(F.col("_n") > 0)
    starts = chunk_bounds(F.col("_n"), chunk_tokens, overlap)
    chunk = F.slice(F.col("_tok"), F.col("_start").cast("int") + 1, chunk_tokens)
    return (
        base.select(
            id_col, "_tok", F.posexplode(starts).alias("chunk_idx", "_start")
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).cast("long").alias("chunk_tokens"),
        )
    )


#: DuckDB rendering of the same chunking (for oracle SQL): {chunk}/{overlap}
#: are int literals, {col}/{id} column names. Kept adjacent so the two
#: formulations can't drift silently.
CHUNK_ORACLE_SQL = """
WITH tokd AS (
  SELECT {id} AS doc_id,
         regexp_split_to_array(trim({col}), '\\s+') AS tok,
         len(regexp_split_to_array(trim({col}), '\\s+')) AS n
  FROM {table} WHERE trim(COALESCE({col}, '')) != ''
),
idx AS (
  SELECT doc_id, tok,
         unnest(range(0, CAST(GREATEST(1, (n - {overlap} + {step} - 1) // {step}) AS BIGINT))) AS chunk_idx
  FROM tokd
)
SELECT doc_id, chunk_idx,
       array_to_string(tok[chunk_idx * {step} + 1 : chunk_idx * {step} + {chunk}], ' ') AS chunk_text,
       CAST(len(tok[chunk_idx * {step} + 1 : chunk_idx * {step} + {chunk}]) AS BIGINT) AS chunk_tokens
FROM idx
""".strip()
