"""Registry mapping query names to Spark builders + DuckDB oracle SQL.

Each registered query is a pure function (spark, sf_dir) -> DataFrame whose
column names/aliases EXACTLY match its oracle SQL (the driver sorts columns
by name before value-hashing — see repo contract in __spark_entry__.py).

Determinism rules enforced across the registry so Spark and DuckDB hash
identically:
- every float output is F.round()'ed (2 decimals for large sums, 6 for
  ratios/averages/scores) in BOTH engines;
- timestamps are emitted as epoch MICROSECONDS (bigint) — integer compare,
  no tz/format ambiguity (Spark session tz pinned to UTC regardless);
- every LIMIT query sorts on a tie-breaking unique key;
- counts/sums of integers are CAST to BIGINT on the DuckDB side (duckdb
  SUM(BIGINT) returns HUGEINT which would mismatch the schema).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""
    #: sf-dependent oracle builder, for queries whose oracle must embed a
    #: data-fitted artifact (e.g. the quantized PCA rotation): called with
    #: the sf dir and returns raw SQL (sql_norm is applied on resolution).
    #: The driver's contract is a static dict built for ITS sf (0.01) —
    #: see get_oracles(); verify_local/pytest resolve per actual sf.
    oracle_fn: Callable[[str], str] | None = None

    def oracle_for(self, sf_dir: str) -> str | None:
        if self.oracle_fn is not None:
            return sql_norm(self.oracle_fn(sf_dir))
        return self.oracle


REGISTRY: dict[str, Query] = {}

#: float-bearing TESTDATA columns. Spark-side scans normalize FloatType to
#: double in table(); the oracle side gets the SAME normalization via
#: sql_norm's shadowing CTEs so both engines compute over doubles whatever
#: the parquet encoding. embeddings.embedding is excluded — every embedding
#: oracle already casts `::DOUBLE[]` inline.
_FLOAT_COLS: dict[str, list[str]] = {
    "events": ["value"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
}


def sql_norm(sql: str) -> str:
    """Prefix a DuckDB oracle with shadowing CTEs that widen every float
    column of the referenced TESTDATA tables to DOUBLE.

    The encoding fence, closed registry-wide (r5): on float32-encoded
    parquet, DuckDB runs FLOAT arithmetic/rounding (ROUND(FLOAT) returns
    FLOAT; x*1e6 rounds to 24-bit mantissa) while the Spark side always
    computes over table()-normalized doubles — a full-registry sweep on a
    float32-re-encoded sf0.001 measured 27 of 186 oracles hash-diverging.
    `WITH <t> AS (SELECT * REPLACE (CAST(c AS DOUBLE) AS c, ...) FROM
    main.<t>)` shadows the driver-registered view (DuckDB resolves the
    inner reference via the explicit main. schema), is a no-op on
    double-encoded data, and composes with oracles that already start
    with WITH / WITH RECURSIVE. Only tables actually referenced are
    shadowed, so texts stay readable.
    """
    import re

    used = [
        (t, cols)
        for t, cols in _FLOAT_COLS.items()
        if re.search(rf"\b{t}\b", sql)
    ]
    if not used:
        return sql
    ctes = ", ".join(
        f"{t} AS (SELECT * REPLACE ("
        + ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in cols)
        + f") FROM main.{t})"
        for t, cols in used
    )
    stripped = sql.lstrip()
    lead = sql[: len(sql) - len(stripped)]
    low = stripped.lower()
    if low.startswith("with recursive"):
        return f"{lead}WITH RECURSIVE {ctes}, {stripped[len('with recursive'):].lstrip()}"
    if low.startswith("with"):
        return f"{lead}WITH {ctes}, {stripped[len('with'):].lstrip()}"
    return f"{lead}WITH {ctes} {stripped}"


def register(name: str, oracle=None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder.

    `oracle` is static SQL text, a callable (sf_dir -> SQL text) for oracles
    that must embed data-fitted artifacts, or None (rows-only check). Texts
    are passed through sql_norm so the whole registry is parquet-encoding-
    proof by construction; callable oracles are normalized on resolution.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=sql_norm(oracle) if isinstance(oracle, str) else None,
            doc=fn.__doc__ or "",
            oracle_fn=oracle if callable(oracle) else None,
        )
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY.values()}


#: The driver runs oracle_sql() against sf0.01 (its documented contract sf);
#: sf-dependent oracles therefore materialize for this dir by default, and
#: verify_local/pytest pass their actual sf explicitly.
DRIVER_SF_DIR = "/root/testdata/sf0.01"


def get_oracles(sf_dir: str = DRIVER_SF_DIR) -> dict[str, str]:
    out = {}
    for q in REGISTRY.values():
        sql = q.oracle_for(sf_dir)
        if sql is not None:
            out[q.name] = sql
    return out


# ---------------------------------------------------------------------------
# Order-proof float aggregation (PERF.md §3). SUM/AVG over raw doubles is
# summation-order-dependent: partial-agg order differs with partitioning, and
# ROUND can flip on a one-ulp tie (r3's sql_platform_stats). The canonical
# deterministic form sums in DECIMAL(18,6) — exact integer arithmetic at 6dp,
# identical under any summation order — then converts to DOUBLE so the output
# schema matches the historical one and both engines round the SAME value.
# Use dsum/davg on the Spark side and sql_dsum/sql_davg in the oracle text;
# tests/test_queries_oracle.py fences any SUM/AVG over double outside these.
# ---------------------------------------------------------------------------

_DEC = "decimal(18,6)"


def _as_col(col):
    from pyspark.sql import functions as F

    return F.col(col) if isinstance(col, str) else col


def dsum(col, scale: int = 2):
    """Summation-order-proof ROUND(SUM(col), scale) over a double column/expr."""
    from pyspark.sql import functions as F

    return F.round(F.sum(_as_col(col).cast(_DEC)), scale).cast("double")


def davg(col, scale: int = 6):
    """Order-proof truncated average: decimal sum -> double / count, floored
    at `scale` decimals.

    Truncation, NOT round: the decimal sum makes the quotient a CLEAN
    rational, which can land exactly on a half-tie at scale+1 digits —
    where Spark (HALF_UP on the shortest decimal repr) and DuckDB (round
    the binary value) disagree (caught live: composite_leaderboard at
    sf0.1). floor(x * 10^s) is a total function of the double's binary
    value, identical in every engine."""
    from pyspark.sql import functions as F

    p = 10**scale
    return F.floor((F.sum(_as_col(col).cast(_DEC)).cast("double") / F.count(_as_col(col))) * p) / p


def dsum_raw(col):
    """Order-proof unrounded sum as double (for downstream arithmetic)."""
    from pyspark.sql import functions as F

    return F.sum(_as_col(col).cast(_DEC)).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB oracle fragment matching dsum() exactly.

    The inner CAST(... AS DOUBLE) is the parquet-encoding fence (r4 verdict
    ask 1): on a float32-encoded column Spark casts float->decimal binary-
    exact (151.37f -> 151.369995) while DuckDB goes through the shortest
    decimal repr (-> 151.370000); routing both engines through DOUBLE first
    makes them agree exactly, and on double-encoded data it is a no-op.
    table() applies the matching FloatType->double normalization Spark-side.
    """
    return f"CAST(ROUND(SUM(CAST(CAST({expr} AS DOUBLE) AS DECIMAL(18,6))), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB oracle fragment matching davg() exactly (truncated average).

    CAST-to-DOUBLE-first for the same encoding fence as sql_dsum."""
    p = 10**scale
    return (
        f"floor(CAST(SUM(CAST(CAST({expr} AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) * {p}) / {p}"
    )


def sql_dsum_raw(expr: str) -> str:
    """DuckDB oracle fragment matching dsum_raw() exactly.

    CAST-to-DOUBLE-first for the same encoding fence as sql_dsum."""
    return f"CAST(SUM(CAST(CAST({expr} AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)"


def hash52(col):
    """52-bit integer from the md5 hex prefix of a string column/expr —
    the engine-pair row hash (exact in a DOUBLE and in DECIMAL sums;
    13 hex chars = 52 bits). MUST stay in lockstep with sql_hash52."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(_as_col(col)), 1, 13), 16, 10).cast("long")


def sql_hash52(expr: str) -> str:
    """DuckDB oracle fragment matching hash52() exactly."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 13)) AS BIGINT)"


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType whatever the parquet encoding.

    The testdata contract has shipped `ts` three ways across rounds:
    int64 epoch-nanos read as BIGINT (via the nanosAsLong legacy conf),
    TIMESTAMP(MICROS/NANOS, isAdjustedToUTC=false) read as TIMESTAMP_NTZ,
    and plain TIMESTAMP. Branch on the OBSERVED dtype so every encoding
    yields identical UTC instants (session tz is pinned to UTC, so the
    NTZ wall-time -> TIMESTAMP cast is exactly DuckDB's epoch_us view;
    note unix_micros() rejects NTZ, so the cast is required, not cosmetic).
    Works on batch and streaming frames alike — dtypes come from the
    analyzed schema, not the data.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # epoch-nanos long; integer div, no double round-trip. Fence the
        # UNIT assumption (r3 advice): if a future testdata round ships
        # epoch-micros/millis instead, silently scaling by 1000x would shift
        # every instant by centuries — divide by the magnitude-implied unit.
        # Plausible data years (1990-2100) put epoch-nanos at ~6e17-4e18,
        # micros at ~6e14-4e15, millis at ~6e11-4e12, SECONDS at ~6e8-4e9:
        # the decade bands don't overlap, so a CASE on the absolute
        # magnitude is exact — including the most common epoch unit,
        # seconds, which an earlier fence missed (anything < 1e14 was
        # treated as millis, so epoch-seconds data would have decoded to
        # January 1970). Branches are per-row expressions — batch and
        # streaming frames alike, no action.
        us = (
            F.when(F.abs(F.col("ts")) >= F.lit(10**17), F.expr("ts div 1000"))
            .when(F.abs(F.col("ts")) >= F.lit(10**14), F.col("ts"))
            .when(F.abs(F.col("ts")) >= F.lit(10**11), F.col("ts") * 1000)
            .otherwise(F.col("ts") * 1_000_000)
        )
        return df.withColumn("ts", F.timestamp_micros(us))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def normalize_floats(df: DataFrame) -> DataFrame:
    """Cast every top-level FloatType column to double (no-op otherwise).

    Parquet-encoding fence (r4 verdict): a column shipped as float32 reads
    as FloatType, and Spark's float->decimal cast is binary-exact while
    DuckDB's goes through the shortest decimal repr — per-row 5e-6
    divergences that flip value hashes while rows/schema still match.
    Normalizing the scan to double (paired with CAST(... AS DOUBLE) inside
    the sql_dsum/sql_davg oracle fragments) makes both engines agree exactly
    whatever the file encoding. Schema-only branch: zero cost on
    double-encoded data, and float->double widening is value-exact.
    """
    from pyspark.sql import functions as F

    floats = [c for c, dt in df.dtypes if dt == "float"]
    for c in floats:
        df = df.withColumn(c, F.col(c).cast("double"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one TESTDATA table (columnar, pushdown-eligible).

    events.ts is normalized to TimestampType via normalize_event_ts, and any
    FloatType column to double via normalize_floats — encoding-adaptive, so
    testdata regeneration can't break every reader.
    """
    # pin UTC at runtime: parquet micros timestamps surface as TIMESTAMP_NTZ
    # and any NTZ -> TIMESTAMP cast must interpret wall time as UTC to match
    # DuckDB's UTC-naive epoch_us, whatever session the caller created.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # harmless on micros files; required to read TIMESTAMP(NANOS) at all
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_floats(normalize_event_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet")))
    return normalize_floats(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def events_stream_source(spark: SparkSession, sf_dir: str, **options: str) -> DataFrame:
    """readStream over events.parquet with the SAME ts normalization as
    table() — the single streaming entry point for the events table (the
    six per-query inline copies this replaces were exactly the duplication
    disease SURVEY §1.2 flags in the reference's four parse_count copies).

    File stream sources need a DIRECTORY path; pathGlobFilter narrows the
    listing to the one table file. Extra reader options (e.g.
    maxFilesPerTrigger="1") pass through.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(raw_schema).option("pathGlobFilter", "events.parquet")
    for k, v in options.items():
        reader = reader.option(k, v)
    return normalize_floats(normalize_event_ts(reader.parquet(sf_dir)))
