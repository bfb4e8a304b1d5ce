"""Registry-wide oracle check at sf0.001 — the same comparison the driver runs.

The full sf0.01 gate is scripts/verify_local.py; this keeps `pytest -x -q`
fast while still exercising every registered query end-to-end vs DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest

from kol_bigdata_realtime_analytics_spark.plans import REGISTRY
from kol_bigdata_realtime_analytics_spark.session import TABLES
from scripts.verify_local import table_hash


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    return con


# Float-aggregation fence allowlist: oracled queries permitted to SUM/AVG a
# raw DOUBLE, each with the proof it cannot tie-flake. Everything else must
# use the registry's order-proof decimal forms (dsum/davg/dsum_raw) — the
# class that produced r3's sql_platform_stats one-ulp ROUND flip.
_FLOAT_AGG_ALLOWED = {
    # momentum frame avg: RANGE frame spans <= 3 window slots, and for n <= 3
    # pairwise (segment-tree) and sequential summation associate identically,
    # so the value is engine- and order-invariant by construction.
    ("trending_momentum", "Average"),
    # same Average, same proof: the equivalence companion embeds
    # momentum_batch's <= 3-slot RANGE-frame avg (and only compares it at
    # rel 1e-9 anyway — a 1-ulp wobble cannot flip its booleans).
    ("momentum_stream_batch_equiv_check", "Average"),
}


def _float_agg_violations(sdf):
    """Walk the analyzed plan for Sum/Average over a DOUBLE/FLOAT child.

    The decimal order-proof forms (registry.dsum/davg) cast the child to
    DECIMAL(18,6) first, so they never trip this; a raw double sum does.
    """

    def jseq(s):
        return [s.apply(i) for i in range(s.size())]

    def walk_expr(e, hits):
        cls = e.getClass().getName()
        if cls.endswith(("aggregate.Sum", "aggregate.Average")):
            ch = jseq(e.children())
            if ch and ch[0].dataType().typeName() in ("double", "float"):
                hits.append((cls.split(".")[-1], ch[0].toString()[:80]))
        for c in jseq(e.children()):
            walk_expr(c, hits)

    def walk_plan(p, hits):
        for e in jseq(p.expressions()):
            walk_expr(e, hits)
        for c in jseq(p.children()):
            walk_plan(c, hits)

    hits: list[tuple[str, str]] = []
    walk_plan(sdf._jdf.queryExecution().analyzed(), hits)
    return hits


# single source of truth for the dtype-family mapping — drifting copies
# would let the pytest fence and the verify_local gate disagree
from scripts.verify_local import _duck_family, _spark_family  # noqa: E402,E501


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_small, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_small)
    oracle = q.oracle_for(sf_small)
    # driver contract fence — REGISTRY-WIDE, rows-only queries included: the
    # driver pandas-sorts every output column even on the no-oracle tier, and
    # array/map/struct values raise "unhashable type: 'list'" (took out
    # embedding_quantize_int8 in r2 and drove embedding_pca_project red in
    # r7 before its row count could even be recorded). Registered outputs
    # must be scalars — stringify arrays (to_json/array_join) or posexplode
    # to long form.
    for col, dt in sdf.dtypes:
        assert not dt.startswith(("array", "map", "struct")), (
            f"{name}.{col} is {dt}: registered queries must emit scalar "
            "columns only (to_json/array_join the array, or posexplode)"
        )
    if oracle is not None:
        # float-aggregation fence: SUM/AVG over a raw DOUBLE is summation-
        # order-dependent (r3: sql_platform_stats hash flake). Every oracled
        # plan must aggregate floats through the decimal order-proof forms
        # or carry an explicit allowlist entry with a determinism proof.
        for agg, child in _float_agg_violations(sdf):
            assert (name, agg) in _FLOAT_AGG_ALLOWED, (
                f"{name}: {agg} over raw double child `{child}` is summation-"
                "order-dependent; use registry.dsum/davg/dsum_raw (decimal "
                "accumulation) in BOTH the Spark plan and the oracle SQL, or "
                "add an allowlist entry with a determinism proof"
            )
    srows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        assert srows is not None  # rows-only check (non-SQL-expressible op)
        return
    # dtype-family fence (r5 root cause of the perennial sql_platform_stats
    # red): DuckDB types SUM(INTEGER) as HUGEINT, which pandas-materializes
    # as float64 ("236.0" vs Spark's "236") — a hash flip the fetchall-based
    # comparison below cannot see (Python ints compare clean). Require every
    # oracle output column to sit in the same type family as the Spark
    # column, and ban HUGEINT outright (integer SUMs must CAST ... AS BIGINT).
    sdt = dict(sdf.dtypes)
    rel = duck.sql(oracle)
    for col, ty in zip(rel.columns, rel.types):
        tname = str(ty).upper()
        assert "HUGEINT" not in tname, (
            f"{name}.{col}: oracle emits {tname}; DuckDB->pandas turns it "
            "into float64 and the driver hash flips — CAST(... AS BIGINT)"
        )
        if col in sdt:
            assert _duck_family(ty) == _spark_family(sdt[col]), (
                f"{name}.{col}: oracle type {ty} vs Spark dtype {sdt[col]} "
                "— pandas materialization drifts, align the casts"
            )
    res = duck.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)


def test_rows_only_canonical_check_rejects_arrays():
    """verify_local's no-oracle tier replicates the driver's pandas
    sort_values canonicalization (r7: embedding_pca_project was driver-red
    on an array<double> output while the local gate stayed green). A planted
    list cell must be rejected; scalar rows must pass."""
    from scripts.verify_local import rows_only_canonical_check

    err = rows_only_canonical_check(["a", "b"], [(1, [1.0, 2.0]), (2, [3.0])])
    assert err is not None and "unhashable" in err

    assert rows_only_canonical_check(["a", "b"], [(1, "x"), (2, "y")]) is None
    assert rows_only_canonical_check(["a"], []) is None


def test_sql_norm_shadows_only_referenced_tables():
    """sql_norm prepends one shadowing CTE per float-bearing table the
    oracle references — and composes with existing WITH / WITH RECURSIVE
    prefixes instead of producing two WITH keywords."""
    from kol_bigdata_realtime_analytics_spark.plans.registry import sql_norm

    plain = sql_norm("SELECT SUM(value) FROM events")
    assert plain.startswith("WITH events AS (SELECT * REPLACE (")
    assert "main.events" in plain and "lineitem" not in plain

    nofloat = "SELECT r_name FROM region"
    assert sql_norm(nofloat) == nofloat  # no float tables -> untouched

    withp = sql_norm("WITH x AS (SELECT 1) SELECT * FROM x, orders")
    assert withp.lower().count("with ") == 1
    assert "orders AS (SELECT * REPLACE" in withp

    rec = sql_norm("WITH RECURSIVE x AS (SELECT 1) SELECT * FROM x, customer")
    assert rec.startswith("WITH RECURSIVE customer AS (")


def test_sql_norm_widens_float32_and_probe_bypasses(tmp_path):
    """End-to-end on a float32-encoded view: a sql_norm'd oracle computes
    over DOUBLE (ROUND returns a clean 2-dp value, not a FLOAT), while the
    probe's enc CTE still sees the RAW encoding via main.events."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kol_bigdata_realtime_analytics_spark.plans.extended import _SQL_PROBE
    from kol_bigdata_realtime_analytics_spark.plans.registry import sql_norm

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([0, 1], type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([1, 1], type=pa.int64()),
            "event_type": pa.array(["view", "view"], type=pa.string()),
            "value": pa.array([151.37, 0.1], type=pa.float32()),
            "props": pa.array(["{}", "{}"], type=pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")

    # shadowed read: value arithmetic runs over DOUBLE
    ty, rounded = con.execute(
        sql_norm("SELECT typeof(value), ROUND(MAX(value), 2) FROM events GROUP BY 1")
    ).fetchone()
    assert ty == "DOUBLE" and rounded == 151.37

    # probe bypass: enc CTE reads main.events -> names the float32 encoding
    rows = con.execute(sql_norm(_SQL_PROBE)).fetchall()
    assert len(rows) == 101 and rows[0][1] == 101
