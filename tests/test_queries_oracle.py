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


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_small, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_small)
    if q.oracle is not None:
        # driver contract fence: its hash canonicalization pandas-sorts every
        # column, and array/map/struct values raise "unhashable type: 'list'"
        # (took out embedding_quantize_int8 in r2). Oracled outputs must be
        # scalars — emit arrays as to_json text (see user_event_type_sets).
        for col, dt in sdf.dtypes:
            assert not dt.startswith(("array", "map", "struct")), (
                f"{name}.{col} is {dt}: oracled queries must emit scalar "
                "columns only (stringify arrays with to_json)"
            )
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert srows is not None  # rows-only check (non-SQL-expressible op)
        return
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)
