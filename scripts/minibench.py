#!/usr/bin/env python
"""Isolated per-query timing for optimization work (guide §1): runs the
named queries through the same noop-sink methodology as bench.py (forced
cold first run for the cache-backed queries, then warm runs) and prints a
small table. Usage:
    python scripts/minibench.py q1 q2 ...  [env: SPARK_GRAFT_SF_DIR, N_RUNS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _FORCED_COLD, _clear_index_caches  # noqa: E402
from kol_bigdata_realtime_analytics_spark.plans import REGISTRY  # noqa: E402
from kol_bigdata_realtime_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    # validate BEFORE paying Spark session startup + calibration (r11 advice)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries (not in REGISTRY): {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("N_RUNS", "3"))
    spark = get_spark(app_name="minibench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cal = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr(
            "sum(id * 3 + 1)", "count(distinct id % 1000)"
        ).collect()
        cal.append(round(time.perf_counter() - t0, 3))
    print(f"calibration: {cal}", flush=True)
    for name in names:
        q = REGISTRY[name]
        if name in _FORCED_COLD:
            _clear_index_caches()
        runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name:42s} {runs}", flush=True)


if __name__ == "__main__":
    main()
