#!/usr/bin/env python
"""Compare two bench records per query and flag real movers.

Usage:
  python scripts/bench_compare.py A.json B.json [ratio]

Accepts, for either side:
  - a BENCH_DETAIL.json (per-query `runs_sec` spreads + the 5-sample
    `calibration_sec` machine fingerprint — the preferred input);
  - the driver's BENCH_r{N}.json envelope (with a `tail` containing the
    bench JSON line) or a raw bench.py output line saved to a file
    (totals + top-10 only — no per-query compare, no calibration).

When BOTH sides carry a calibration fingerprint, every per-query wall is
divided by its file's calibration median before computing ratios —
machine-speed differences between the two runs cancel out (r10 verdict
ask #6: the r9 "regression" was a loaded host, adjudicated with exactly
this normalization done by hand). Raw and normalized medians are both
printed; movers are flagged on the normalized ratio when available.

Jitter context (PERF.md §2.8): single runs spread ±20-40%, so only
>= `ratio` movers — default 1.5x — are flagged; per-run spreads are
shown so jitter is visible in-place. Forced-cold queries' run 1 is a
different regime (from-scratch build): when a `cold_sec` map is present
the warm min excludes it, mirroring bench.py's own billing.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load(path: str) -> dict:
    """-> {queries: {name: warm_sec}, runs: {...}, calibration: float|None,
    total: float|None, cold: {...}}"""
    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)
    except ValueError:
        d = None
    if isinstance(d, dict) and "runs_sec" in d:  # BENCH_DETAIL.json
        cold = d.get("cold_sec", {})
        queries = {}
        for name, runs in d["runs_sec"].items():
            pool = runs[1:] if name in cold and len(runs) > 1 else runs
            queries[name] = min(pool)
        calib = d.get("calibration_sec") or None
        return {
            "queries": queries,
            "runs": d["runs_sec"],
            "cold": cold,
            "calibration": statistics.median(calib) if calib else None,
            "total": round(sum(queries.values()), 3),
        }
    if isinstance(d, dict) and "queries" in d:  # legacy bench line w/ map
        return {
            "queries": d["queries"],
            "runs": d.get("runs", {}),
            "cold": {},
            "calibration": None,
            "total": d.get("value"),
        }
    line = None
    if isinstance(d, dict) and "tail" in d:
        m = re.search(r"\{\"metric\".*\}", d["tail"])
        if m:
            line = json.loads(m.group(0))
    if line is None:
        m = re.search(r"\{\"metric\".*\}", txt)
        if m:
            line = json.loads(m.group(0))
    if line is not None:  # contract line: totals only
        return {
            "queries": {k: v / 1000.0 for k, v in line.get("slowest_ms", {}).items()},
            "runs": {},
            "cold": {},
            "calibration": None,
            "total": line.get("value"),
        }
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ca, cb = a["calibration"], b["calibration"]
    norm = ca is not None and cb is not None and ca > 0 and cb > 0
    rows = []
    for name in shared:
        if qa[name] <= 0:
            continue
        raw = qb[name] / qa[name]
        nrm = (qb[name] / cb) / (qa[name] / ca) if norm else raw
        spread = ""
        runs = b.get("runs", {}).get(name)
        if runs:
            spread = f" runs={['%.2f' % r for r in runs]}"
        rows.append((nrm, raw, name, qa[name], qb[name], spread))
    rows.sort(reverse=True)
    print(
        f"{len(shared)} shared queries; A total={a.get('total')}s "
        f"B total={b.get('total')}s"
    )
    if norm:
        print(
            f"calibration medians: A={ca:.3f}s B={cb:.3f}s "
            f"(machine-speed factor B/A = {cb / ca:.3f}x — ratios below are "
            f"normalized by it; raw shown alongside)"
        )
    else:
        print("calibration absent on one side — raw ratios only")
    print(f"only-in-B: {sorted(set(qb) - set(qa))}")
    print(f"\nmovers >= {flag}x (or <= 1/{flag}x, {'normalized' if norm else 'raw'}):")
    n_flagged = 0
    for nrm, raw, name, va, vb, spread in rows:
        if nrm >= flag or nrm <= 1 / flag:
            n_flagged += 1
            tag = f" raw={raw:.2f}x" if norm else ""
            print(f"  {nrm:5.2f}x  {name}: {va:.2f}s -> {vb:.2f}s{tag}{spread}")
    if not n_flagged:
        print("  none")
    if rows:
        med_n = statistics.median(r[0] for r in rows)
        med_r = statistics.median(r[1] for r in rows)
        if norm:
            print(
                f"\nmedian normalized ratio {med_n:.3f}x (raw {med_r:.3f}x; "
                f"a raw shift that vanishes under normalization = environment)"
            )
        else:
            print(f"\nmedian ratio {med_r:.3f}x (uniform shift = environment, not code)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
