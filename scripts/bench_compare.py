#!/usr/bin/env python
"""Compare two bench records per query and flag real movers.

Usage:
  python scripts/bench_compare.py BENCH_r03.json BENCH_r04.json [ratio]

Accepts either the driver's BENCH_r{N}.json envelope (with a `tail`
containing the bench JSON line) or a raw bench.py output line saved to a
file. Prints per-query ratios sorted by regression, with the jitter
context the repo documents (PERF.md §2.8: ±20-40% on single runs, so
only ≥`ratio` movers — default 1.5x — are flagged; spreads from the
`runs` field are shown when present so jitter is visible in-place).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)
    except ValueError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict) and "tail" in d:
        m = re.search(r"\{\"metric\".*\}", d["tail"])
        if m:
            return json.loads(m.group(0))
    m = re.search(r"\{\"metric\".*\}", txt)
    if m:
        return json.loads(m.group(0))
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    rows = []
    for name in shared:
        ratio = qb[name] / qa[name] if qa[name] > 0 else float("inf")
        spread = ""
        runs = b.get("runs", {}).get(name)
        if runs:
            spread = f" runs={['%.2f' % r for r in runs]}"
        rows.append((ratio, name, qa[name], qb[name], spread))
    rows.sort(reverse=True)
    print(f"{len(shared)} shared queries; A total={a.get('value')}s B total={b.get('value')}s")
    print(f"only-in-B: {sorted(set(qb) - set(qa))}")
    print(f"\nmovers >= {flag}x (or <= 1/{flag}x):")
    n_flagged = 0
    for ratio, name, va, vb, spread in rows:
        if ratio >= flag or ratio <= 1 / flag:
            n_flagged += 1
            print(f"  {ratio:5.2f}x  {name}: {va:.2f}s -> {vb:.2f}s{spread}")
    if not n_flagged:
        print("  none")
    med = sorted(r[0] for r in rows)[len(rows) // 2]
    print(f"\nmedian ratio {med:.2f}x (uniform shift = environment, not code)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
