#!/usr/bin/env python
"""Scaling evidence from BENCH_full.json: per-query wall-clock ratio
across a 10x data step (sf0.01 -> sf0.1, both uncontended min-of-N runs)
with a data-bound / overhead-bound classification.

Reading the column: at 10x data a perfectly data-bound single-pass query
costs <= 10x (local[32] has spare cores at sf0.01, so usually much
less); a ratio near 1 means the query is overhead-bound at this scale
(fixed costs dominate — JVM/codegen/driver barriers), and anything well
ABOVE 10x would flag superlinear work (none should exist).

Run from the repo root after both labeled bench runs:
    python scripts/scaling_report.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(REPO, "BENCH_full.json")) as f:
        rec = json.load(f)
    small = rec.get("scaling_sf0.01_sf0.01") or rec.get("smoke_sf0.01")
    big = rec["uncontended"]
    sq, bq = small["queries"], big["queries"]
    common = sorted(set(sq) & set(bq))
    rows = []
    for q in common:
        r = bq[q] / sq[q] if sq[q] > 0 else float("inf")
        kind = (
            "overhead-bound" if r < 2.0
            else "sublinear" if r < 10.0
            else "linear" if r < 13.0
            else "SUPERLINEAR"
        )
        rows.append((q, sq[q], bq[q], r, kind))
    rows.sort(key=lambda t: -t[3])
    print("| query | sf0.01 s | sf0.1 s | 10x-data ratio | class |")
    print("|---|---|---|---|---|")
    for q, a, b, r, kind in rows:
        print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f}x | {kind} |")
    n_bad = sum(1 for *_, k in rows if k == "SUPERLINEAR")
    print(
        f"\n{len(rows)} common queries; "
        f"{sum(1 for *_, k in rows if k == 'overhead-bound')} overhead-bound, "
        f"{sum(1 for *_, k in rows if k in ('sublinear', 'linear'))} "
        f"data-bound, {n_bad} superlinear"
    )


if __name__ == "__main__":
    main()
