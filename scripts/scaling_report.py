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


def cross_label_normalizer(rec: dict) -> None:
    """Contended vs uncontended at the SAME sf, normalized by the
    calibration constants both records carry inline: the driver-window
    (contended) record embeds host co-tenancy that is not code — the
    fixed reference workloads' ratio factors it out, so a round-over-
    round driver comparison stops looking like a regression."""
    c, u = rec.get("contended"), rec.get("uncontended")
    if not (c and u and c.get("calibration") and u.get("calibration")):
        print("(no calibrated contended+uncontended pair — skipped)")
        return
    cc, uc = c["calibration"], u["calibration"]
    r_jvm = cc["jvm_codegen_sum_s"] / uc["jvm_codegen_sum_s"]
    r_np = cc["numpy_matmul_s"] / uc["numpy_matmul_s"]
    raw = c["value"] / u["value"]
    print(
        f"contended {c['value']}s vs uncontended {u['value']}s: raw "
        f"{raw:.2f}x; host-speed ratio jvm {r_jvm:.2f}x / numpy "
        f"{r_np:.2f}x; jvm-normalized {raw / r_jvm:.2f}x, "
        f"numpy-normalized {raw / r_np:.2f}x "
        f"(≈1.0 ⇒ the gap is host contention, not code)"
    )


def main() -> None:
    with open(os.path.join(REPO, "BENCH_full.json")) as f:
        rec = json.load(f)
    print("== contended/uncontended calibration normalizer ==")
    cross_label_normalizer(rec)
    print("\n== 10x data-step scaling (sf0.01 -> sf0.1) ==")
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
