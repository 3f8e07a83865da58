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


def trend() -> None:
    """--trend: the per-round calibration-normalized series over
    BENCH_r{N}.json, so verdicts stop re-deriving it by hand. Each
    driver record's tail carries the compact summary (always parseable)
    and, from r12 on, the inline calibration probes; the normalized
    column divides the wall total by (numpy probe / steady reference)
    — ≈flat ⇒ host drift, rising ⇒ code or coverage growth (see the
    query-count column)."""
    import glob
    import re

    steady = float(os.environ.get("SPARK_GRAFT_STEADY_NUMPY_S", "3.15"))
    print("| round | queries | total s | numpy probe s | "
          "normalized s (steady host) |")
    print("|---|---|---|---|---|")
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            rec = json.load(f)
        tail = rec.get("tail", "")
        m = re.findall(
            r'\{"metric": "headline_queries_total", "value": ([0-9.]+), '
            r'"unit": "sec", "sf": [0-9.]+\}', tail)
        value = float(m[-1]) if m else None
        nq = None
        full = re.search(
            r'\{"metric": "headline_queries_total".*"queries": .*\}',
            tail)
        if full:
            try:
                nq = len(json.loads(full.group(0))["queries"])
            except ValueError:  # full record head-truncated by the tail
                qm = re.search(r'"queries": \{(.*?)\}', tail)
                nq = len(qm.group(1).split(",")) if qm else None
        cm = re.search(
            r'"calibration": \{"numpy_matmul_s": ([0-9.]+)', tail)
        probe = float(cm.group(1)) if cm else None
        rn = rec.get("n", "?")
        if value is None:
            print(f"| r{rn} | — | (tail unparseable) | — | — |")
            continue
        norm = f"{value / (probe / steady):.1f}" if probe else "—"
        print(f"| r{rn} | {nq if nq else '—'} | {value:.1f} | "
              f"{probe if probe else '—'} | {norm} |")


if __name__ == "__main__":
    import sys as _sys

    if "--trend" in _sys.argv:
        trend()
    else:
        main()
