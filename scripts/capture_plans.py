#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix via --suffix, default the
tag's before/after convention is the caller's: pass e.g. ``r13`` and
``--suffix before``). Runs each query builder lazily — no action is
executed, so this is cheap (plan-time only) and safe to run alongside
other work. Queries whose BUILDER executes eager driver work (BPE's
argmax collect, snapshot chains that commit versions) still pay that
build cost; they are planned last and can be skipped with --lazy-only.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from bench import HEADLINE
    from telemetry_parquet_spark.queries import all_queries
    from telemetry_parquet_spark.session import get_session

    names = args.queries or HEADLINE
    spark = get_session("tps-plan-capture")
    queries = all_queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    from telemetry_parquet_spark.session import clear_cached_relations

    for name in names:
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        try:
            df = queries[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(path, "w") as f:
            f.write(plan)
        clear_cached_relations(spark)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
