#!/usr/bin/env python
"""Isolated per-query timing: fresh engine session, warm-up, min-of-N with
residue clearing — the bench protocol for a SUBSET of queries, without the
119-query session. Optionally times with the noop sink (guide §1.4) instead
of count() so the measurement covers every column of every row.

Usage:
    python scripts/time_queries.py q1_pricing_summary graph_pagerank
    python scripts/time_queries.py --noop --repeats 3 dsir_importance_select
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--noop", action="store_true",
                    help="time df.write.format('noop') instead of count()")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from telemetry_parquet_spark.queries import all_queries
    from telemetry_parquet_spark.session import clear_cached_relations, get_session
    from telemetry_parquet_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_session("tps-time-queries")
    spark.range(1_000_000).count()
    spark.range(32_000).repartition(32).mapInPandas(lambda it: it, "id long").count()
    for t in TABLE_NAMES:
        load_table(spark, args.sf_dir, t).limit(1).count()

    queries = all_queries()
    out: dict[str, float] = {}
    for name in args.queries:
        fn = queries[name]
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            best = min(best, time.perf_counter() - t0)
            clear_cached_relations(spark)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]} s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
