"""Pre-flight the exact driver window: first 50 queries() at sf0.01."""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pyspark.sql import SparkSession
import __spark_entry__ as E
from tests.oracle_utils import duckdb_conn, compare

spark = SparkSession.builder.master("local[16]").getOrCreate()
con = duckdb_conn("/root/testdata/sf0.01")
qs, os_ = E.queries(), E.oracle_sql()
out = {}
for name in list(qs)[:50]:
    t0 = time.time()
    try:
        if name in os_:
            problems = compare(qs[name](spark, "/root/testdata/sf0.01"), con, os_[name])
            out[name] = problems or "OK"
        else:
            out[name] = f"rows-only:{qs[name](spark, '/root/testdata/sf0.01').count()}"
    except Exception as e:
        out[name] = f"ERROR: {e}"
    print(f"{name}: {out[name]} ({time.time()-t0:.1f}s)", flush=True)
bad = {k: v for k, v in out.items() if v != "OK" and not str(v).startswith("rows-only")}
print("BAD:", json.dumps(bad, default=str) if bad else "none")
