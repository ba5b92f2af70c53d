#!/usr/bin/env python
"""Driver-contract simulator (verify skill): plain SparkSession (driver
defaults: no AQE tuning, 200 shuffle partitions), import
__spark_entry__, smoke entry(), run every queries()[name] at sf0.01 and
compare to oracle_sql()[name] via DuckDB using sorted-column,
sorted-row canonical tuples with floats at %.9g.

Usage: python /tmp/verify/driver_sim.py [tz] [sf_dir] [out_json] [only...]
Run from a cwd OUTSIDE the repo to probe worker-import robustness.
"""
import json
import sys
import time

import duckdb
from pyspark.sql import SparkSession

TZ = sys.argv[1] if len(sys.argv) > 1 else "Asia/Kathmandu"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = sys.argv[3] if len(sys.argv) > 3 else ""
ONLY = set(sys.argv[4:])
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

sys.path.insert(0, "/root/repo")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", TZ)
    .config("spark.driver.memory", "8g")
    .appName("driver-sim")
    .getOrCreate()
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import __spark_entry__ as e  # noqa: E402
from introduction_in_big_data_spark.plans import typeaudit  # noqa: E402


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            vals.append("%.9g" % v if isinstance(v, float) else str(v))
        out.append("\x1f".join(vals))
    return sorted(out)


entry_rows = e.entry(spark).count()
qs, os_ = e.queries(), e.oracle_sql()
res, npass, nfail, nrows = {}, 0, 0, 0
t0 = time.time()
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    try:
        sdf = fn(spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            res[name] = {"rows": len(srows), "check": "rows-only"}
            nrows += 1
            continue
        o = con.sql(os_[name])
        ocols, otypes = list(o.columns), list(o.types)
        orows = o.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        # Declared-type audit: the real driver's hash is type-sensitive
        # (HUGEINT vs LONG diverges on identical values — r3's q12);
        # stringified-value comparison alone is blind to that class.
        s_sig = typeaudit.schema_signature_spark(sdf.schema)
        d_sig = typeaudit.schema_signature_duck(ocols, otypes)
        type_mism = typeaudit.signature_mismatches(s_sig, d_sig)
        ok_types = not type_mism
        ok_hash = (
            ok_rows and ok_schema and ok_types
            and canon(scols, srows) == canon(ocols, orows)
        )
        res[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                     "types_match": ok_types, "hash_match": ok_hash,
                     "rows": len(srows)}
        if ok_hash:
            npass += 1
        else:
            nfail += 1
            print(f"FAIL {name}: rows={ok_rows} schema={ok_schema} "
                  f"types={type_mism or 'ok'}", flush=True)
    except Exception as ex:  # noqa: BLE001
        nfail += 1
        res[name] = {"err": repr(ex)[:300]}
        print(f"ERROR {name}: {ex!r}"[:300], flush=True)

summary = {"sf": SF, "tz": TZ, "entry_rows": entry_rows, "pass": npass,
           "rows_only": nrows, "fail": nfail, "total_sec": round(time.time() - t0, 1)}
print(json.dumps(summary))
if OUT:
    with open(OUT, "w") as f:
        json.dump({**summary, "queries": res}, f, indent=1)
spark.stop()
