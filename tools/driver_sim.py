"""Simulate the driver's verify: plain SparkSession, entry smoke, t2 loop."""
import sys, hashlib, time, datetime as dt
from decimal import Decimal
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

# plain session, as the driver would build it (no engine confs!)
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# t1 smoke
rows = e.entry(spark).collect()
print("T1 SMOKE rows:", len(rows))
assert len(rows) > 0

# t2: every query vs oracle at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, Decimal): return float(v)
    if isinstance(v, float): return round(v, 9)
    if isinstance(v, dt.datetime): return v.replace(tzinfo=None).isoformat()
    return v

def vhash(cols, rows):
    h = hashlib.md5()
    for r in sorted(repr(tuple(norm(x) for x in r)) for r in rows):
        h.update(r.encode())
    return h.hexdigest()

qs, osql = e.queries(), e.oracle_sql()
ok = bad = 0
t_start = time.perf_counter()
timings = {}
for name, fn in sorted(qs.items()):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    scols = sorted(df.columns)
    srows = [tuple(r[c] for c in scols) for r in df.collect()]
    if name not in osql:
        timings[name] = time.perf_counter() - t0
        print(f"  {name}: rows-only, {len(srows)} rows [{timings[name]:.2f}s]"); ok += 1; continue
    cur = con.execute(osql[name])
    dnames = [d[0] for d in cur.description]
    order = sorted(range(len(dnames)), key=lambda i: dnames[i])
    dcols = [dnames[i] for i in order]
    drows = [tuple(r[i] for i in order) for r in cur.fetchall()]
    match = (scols == dcols and len(srows) == len(drows)
             and vhash(scols, srows) == vhash(dcols, drows))
    timings[name] = time.perf_counter() - t0
    print(f"  {name}: cols={scols==dcols} rows={len(srows)}/{len(drows)} hash={'MATCH' if match else 'MISMATCH'} [{timings[name]:.2f}s]")
    ok += match; bad += (not match)
slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
print("slowest:", ", ".join(f"{n}={t:.1f}s" for n, t in slow))
print(f"T2: {ok} ok, {bad} mismatched, total {time.perf_counter() - t_start:.1f}s")
sys.exit(1 if bad else 0)
