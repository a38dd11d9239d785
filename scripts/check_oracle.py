"""Local emulation of the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive value
hash.  Usage: python scripts/check_oracle.py [query ...]
"""

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x00".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        import time as _time

        t0 = _time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            results[name] = {"err": f"spark: {type(e).__name__}: {e}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            results[name] = {"spark_rows": len(srows), "rows_only": True,
                             "err": None}
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            results[name] = {"err": f"duckdb: {e}"}
            failures += 1
            continue
        sh = frame_hash([c.lower() for c in scols], srows)
        oh = frame_hash(ocols, orows)
        cols_ok = sorted(c.lower() for c in scols) == sorted(ocols)
        ok = len(srows) == len(orows) and sh == oh and cols_ok
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures += 1
        results[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": cols_ok,
            "hash_match": sh == oh,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
        }
        print(
            f"{status}  {name}: spark={len(srows)} duck={len(orows)} "
            f"hash {'=' if sh == oh else '≠'} cols {'=' if cols_ok else '≠'} "
            f"[{_time.time() - t0:.1f}s]"
        )
        if status == "FAIL" and len(srows) and len(orows):
            order_s = sorted(range(len(scols)), key=lambda i: scols[i].lower())
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = {"\x00".join(norm_cell(r[i]) for i in order_s) for r in srows}
            oset = {"\x00".join(norm_cell(r[i]) for i in order_o) for r in orows}
            for x in sorted(sset - oset)[:3]:
                print("   spark-only:", x.replace("\x00", " | ")[:160])
            for x in sorted(oset - sset)[:3]:
                print("   duck-only :", x.replace("\x00", " | ")[:160])
    if not only:
        # full run → commit a local artifact covering EVERY registry
        # entry (the driver's per-round file may cap/truncate the list)
        import json

        with open("/root/repo/CORRECTNESS_LOCAL.json", "w") as f:
            json.dump(results, f, indent=2)
        print("wrote CORRECTNESS_LOCAL.json with", len(results), "entries")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
