"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
matching oracle_sql() in DuckDB over the same parquet, and compares
row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/crosscheck.py [--bare] [sf_dir] [query ...]

--bare builds a plain SparkSession (no engine configs), replicating the
driver's environment — catches anything that silently depends on our
session factory.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from planning_center_data_pipeline_spark.session import get_spark  # noqa: E402
from planning_center_data_pipeline_spark.sources.tables import TABLES  # noqa: E402


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    bare = "--bare" in argv
    if bare:
        argv.remove("--bare")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("crosscheck-bare")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:42s} rows={len(srows):6d} (rows-only, {dt:.1f}s)")
            if len(srows) == 0:
                print("   ^ WARN: zero rows")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:42s} {status} rows={len(srows)}/{len(drows)}"
            f" cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'}"
            f" ({dt:.1f}s)"
        )
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print(f"   spark cols: {sorted(scols)}\n   duck  cols: {sorted(dcols)}")
            if ok_cols and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in srows)
                dset = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in drows)
                for a, b in list(zip(sset, dset))[:200]:
                    if a != b:
                        print(f"   spark: {a[:200]}\n   duck : {b[:200]}")
                        break
    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
