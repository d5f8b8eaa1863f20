"""Run every REGISTRY query against its DuckDB oracle, mirroring the driver.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

# runnable from any cwd: the repo root is the package's import path, and
# Spark's Python UDF workers also need it on PYTHONPATH
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = [r[i] for i in order]
        out.append(tuple(str(v) for v in vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from crawler_spark.operators.ordering import release_global_seq
    from crawler_spark.queries import REGISTRY
    from crawler_spark.sparkutils import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
            # drop the persisted intermediate the cumsum/seq builders carry
            # (carry_seq_cache) — 90+ registry runs would otherwise pile up
            # cached RDDs in one session
            release_global_seq(df)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} SPARK ERROR: {type(e).__name__}: {e}")
            continue
        try:
            sql = spec.sql_text()  # lazy builders (minicrawl) do real work
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} SQL BUILD ERROR: {type(e).__name__}: {e}")
            continue
        if sql is None:
            print(f"{name:24s} rows-only: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} DUCKDB ERROR: {type(e).__name__}: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"{name:24s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        if sn != dn:
            failures.append(name)
            diff_s = [r for r in sn if r not in dn][:3]
            diff_d = [r for r in dn if r not in sn][:3]
            print(
                f"{name:24s} VALUE MISMATCH rows spark={len(sn)} duck={len(dn)}\n"
                f"  only-spark: {diff_s}\n  only-duck:  {diff_d}"
            )
        else:
            print(f"{name:24s} OK  {len(sn)} rows  ({time.time()-t0:.1f}s)")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
