"""Run every REGISTRY query against its DuckDB oracle, mirroring the driver.

The driver canonicalizes BOTH result sets through pandas (Spark via
``toPandas()``-equivalent collection, DuckDB via ``.df()``), sorts columns
by name and rows by value, then hashes the values dtype-sensitively. That
means a DuckDB HUGEINT (int128, e.g. any uncast ``sum()`` over BIGINT)
round-trips to float64 and hash-diverges from Spark's int64 even when the
values are numerically identical, and an array-typed output column crashes
the canonicalizer outright (lists aren't hashable). Earlier versions of
this script stringified fetchall() rows, which masked exactly that bug
class for four rounds — so this script now:

  * canonicalizes through pandas the same way the driver does, and
  * additionally FAILS an entry when the DuckDB frame has a float64 column
    where the Spark schema is integral, or any object/list-valued column
    that isn't a plain string, even if today's values happen to agree.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

# runnable from any cwd: the repo root is the package's import path, and
# Spark's Python UDF workers also need it on PYTHONPATH
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

from crawler_spark.conformance import (  # noqa: E402
    canon,
    conformance_errors,
    frame_hash,
)


def spark_to_pandas(df) -> pd.DataFrame:
    """Arrow-backed collection to pandas, the driver's Spark-side path."""
    return df.toPandas()


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
            spdf = spark_to_pandas(df)
            release_global_seq(df)  # drop carry_seq_cache intermediates
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
            print(f"{name:24s} rows-only: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            if len(spdf) == 0:
                failures.append(name)
            continue
        try:
            dpdf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} DUCKDB ERROR: {type(e).__name__}: {e}")
            continue
        if sorted(spdf.columns) != sorted(dpdf.columns):
            failures.append(name)
            print(
                f"{name:24s} SCHEMA MISMATCH spark={sorted(spdf.columns)}"
                f" duck={sorted(dpdf.columns)}"
            )
            continue
        conf = conformance_errors(df.schema, dpdf, spark_pdf=spdf)
        # the Spark side must be representable too (array outputs crash the
        # driver regardless of which engine produced them)
        conf += [
            f"spark {e}" for e in conformance_errors(df.schema, spdf)
            if "unhashable" in e
        ]
        if conf:
            failures.append(name)
            print(f"{name:24s} CONFORMANCE: {'; '.join(conf)}")
            continue
        try:
            sc, dc = canon(spdf), canon(dpdf)
            hs, hd = frame_hash(sc), frame_hash(dc)
        except TypeError as e:
            failures.append(name)
            print(f"{name:24s} CANON ERROR (driver would crash): {e}")
            continue
        if len(sc) != len(dc):
            failures.append(name)
            print(f"{name:24s} ROW MISMATCH spark={len(sc)} duck={len(dc)}")
        elif hs != hd:
            failures.append(name)
            neq = (sc.astype(str) != dc.astype(str)).any(axis=1)
            vdiff = "values differ" if neq.any() else "values equal, dtypes differ"
            sdt = {c: str(sc[c].dtype) for c in sc.columns}
            ddt = {c: str(dc[c].dtype) for c in dc.columns}
            print(
                f"{name:24s} HASH MISMATCH ({vdiff})\n"
                f"  spark dtypes: {sdt}\n  duck dtypes:  {ddt}\n"
                f"  first diffs spark: {sc[neq].head(2).to_dict('records') if neq.any() else '-'}\n"
                f"  first diffs duck:  {dc[neq].head(2).to_dict('records') if neq.any() else '-'}"
            )
        else:
            print(f"{name:24s} OK  {len(sc)} rows  ({time.time()-t0:.1f}s)")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
