"""Dirty-bucket frontier-commit cost evidence (VERDICT r2 #2 done-criterion).

Measures one round's frontier COMMIT (the stage_replace_buckets write) on a
fixed-size frontier while varying how many host_buckets the round touched.
With the bucket-mapped commit the write cost must track the touched-bucket
row count; the full-rewrite baseline (stage_replace) pays the whole frontier
every round regardless.

Method notes (BENCH/BASELINE.md conventions): frontier staged once to
parquet (64 buckets) through a real catalog init; each timed commit is built
from a fresh spark.read of the committed snapshot (no cached-plan reuse);
best-of-REPS on this noisy host. Commits land in a throwaway catalog dir on
/dev/shm.

Usage:
    python scripts/bench_frontier_commit.py [rows] [cores]
Prints one JSON line: {"frontier_rows": N, "buckets": 64,
  "commit_sec": {"dirty_2": s, "dirty_8": s, "dirty_64": s, "full": s},
  "rows_written": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.sparkutils import get_spark  # noqa: E402
from crawler_spark.tables import SnapshotCatalog  # noqa: E402

N_BUCKETS = 64
REPS = int(os.environ.get("BENCH_REPS", "3"))


def synth_frontier(spark, n: int):
    host_id = F.pmod(F.xxhash64("id", F.lit(3)), 10_000)
    host = F.concat(F.lit("host"), host_id.cast("string"), F.lit(".test"))
    return spark.range(n).select(
        F.concat(F.lit("http://"), host, F.lit("/p"), F.col("id").cast("string")).alias("canonical"),
        host.alias("host"),
        F.pmod(F.xxhash64("id", F.lit(4)), 10).cast("int").alias("priority"),
        F.lit("pending").alias("status"),
        F.pmod(F.xxhash64(host), F.lit(N_BUCKETS)).cast("int").alias("host_bucket"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    root = f"/dev/shm/crawler_spark_commit_bench/n{n}"
    spark = get_spark("commit-bench", cores=cores, shuffle_partitions=N_BUCKETS)
    spark.sparkContext.setLogLevel("ERROR")

    cat = SnapshotCatalog(root)
    if cat.current_manifest() is None:
        init = cat.begin(-1)
        init.stage_replace(
            "frontier",
            synth_frontier(spark, n).repartition(N_BUCKETS, "host_bucket"),
            partition_by=["host_bucket"],
        )
        init.commit()

    secs: dict[str, float] = {}
    rows: dict[str, int] = {}
    for k in (2, 8, N_BUCKETS):
        dirty = list(range(k))
        times = []
        for _ in range(REPS):
            frontier = cat.read(spark, "frontier")
            content = frontier.where(F.col("host_bucket").isin(dirty)).withColumn(
                "status", F.lit("completed")
            )
            t0 = time.time()
            commit = cat.begin(0, tag=f"bench-d{k}")
            commit.stage_replace_buckets(
                "frontier", content.repartition(k, "host_bucket"), dirty
            )
            commit.commit()
            times.append(time.time() - t0)
        secs[f"dirty_{k}"] = round(min(times), 3)
        rows[f"dirty_{k}"] = cat.read(spark, "frontier").where(
            F.col("status") == "completed"
        ).count()
        # reset to the pristine snapshot for the next level
        reset = cat.begin(0, tag=f"reset-d{k}")
        reset.stage_replace(
            "frontier",
            cat.read(spark, "frontier").withColumn("status", F.lit("pending"))
            .repartition(N_BUCKETS, "host_bucket"),
            partition_by=["host_bucket"],
        )
        reset.commit()
        cat.expire_snapshots(keep_last=1)  # trim superseded generations

    # full-rewrite baseline (the r2 commit path): whole frontier every round
    times = []
    for _ in range(REPS):
        frontier = cat.read(spark, "frontier")
        t0 = time.time()
        commit = cat.begin(0, tag="bench-full")
        commit.stage_replace(
            "frontier",
            frontier.repartition(N_BUCKETS, "host_bucket"),
            partition_by=["host_bucket"],
        )
        commit.commit()
        times.append(time.time() - t0)
    secs["full"] = round(min(times), 3)
    rows["full"] = n

    print(json.dumps({
        "frontier_rows": n,
        "buckets": N_BUCKETS,
        "commit_sec": secs,
        "rows_written": rows,
        "reps": REPS,
        "cores": cores,
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
