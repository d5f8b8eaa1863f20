"""SparkSession factory with scale-appropriate defaults.

Local sandbox runs on local[N]; on a real cluster the same confs apply via
spark-submit --conf. AQE is on for runtime skew handling (SURVEY.md §4), and
the runtime Bloom-filter join optimization backs the dedup anti-join.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # default to the HOST's core count capped at 32, not a hardcoded 32: on
    # a small machine local[32] oversubscribes 4-8x and the derived heap +
    # tmpfs spill dirs (both RAM) would be sized for a box that isn't there.
    # SPARK_GRAFT_CPUS / the cores arg still override in either direction.
    env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    cores = cores or (
        int(env_cpus) if env_cpus else min(32, os.cpu_count() or 8)
    )
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # local mode = one JVM: size the heap per worker thread (cluster analogy:
    # fixed memory per executor core), or concurrent sort/agg tasks spill+GC
    default_mem = f"{max(8, 2 * cores)}g"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", default_mem))
        # shuffle spill dir on tmpfs: the VM's virtio disk serializes under
        # concurrent shuffle writers (more cores -> slower); RAM-backed local
        # dirs are the sandbox analog of executor-local NVMe
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/crawler-spark-local"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # keep stdout machine-parseable: the bench/driver contract is a JSON
        # tail line, and console progress bars interleave with it
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
