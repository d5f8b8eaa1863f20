"""Physical-plan profiler: per-operator SQLMetrics for any DataFrame.

The reference ships a per-function profiler (monitoring/profiler.py:66-278 —
wall time, memory, cProfile hotspots per named operation). In a Spark engine
the analogous bottleneck question is per-PHYSICAL-OPERATOR, not per-Python-
function: which Exchange moved how many bytes, which sort/aggregate spilled,
how many rows crossed each operator, which whole-stage-codegen pipeline
burned the time. Those numbers already exist as SQLMetrics on the executed
plan; this module executes a DataFrame's OWN QueryExecution (so the metrics
belong to exactly the plan being profiled, AQE-final, and no rows are
collected to the driver) and walks the plan tree to return them as plain
dicts — the Spark-native `get_profile_stats()`.

Scale note: profiling cost is the query itself plus an O(plan-size) driver
walk; nothing is added to the distributed path and no extra action runs.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

__all__ = ["executed_plan_metrics", "profile_df", "format_profile"]

# rollup keys: every SQLMetric name that means "bytes shuffled" / "bytes
# spilled" / "peak memory" in Spark's physical operators
_SHUFFLE_WRITE_KEYS = {"shuffleBytesWritten"}
_SPILL_KEYS = {"spillSize", "memoryBytesSpilled", "diskBytesSpilled"}
_PEAK_KEYS = {"peakMemory"}


def _children(node) -> list:
    """Physical children, descending THROUGH the AQE wrapper nodes
    (AdaptiveSparkPlanExec holds the final plan; QueryStageExec nodes wrap
    their materialized stage) so the walk sees the plan that actually ran."""
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return [node.executedPlan()]
    if cls.endswith("QueryStageExec"):
        return [node.plan()]
    out = []
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _walk(node, depth: int, out: list[dict]) -> None:
    mm = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        v = kv._2().value()
        if v:  # unset metrics report 0 (or -1 sentinel on some accumulators)
            mm[kv._1()] = v
    out.append({"depth": depth, "node": node.nodeName(), "metrics": mm})
    for c in _children(node):
        _walk(c, depth + 1, out)


def executed_plan_metrics(df: DataFrame) -> list[dict]:
    """Execute ``df``'s own QueryExecution and return one dict per physical
    operator: ``{"depth", "node", "metrics": {name: value}}`` in plan order.

    Execution is ``executedPlan().execute().count()`` — the exact plan object
    whose metrics are read, materialized as an RDD count so only per-partition
    counts reach the driver (safe to profile a billion-row result)."""
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()
    rows: list[dict] = []
    _walk(plan, 0, rows)
    return rows


def profile_df(df: DataFrame) -> dict:
    """Run ``df`` once and return wall time + per-operator metrics + rollups.

    Rollups a tuning pass reads first: total shuffle bytes/records written,
    total spill bytes (a non-zero value means a partition didn't fit — size
    shuffle.partitions / maxPartitionBytes up), max single-operator peak
    memory, exchange count (the shuffle-count smell test), and rows out of
    the outermost row-metric-bearing operator (``rows_out``: AQE wrappers
    and result stages often expose no row metric themselves, so this is the
    SHALLOWEST operator that does — for a typical plan the logical result
    cardinality, but a root-level metric-less wrapper means it can be one
    operator below the true root)."""
    t0 = time.time()
    nodes = executed_plan_metrics(df)
    wall = time.time() - t0
    shuffle_bytes = shuffle_records = spill = exchanges = 0
    peak = 0
    for n in nodes:
        m = n["metrics"]
        if n["node"].startswith("Exchange") and m:
            exchanges += 1
        for k, v in m.items():
            if k in _SHUFFLE_WRITE_KEYS:
                shuffle_bytes += v
            elif k == "shuffleRecordsWritten":
                shuffle_records += v
            elif k in _SPILL_KEYS:
                spill += v
            elif k in _PEAK_KEYS:
                peak = max(peak, v)
    # shallowest metric-bearing operator, not first-in-pre-order: pre-order
    # would surface a DEEP left-subtree operator ahead of a shallower one
    with_rows = [n for n in nodes if "numOutputRows" in n["metrics"]]
    root_rows = (
        min(with_rows, key=lambda n: n["depth"])["metrics"]["numOutputRows"]
        if with_rows
        else None
    )
    return {
        "wall_sec": round(wall, 3),
        "rows_out": root_rows,
        "exchanges": exchanges,
        "shuffle_bytes_written": shuffle_bytes,
        "shuffle_records_written": shuffle_records,
        "spill_bytes": spill,
        "max_operator_peak_memory": peak,
        "operators": nodes,
    }


def format_profile(prof: dict, max_metrics: int = 4) -> str:
    """Human table: indented operator tree with its loudest metrics."""
    pri = (
        "numOutputRows",
        "shuffleBytesWritten",
        "shuffleRecordsWritten",
        "spillSize",
        "memoryBytesSpilled",
        "diskBytesSpilled",
        "peakMemory",
        "pipelineTime",
        "aggTime",
        "sortTime",
        "time to build hash map",
    )
    lines = [
        f"wall {prof['wall_sec']}s  rows_out {prof['rows_out']}  "
        f"exchanges {prof['exchanges']}  "
        f"shuffle {prof['shuffle_bytes_written']:,}B / "
        f"{prof['shuffle_records_written']:,} rec  "
        f"spill {prof['spill_bytes']:,}B  "
        f"op_peak_mem {prof['max_operator_peak_memory']:,}B"
    ]
    for n in prof["operators"]:
        m = n["metrics"]
        shown = [k for k in pri if k in m][:max_metrics]
        rest = [k for k in m if k not in shown]
        parts = [f"{k}={m[k]:,}" for k in shown]
        if rest and len(shown) < max_metrics:
            parts += [f"{k}={m[k]:,}" for k in rest[: max_metrics - len(shown)]]
        lines.append("  " * n["depth"] + n["node"] + ("  [" + " ".join(parts) + "]" if parts else ""))
    return "\n".join(lines)
