"""Event-stream analytics — gap sessionization and transition counts.

The reference aggregates crawl *sessions* it created itself
(/root/reference/src/crawler/reporting/analytics.py session summaries); an
analytics engine over event streams also needs the inverse operator —
RECONSTRUCTING sessions from a raw (user, ts) event log by inactivity gap,
the canonical hard-in-plain-SQL windowing op — plus first-order behavior
transitions. Both run over the driver's ``events`` table shape.

Determinism contract (the driver value-hashes results vs DuckDB): event
order within a user is (ts, event_id) — a full tiebreak — and every output
column is an exact integer (epoch seconds, counts), never a double.

Scale design: one shuffle each, hash-partitioned on user_id; the per-user
window is sequential by nature (session index is a running sum over the
user's own timeline), so parallelism comes from the user count, not from
salting — heavy users are bounded by their own event volume and AQE handles
residual skew. No driver-side loops, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Assign events to sessions split at inactivity gaps > ``gap_sec``.

    Returns one row per session: (user_id, session_idx, n_events, start_s,
    end_s, duration_s) with session_idx 1-based in time order and the
    timestamps as epoch seconds (int64).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    ts_s = F.unix_timestamp(F.col(ts_col)).cast("long")
    ev = df.select(
        F.col(user_col).alias("user_id"), F.col(id_col).alias("_eid"), ts_s.alias("_s")
    )
    wo = Window.partitionBy("user_id").orderBy("_s", "_eid")
    marked = ev.withColumn(
        "_new",
        F.when(
            F.col("_s") - F.lag("_s").over(wo) > F.lit(gap_sec), F.lit(1)
        ).otherwise(F.lit(0))
        + F.when(F.lag("_s").over(wo).isNull(), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("_s").alias("start_s"),
        F.max("_s").alias("end_s"),
        (F.max("_s") - F.min("_s")).alias("duration_s"),
    )


def transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order transition matrix of the event stream.

    For each user's (ts, event_id)-ordered timeline, count consecutive
    (event_type -> next event_type) pairs across all users. Returns
    (from_type, to_type, n) — the Markov-chain edge weights behind
    "what do users do next" reporting.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        df.withColumn("_next", F.lead(type_col).over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), F.col("_next").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
