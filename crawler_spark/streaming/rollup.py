"""Structured Streaming surface — windowed rollups and streaming URL dedup.

The crawl loop itself is deliberately batch-iterative (SURVEY.md §7 decision
1: the frontier is self-feeding, and a Structured Streaming query cannot read
its own sink), but two reference dataflows ARE stream-shaped and map cleanly
onto Structured Streaming:

- the hourly activity rollup (A7, storage/database.py:470-500) becomes a
  tumbling event-time window with a watermark for late rows — the streaming
  twin of queries.q_hourly_activity;
- URL-seen dedup within a stream of discovered URLs (J1) becomes
  ``dropDuplicates`` on the canonical hash under the same watermark — exact
  within the watermark horizon, which is the politeness-round horizon in a
  live deployment (the authoritative cross-round dedup stays the url_seen
  anti-join at commit time).

Tests drive these with ``trigger(availableNow=True)`` over the driver's
events parquet and assert equality with the batch twins, so the streaming
plans share the batch plans' oracle coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window with late-data watermark (A7 twin).

    Output: (hour_epoch, event_type, n_events, sum_value) per closed window;
    sum_value uses the same exact-decimal trick as the batch twin so values
    match it bit-for-bit.
    """
    return (
        # watermarks require TIMESTAMP (with zone); parquet NTZ columns cast
        # losslessly under the UTC session zone
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_url_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First occurrence per canonical URL hash within the watermark horizon.

    Input needs (canonical:string, discovered_ts:timestamp); state is bounded
    by the watermark (expired keys are dropped), which is what makes this
    viable at frontier scale — the unbounded exact set lives in the url_seen
    table, not in stream state.
    """
    return (
        stream.withColumn("url_hash", F.xxhash64("canonical"))
        .withWatermark("discovered_ts", watermark)
        # hash AND string: hash-only equality would silently drop a distinct
        # URL on a 64-bit collision (expected at 10^10-URL scale).
        # dropDuplicatesWithinWatermark, NOT dropDuplicates: plain
        # dropDuplicates only evicts state when the event-time column is in
        # the key subset — without it state grows one entry per distinct URL
        # forever, the exact failure this design must avoid
        .dropDuplicatesWithinWatermark(["url_hash", "canonical"])
    )
