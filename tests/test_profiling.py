"""Physical-plan profiler (crawler_spark/profiling.py — the Spark-native
analog of reference monitoring/profiler.py per-operation stats)."""

import pyspark.sql.functions as F

from crawler_spark.profiling import executed_plan_metrics, format_profile, profile_df
import pytest

pytestmark = pytest.mark.catalog  # split: see pytest.ini


def test_plan_metrics_capture_shuffle_and_rows(spark):
    df = spark.range(10_000).groupBy((F.col("id") % 7).alias("k")).count()
    prof = profile_df(df)
    assert prof["rows_out"] == 7
    # groupBy = exactly one Exchange, whose write metrics must roll up
    assert prof["exchanges"] == 1
    assert prof["shuffle_bytes_written"] > 0
    assert prof["shuffle_records_written"] >= 7
    assert prof["spill_bytes"] == 0  # 10k rows must not spill
    names = [n["node"] for n in prof["operators"]]
    assert any(n.startswith("Exchange") for n in names)
    assert any(n.startswith("HashAggregate") for n in names)
    # the walk descends THROUGH AQE wrappers to the plan that ran
    assert names[0].startswith("AdaptiveSparkPlan")
    assert len(names) > 3


def test_plan_metrics_profile_own_execution(spark):
    # metrics belong to the profiled plan itself: a fresh identical frame
    # profiled twice reports rows both times (nothing depends on caches)
    df = spark.range(100).select(F.sum("id").alias("s"))
    rows1 = executed_plan_metrics(df)
    assert any(n["metrics"].get("numOutputRows") for n in rows1)


def test_format_profile_renders_tree(spark):
    df = spark.range(1_000).groupBy((F.col("id") % 3).alias("k")).count()
    text = format_profile(profile_df(df))
    assert "wall" in text and "Exchange" in text
    # indentation encodes depth
    assert any(line.startswith("  ") for line in text.splitlines()[1:])
