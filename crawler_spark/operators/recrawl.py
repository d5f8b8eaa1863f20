"""Adaptive recrawl scheduling — change-rate estimation over fetch history.

The reference crawls each URL once per session (url_management/queue.py marks
completed and never revisits); a production crawl re-fetches, and the
scheduling question becomes "which pages change often enough to be worth
re-fetching NOW". The classic estimator (Cho & Garcia-Molina 2003) models
page change as Poisson and estimates the rate from n revisit observations of
which X showed a changed page. This module computes the sufficient
statistics and a recrawl priority in EXACT integer arithmetic (the full
Poisson MLE needs ln(1 - X/n); its input ratio is carried in millionths so a
consumer can apply it — the ORDERING the scheduler needs is already monotone
in the ratio, documented below):

    change_ratio_micro = (changes * 10^6) div (visits - 1)
    age_s              = now - last fetch   (seconds, vs the corpus max ts
                                             so the value is deterministic)
    score              = change_ratio_micro * age_s

score is the integer analog of lambda-hat * staleness: among pages with
equal observation counts it orders exactly as the MLE does (ln is monotone),
and it is bit-reproducible in the DuckDB oracle.

Scale shape: one window (lag over ts per page — partitioned by page_id, no
global sort) + one groupBy(page_id). Both shuffle on page_id only; fetch
history at 10^10 scale is naturally bucketed by url_hash already (the
frontier tables' layout), so the window runs storage-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RATIO_SCALE = 1_000_000


def change_stats(
    fetches: DataFrame,
    page_col: str = "page_id",
    ts_col: str = "ts",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """(page_id, visits, changes, first_ts, last_ts) per page.

    ``changes`` counts revisit observations whose content fingerprint
    differs from the previous visit's (lag over event time; ties broken by
    fingerprint so the count is deterministic under duplicate timestamps).
    ``ts_col`` must be integer epoch seconds (pre-convert with
    unix_timestamp — the oracle-parity recipe for sub-second timestamps).
    """
    w = Window.partitionBy(page_col).orderBy(F.col(ts_col), F.col(fp_col))
    prev = F.lag(fp_col).over(w)
    obs = fetches.select(
        F.col(page_col).alias("page_id"),
        F.col(ts_col).alias("ts"),
        F.col(fp_col).alias("fp"),
        F.when(prev.isNull(), F.lit(None).cast("int"))
        .when(F.lag(fp_col).over(w) != F.col(fp_col), F.lit(1))
        .otherwise(F.lit(0))
        .alias("changed"),
    )
    return obs.groupBy("page_id").agg(
        F.count("*").alias("visits"),
        F.sum(F.coalesce(F.col("changed"), F.lit(0))).alias("changes"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def recrawl_priority(
    fetches: DataFrame,
    page_col: str = "page_id",
    ts_col: str = "ts",
    fp_col: str = "fingerprint",
    min_visits: int = 2,
    top_n: int = 50,
) -> DataFrame:
    """Top-N pages by recrawl urgency (module doc): change_ratio * age.

    Pages seen once have no change evidence and are excluded (min_visits);
    age is measured against the corpus max ts so the result is a pure
    function of the input. Ordering ties break by page_id.
    """
    stats = change_stats(fetches, page_col, ts_col, fp_col)
    now = fetches.agg(F.max(ts_col).alias("now_ts"))
    scored = (
        stats.where(F.col("visits") >= min_visits)
        .crossJoin(F.broadcast(now))
        .select(
            "page_id",
            "visits",
            "changes",
            F.expr(f"(changes * {RATIO_SCALE}) div (visits - 1)").alias(
                "change_ratio_micro"
            ),
            (F.col("now_ts") - F.col("last_ts")).cast("long").alias("age_s"),
        )
        .select(
            "page_id",
            "visits",
            "changes",
            "change_ratio_micro",
            "age_s",
            F.expr("change_ratio_micro * age_s").alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("page_id")).limit(top_n)
