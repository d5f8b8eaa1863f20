"""Crawl session reports (SURVEY.md S13, reporting/generator.py:41-60).

The reference renders HTML/JSON/CSV/MD/PDF from collected aggregates; here
the report is driver-side plain Python over the small results of the
analytics layer (everything heavy already aggregated cluster-side). JSON and
Markdown cover the machine- and human-readable cases; other formats are
renderings of the same dict.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from crawler_spark import analytics


def build_report(spark: SparkSession, workdir: str, top_n: int = 20) -> dict:
    """Collect the full session report as one plain dict (tolerates catalogs
    with no committed rounds: sections come back empty, never raise)."""
    dists = analytics.frontier_distributions(spark, workdir)
    return {
        "session": analytics.session_summary(spark, workdir),
        "queue_health": analytics.queue_health(spark, workdir),
        "top_words": [
            r.asDict() for r in analytics.top_words(spark, workdir, top_n).collect()
        ],
        "per_round": [
            r.asDict()
            for r in analytics.per_round_metrics(spark, workdir).orderBy("round").collect()
        ],
        "status_distribution": (
            {r["status"]: r["n"] for r in dists["status"].collect()} if dists else {}
        ),
        "top_hosts": [r.asDict() for r in dists["host"].limit(10).collect()] if dists else [],
    }


def render_json(report: dict) -> str:
    return json.dumps(report, indent=2, default=str)


def render_markdown(report: dict) -> str:
    s = report["session"]
    h = report["queue_health"]
    frontier_line = (
        f"- frontier: {h['total_urls']} urls — {h.get('pending', 0)} pending,"
        f" {h.get('completed', 0)} completed, {h.get('failed', 0)} failed,"
        f" {h.get('skipped', 0)} skipped"
        + (" (compacted: non-pending rows shed by maintenance)" if h.get("compacted") else "")
    )
    lines = [
        "# Crawl session report",
        "",
        f"- rounds: {s.get('rounds')}  pages crawled: {s.get('pages_crawled')}"
        f"  failed fetch attempts: {s.get('fetch_failures')}",
        f"- words: {s.get('total_words')} total / {s.get('unique_words')} unique"
        f"  over {s.get('hosts_fetched')} hosts (max depth {s.get('max_depth')})",
        frontier_line,
        "",
        "## Top words",
        "",
        "| word | freq | pages |",
        "|---|---|---|",
    ]
    lines += [
        f"| {w['word']} | {w['total_freq']} | {w['n_pages']} |" for w in report["top_words"]
    ]
    lines += ["", "## Rounds", "", "| round | scheduled | completed | fresh | skipped |", "|---|---|---|---|---|"]
    lines += [
        f"| {r['round']} | {r['scheduled']} | {r['completed']} | {r['fresh']} | {r['skipped']} |"
        for r in report["per_round"]
    ]
    return "\n".join(lines) + "\n"


def generate_session_report(
    spark: SparkSession, workdir: str, path: str, fmt: str = "json", top_n: int = 20
) -> str:
    """S13 entry point: build + render + write; returns the output path."""
    report = build_report(spark, workdir, top_n)
    rendered = {"json": render_json, "md": render_markdown, "markdown": render_markdown}[
        fmt
    ](report)
    with open(path, "w") as f:
        f.write(rendered)
    return path
