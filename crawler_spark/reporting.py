"""Crawl session reports (SURVEY.md S13, reporting/generator.py:41-60).

The reference renders HTML/JSON/CSV/MD/PDF from collected aggregates; here
the report is driver-side plain Python over the small results of the
analytics layer (everything heavy already aggregated cluster-side). JSON,
Markdown, HTML (self-contained, tables-only, no JS — the reference's primary
format, reporting/generator.py:52-60) and CSV are renderings of the same
dict; the HTML page embeds inline-SVG bar charts (per-round metrics, top
words — the visualizer.py analog, still zero JS). PDF is intentionally out
of scope (the reference shells out to a renderer this sandbox does not
ship, and the HTML page prints to PDF)."""

from __future__ import annotations

import csv
import io
import json
from html import escape

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

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
        # exact frontier heavy hitters via the lossless CMS prune
        # (analytics.hot_hosts): the skew warning an operator acts on
        "hot_hosts": [r.asDict() for r in analytics.hot_hosts(spark, workdir).collect()],
        # governance audits (bounded outputs; None-safe on partial catalogs):
        # DUST rewrite-rule support over discovered links, and residual
        # per-host template chrome the span-kind filters could not see
        "dust_rules": (
            []
            if (_d := analytics.dust_rule_summary(spark, workdir)) is None
            else [r.asDict() for r in _d.limit(top_n).collect()]
        ),
        "template_hosts": (
            []
            if (_t := analytics.template_summary(spark, workdir)) is None
            else [
                r.asDict()
                for r in _t.orderBy(F.desc("template_share_bp"), "host")
                .limit(top_n)
                .collect()
            ]
        ),
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


def _svg_bar_chart(
    labels: list[str],
    series: dict[str, list[float]],
    title: str,
    width: int = 640,
    height: int = 220,
) -> str:
    """Inline-SVG grouped bar chart, no JS (S13 charts — the analog of the
    reference's matplotlib renderings, reporting/visualizer.py). Returns an
    empty string for empty data so callers can always embed the result."""
    if not labels or not series or not any(any(v) for v in series.values()):
        return ""
    palette = ["#4a6fa5", "#53a567", "#b5651d", "#8a5ab5"]
    pad_l, pad_b, pad_t = 46, 34, 24
    plot_w, plot_h = width - pad_l - 10, height - pad_b - pad_t
    vmax = max(max(v) for v in series.values()) or 1
    n_groups, n_series = len(labels), len(series)
    group_w = plot_w / n_groups
    bar_w = max(group_w * 0.8 / n_series, 1.0)
    parts = [
        f'<svg class="chart" role="img" viewBox="0 0 {width} {height}" '
        f'xmlns="http://www.w3.org/2000/svg">',
        f'<title>{escape(title)}</title>',
        f'<text x="{pad_l}" y="14" font-size="12" fill="#444">{escape(title)}</text>',
        f'<line x1="{pad_l}" y1="{pad_t + plot_h}" x2="{width - 10}" '
        f'y2="{pad_t + plot_h}" stroke="#999"/>',
        f'<text x="4" y="{pad_t + 10}" font-size="10" fill="#666">{vmax:g}</text>',
    ]
    for si, (name, vals) in enumerate(series.items()):
        color = palette[si % len(palette)]
        for gi, v in enumerate(vals[: len(labels)]):
            h = 0 if vmax == 0 else (v / vmax) * plot_h
            x = pad_l + gi * group_w + group_w * 0.1 + si * bar_w
            y = pad_t + plot_h - h
            parts.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w:.1f}" '
                f'height="{h:.1f}" fill="{color}"><title>'
                f"{escape(name)} {escape(str(labels[gi]))}: {v:g}</title></rect>"
            )
        # legend swatch
        lx = pad_l + si * 130
        parts.append(
            f'<rect x="{lx}" y="{height - 12}" width="10" height="10" fill="{color}"/>'
            f'<text x="{lx + 14}" y="{height - 3}" font-size="10" '
            f'fill="#444">{escape(name)}</text>'
        )
    step = max(n_groups // 12, 1)  # at most ~12 x labels
    for gi in range(0, n_groups, step):
        x = pad_l + gi * group_w + group_w / 2
        parts.append(
            f'<text x="{x:.1f}" y="{pad_t + plot_h + 12}" font-size="10" '
            f'text-anchor="middle" fill="#666">{escape(str(labels[gi]))}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def _html_table(headers: list[str], rows: list[list]) -> str:
    head = "".join(f"<th>{escape(str(h))}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{escape(str(v))}</td>" for v in row) + "</tr>"
        for row in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def render_html(report: dict) -> str:
    """Self-contained HTML page (no JS, inline CSS): the S13 primary format."""
    s = report["session"]
    h = report["queue_health"]
    summary_rows = [[k, v] for k, v in {**s, **h}.items()]
    words = _html_table(
        ["word", "freq", "pages"],
        [[w["word"], w["total_freq"], w["n_pages"]] for w in report["top_words"]],
    )
    rounds = _html_table(
        ["round", "scheduled", "completed", "fresh", "skipped"],
        [
            [r["round"], r["scheduled"], r["completed"], r["fresh"], r["skipped"]]
            for r in report["per_round"]
        ],
    )
    hosts = _html_table(
        list(report["top_hosts"][0].keys()) if report["top_hosts"] else ["host"],
        [list(r.values()) for r in report["top_hosts"]],
    )
    status = _html_table(
        ["status", "n"], [[k, v] for k, v in report["status_distribution"].items()]
    )
    rounds_chart = _svg_bar_chart(
        [str(r["round"]) for r in report["per_round"]],
        {
            "scheduled": [r["scheduled"] for r in report["per_round"]],
            "completed": [r["completed"] for r in report["per_round"]],
            "fresh": [r["fresh"] for r in report["per_round"]],
        },
        "Per-round crawl metrics",
    )
    words_chart = _svg_bar_chart(
        [w["word"] for w in report["top_words"][:12]],
        {"frequency": [w["total_freq"] for w in report["top_words"][:12]]},
        "Top words by frequency",
    )
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"/>
<title>Crawl session report</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a2e; }}
h1, h2 {{ border-bottom: 1px solid #ddd; padding-bottom: .3rem; }}
table {{ border-collapse: collapse; margin: 1rem 0; }}
th, td {{ border: 1px solid #ccc; padding: .35rem .6rem; text-align: left; }}
th {{ background: #f0f0f5; }}
tbody tr:nth-child(even) {{ background: #fafafa; }}
</style></head><body>
<h1>Crawl session report</h1>
<h2>Session</h2>{_html_table(["metric", "value"], summary_rows)}
<h2>Status distribution</h2>{status}
<h2>Top words</h2>{words_chart}{words}
<h2>Rounds</h2>{rounds_chart}{rounds}
<h2>Top hosts</h2>{hosts}
<h2>DUST rewrite-rule support</h2>{_html_table(
        ["rule", "support", "n_hosts"],
        [[r["rule"], r["support"], r["n_hosts"]] for r in report["dust_rules"]],
    )}
<h2>Per-host template chrome</h2>{_html_table(
        ["host", "n_docs", "n_template_segments", "template_share_bp"],
        [
            [r["host"], r["n_docs"], r["n_template_segments"], r["template_share_bp"]]
            for r in report["template_hosts"]
        ],
    )}
</body></html>
"""


def render_csv(report: dict) -> str:
    """Flat CSV: one section column + key/value rows for scalars, then the
    tabular sections (the reference's CSV export is similarly denormalized)."""
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["section", "key", "value"])
    for k, v in {**report["session"], **report["queue_health"]}.items():
        w.writerow(["session", k, v])
    for k, v in report["status_distribution"].items():
        w.writerow(["status", k, v])
    for r in report["top_words"]:
        w.writerow(["top_word", r["word"], r["total_freq"]])
    for r in report["per_round"]:
        w.writerow(["round", r["round"], json.dumps(r, default=str)])
    return buf.getvalue()


_RENDERERS = {
    "json": render_json,
    "md": render_markdown,
    "markdown": render_markdown,
    "html": render_html,
    "csv": render_csv,
}


def generate_session_report(
    spark: SparkSession, workdir: str, path: str, fmt: str = "json", top_n: int = 20
) -> str:
    """S13 entry point: build + render + write; returns the output path."""
    report = build_report(spark, workdir, top_n)
    rendered = _RENDERERS[fmt](report)
    with open(path, "w") as f:
        f.write(rendered)
    return path


# -- word-cloud / chart-data export (reference visualizer.py:25-62,406-459) ---

def word_cloud_data(report: dict, max_words: int = 100) -> dict:
    """Word-cloud scaling data (visualizer.generate_word_cloud_data,
    visualizer.py:25-62): size = int(freq / max_freq * 100) + 10 per word
    (the reference's 10-110 font scale), over the report's top words."""
    limited = report.get("top_words", [])[:max_words]
    if not limited:
        return {"words": [], "max_frequency": 0}
    max_freq = max(w["total_freq"] for w in limited)
    return {
        "words": [
            {
                "text": w["word"],
                "frequency": w["total_freq"],
                "size": int((w["total_freq"] / max_freq) * 100) + 10,
            }
            for w in limited
        ],
        "max_frequency": max_freq,
        "total_words": len(limited),
    }


def export_chart_data(chart_data: dict, fmt: str = "json") -> str:
    """Chart-data export (visualizer.export_chart_data, visualizer.py:406-459):
    'json' dumps the structure; 'csv' flattens labels/series (and word-cloud
    word lists) into section rows, mirroring the reference's _convert_to_csv
    Metric/Value + per-table layout."""
    if fmt.lower() == "json":
        return json.dumps(chart_data, indent=2, default=str)
    if fmt.lower() != "csv":
        raise ValueError(f"unsupported export format: {fmt}")
    buf = io.StringIO()
    w = csv.writer(buf)
    if "words" in chart_data:  # word-cloud structure
        w.writerow(["word", "frequency", "size"])
        for row in chart_data["words"]:
            w.writerow([row["text"], row["frequency"], row["size"]])
        return buf.getvalue()
    labels = chart_data.get("labels", [])
    w.writerow(["series", *labels])
    for name, vals in chart_data.get("series", {}).items():
        w.writerow([name, *vals])
    return buf.getvalue()


# -- comparison dashboard (reference visualizer.py:296-405) -------------------

def build_comparison_report(
    spark: SparkSession, workdirs: list[str], top_n: int = 12
) -> dict:
    """Cross-session comparison data (visualizer.create_comparison_dashboard):
    per-session summary rows, grouped comparison chart series, a comparison
    table, and best-performer callouts; plus the distributed cross-session
    word merge (analytics.cross_session_top_words — one shuffle regardless of
    session count, unlike the reference's driver-side Counter addition)."""
    cross = analytics.cross_session_summary(spark, workdirs)
    sessions = cross["sessions"]
    labels = [
        (analytics._session_id(wd) or wd).rsplit("/", 1)[-1] for wd in workdirs
    ]

    def series(key):
        return [int(sessions[wd].get(key) or 0) for wd in workdirs]

    pages, failures, words = (
        series("pages_crawled"), series("fetch_failures"), series("total_words")
    )
    table = []
    for lbl, wd in zip(labels, workdirs):
        s = sessions[wd]
        attempts = (s.get("pages_crawled") or 0) + (s.get("fetch_failures") or 0)
        table.append(
            {
                "session": lbl,
                "rounds": s.get("rounds"),
                "pages_crawled": s.get("pages_crawled"),
                "fetch_failures": s.get("fetch_failures"),
                "success_rate_pct": (
                    round((s.get("pages_crawled") or 0) / attempts * 100, 1)
                    if attempts
                    else 0.0
                ),
                "total_words": s.get("total_words"),
                "unique_words": s.get("unique_words"),
                "hosts_fetched": s.get("hosts_fetched"),
            }
        )
    best = {}
    if table:
        best = {
            "most_pages": max(table, key=lambda r: r["pages_crawled"] or 0)["session"],
            "most_words": max(table, key=lambda r: r["total_words"] or 0)["session"],
            "highest_success_rate": max(table, key=lambda r: r["success_rate_pct"])[
                "session"
            ],
        }
    return {
        "session_info": {"session_count": len(workdirs), "session_names": labels},
        "charts": {
            "pages_comparison": {
                "labels": labels,
                "series": {"pages": pages, "failures": failures},
            },
            "words_comparison": {"labels": labels, "series": {"words": words}},
        },
        "comparison_table": table,
        "best_performers": best,
        "combined": cross["combined"],
        "top_words": [
            r.asDict()
            for r in analytics.cross_session_top_words(spark, workdirs, top_n).collect()
        ],
    }


def render_comparison_html(report: dict) -> str:
    """Self-contained comparison dashboard page (no JS, inline SVG) — the S13
    analog of the reference's chart.js comparison dashboard payload."""
    info = report["session_info"]
    charts = report["charts"]
    pages_chart = _svg_bar_chart(
        charts["pages_comparison"]["labels"],
        charts["pages_comparison"]["series"],
        "Pages crawled vs failed fetches per session",
    )
    words_chart = _svg_bar_chart(
        charts["words_comparison"]["labels"],
        charts["words_comparison"]["series"],
        "Words extracted per session",
    )
    topw_chart = _svg_bar_chart(
        [w["word"] for w in report["top_words"]],
        {"total_freq": [w["total_freq"] for w in report["top_words"]]},
        "Trending words across sessions",
    )
    tbl_headers = (
        list(report["comparison_table"][0].keys())
        if report["comparison_table"]
        else ["session"]
    )
    table = _html_table(
        tbl_headers, [list(r.values()) for r in report["comparison_table"]]
    )
    best = _html_table(
        ["category", "session"], [[k, v] for k, v in report["best_performers"].items()]
    )
    combined = _html_table(
        ["metric", "value"], [[k, v] for k, v in report["combined"].items()]
    )
    topw = _html_table(
        ["word", "total_freq", "n_pages", "n_sessions"],
        [
            [w["word"], w["total_freq"], w["n_pages"], w["n_sessions"]]
            for w in report["top_words"]
        ],
    )
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"/>
<title>Crawl comparison dashboard</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a2e; }}
h1, h2 {{ border-bottom: 1px solid #ddd; padding-bottom: .3rem; }}
table {{ border-collapse: collapse; margin: 1rem 0; }}
th, td {{ border: 1px solid #ccc; padding: .35rem .6rem; text-align: left; }}
th {{ background: #f0f0f5; }}
tbody tr:nth-child(even) {{ background: #fafafa; }}
</style></head><body>
<h1>Crawl comparison dashboard ({info["session_count"]} sessions)</h1>
<h2>Sessions</h2>{pages_chart}{words_chart}{table}
<h2>Best performers</h2>{best}
<h2>Combined totals</h2>{combined}
<h2>Trending words</h2>{topw_chart}{topw}
</body></html>
"""


def generate_comparison_report(
    spark: SparkSession,
    workdirs: list[str],
    path: str,
    fmt: str = "html",
    top_n: int = 12,
) -> str:
    """Comparison-dashboard entry point: build + render + write."""
    if fmt not in ("json", "html"):
        # reject instead of silently rendering HTML into a .csv/.md path —
        # generate_session_report raises on unknown formats the same way
        raise KeyError(f"unknown comparison-report format: {fmt!r}")
    report = build_comparison_report(spark, workdirs, top_n)
    rendered = (
        render_json(report) if fmt == "json" else render_comparison_html(report)
    )
    with open(path, "w") as f:
        f.write(rendered)
    return path
