"""Sitemap XML parsing (SURVEY.md S4) as column expressions.

The reference parses sitemap XML with ElementTree plus a regex fallback
``<loc>(.*?)</loc>`` capped at max_urls
(/root/reference/src/crawler/url_management/robots.py:331-426), and enqueues
the result at priority 3 / depth 1 (engine.py:658-679), capped at
``max_pages // 4`` (engine.py:662).

Here the deterministic regex path IS the implementation (the reference's own
fallback), expressed as `regexp_extract_all` so sitemap expansion of millions
of documents stays inside whole-stage codegen — no XML library on the hot
path. Namespaced and plain sitemaps both match; CDATA and surrounding
whitespace are stripped like the reference's ``.strip()``.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SITEMAP_PRIORITY = 3  # engine.py:679
SITEMAP_DEPTH = 1     # engine.py:678

# S3 — the reference's 5 common sitemap locations, probe order is
# load-bearing (robots.py:442-448)
COMMON_SITEMAP_PATHS = (
    "/sitemap.xml",
    "/sitemap_index.xml",
    "/sitemaps.xml",
    "/sitemap/sitemap.xml",
    "/sitemaps/sitemap.xml",
)


def robots_sitemap_urls(robots_txt: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt, in file order (the
    reference's robots_checker.get_sitemaps delegates to stdlib
    RobotFileParser.site_maps, robots.py:271-296)."""
    from urllib.robotparser import RobotFileParser

    if not robots_txt:
        return []
    rfp = RobotFileParser()
    try:
        rfp.parse(robots_txt.splitlines())
    except Exception:
        return []
    return list(rfp.site_maps() or [])


def discover_sitemaps(
    spark: SparkSession,
    seeds: list[dict],
    sitemap_docs: DataFrame,
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
    robots_txt_by_host: dict[str, str] | None = None,
) -> DataFrame:
    """S3 (robots.py:428-468): per start URL, probe the robots-declared
    sitemaps first (engine.py:649-655) then the 5 common locations, in
    order; ``sitemap_docs`` (sitemap_url, xml) stands in for the live
    HEAD-200-and-xml-content-type probe — a URL "exists" iff the table has
    its row. Candidate generation is driver-side (seeds are CLI-sized); the
    existence probe is a broadcast join against the docs table, which may be
    arbitrarily large. Returns (sitemap_ord, xml) ready for
    :func:`sitemap_frontier_rows` / ``run_crawl(sitemaps_df=...)``, deduped
    to the first discovery of each sitemap URL.
    """
    rows, ordn = [], 0
    for s in seeds:
        parsed = urlparse(s["url"])
        base = f"{parsed.scheme}://{parsed.netloc}"
        declared = (robots_txt_by_host or {}).get(parsed.netloc.lower(), "")
        for u in robots_sitemap_urls(declared):
            rows.append((ordn, u))
            ordn += 1
        for path in COMMON_SITEMAP_PATHS:
            rows.append((ordn, base + path))
            ordn += 1
    cand = spark.createDataFrame(rows, "sitemap_ord int, sitemap_url string")
    hits = cand.join(
        sitemap_docs.select(
            F.col(url_col).alias("sitemap_url"), F.col(xml_col).alias("xml")
        ),
        "sitemap_url",
    )
    # two seeds on one host probe the same URL: keep the first discovery
    # (queue first-put-wins makes later parses no-ops in the reference)
    from pyspark.sql import Window

    w = Window.partitionBy("sitemap_url").orderBy("sitemap_ord")
    return (
        hits.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("sitemap_ord", "xml")
    )

# <loc> values INSIDE <url> blocks only — the reference's ET parse walks
# './/url/loc' (robots.py:388-404), so a <sitemapindex> file (whose <loc>
# entries live under <sitemap>, not <url>) yields ZERO page URLs there; the
# tempered (?!</url>) token keeps a loc-less <url> block from capturing the
# next block's loc.
_LOC_RE = (
    r"(?s)<url[\s>](?:(?!</url>).)*?"
    r"<loc>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"
)


def extract_locs(xml: Column, max_urls: int = 10_000) -> Column:
    """``<url>``-scoped ``<loc>`` URLs, document order, capped at max_urls."""
    return F.slice(
        F.regexp_extract_all(xml, F.lit(_LOC_RE), F.lit(1)), 1, max_urls
    )


def sitemap_frontier_rows(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    max_urls: int = 10_000,
    priority: int = SITEMAP_PRIORITY,
    depth: int = SITEMAP_DEPTH,
) -> DataFrame:
    """Explode sitemap documents into frontier candidate rows (S4 -> E2).

    Returns (url, priority, depth, sitemap_ord, sitemap_pos) ready to union
    with seeds and discovered links; the caller applies normalization/
    validation (F1-F3). ``max_urls`` is the PER-SITEMAP cap — the reference
    passes ``max_pages // 4`` to each ``parse_sitemap`` call (engine.py:662).
    ``sitemap_ord`` (the file's position in the reference's sitemap_urls
    iteration, engine.py:656-662) is taken from the input when present so
    multi-sitemap enqueue order is deterministic; single-file inputs may omit
    it.
    """
    ord_col = (
        F.col("sitemap_ord") if "sitemap_ord" in sitemaps.columns else F.lit(0)
    ).cast("int")
    return sitemaps.select(
        ord_col.alias("sitemap_ord"),
        F.posexplode(extract_locs(F.col(xml_col), max_urls)).alias("sitemap_pos", "url"),
    ).select(
        "url",
        F.lit(priority).alias("priority"),
        F.lit(depth).alias("depth"),
        "sitemap_ord",
        "sitemap_pos",
    )
