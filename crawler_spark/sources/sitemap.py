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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SITEMAP_PRIORITY = 3  # engine.py:679
SITEMAP_DEPTH = 1     # engine.py:678

_LOC_RE = r"<loc>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"


def extract_locs(xml: Column, max_urls: int = 10_000) -> Column:
    """``<loc>`` URLs from sitemap XML, document order, capped at max_urls."""
    return F.slice(
        F.regexp_extract_all(xml, F.lit(_LOC_RE), F.lit(1)), 1, max_urls
    )


def sitemap_frontier_rows(
    sitemaps: DataFrame, xml_col: str = "xml", max_urls: int = 10_000
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
        F.lit(SITEMAP_PRIORITY).alias("priority"),
        F.lit(SITEMAP_DEPTH).alias("depth"),
        "sitemap_ord",
        "sitemap_pos",
    )
