"""Spark-native synthetic interleaved-docs corpus — scale-test twin of
``corpus.gen_corpus``.

gen_corpus builds Python dicts on the driver: exact, span-rich, and the
parity fixture — but unusable beyond ~10^4 pages. This module generates the
same table SHAPE (doc_id, spans array<struct<kind,text,media_ref,offset>>)
with pure column expressions over ``spark.range``: deterministic (xxhash64
arithmetic, no RNG), zero driver-side data, linear in executors — the input
for crawling 10^5..10^8 pages through the REAL round pipeline (extraction
regexes included), which the core-op bench (bench.py) does not exercise.

Graph shape mirrors the fixture: per-host page cliques plus cross-host links
concentrated on hot hosts (skew), a fraction of dangling targets (fetch-miss
path), and hrefs spelled in canonicalization-variant forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_POOL = [
    "spark", "crawler", "frontier", "schedule", "queue", "politeness",
    "document", "content", "analysis", "engine", "data", "pipeline",
    "the", "and", "for", "with", "that", "this", "from", "they",
    "scan", "merge", "window", "batch", "stream", "filter", "group",
    "sort", "join", "value",
]


def _vocab() -> Column:
    return F.array(*[F.lit(w) for w in _POOL])


def _words(seed: Column, salt: int, n: int) -> Column:
    """n deterministic vocab words drawn by hashing (seed, salt, k)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda k: F.element_at(
            _vocab(),
            (F.pmod(F.xxhash64(seed, F.lit(salt), k), F.lit(len(_POOL))) + 1).cast("int"),
        ),
    )


def _span(kind: str, text: Column, off: int, media_ref: Column | None = None) -> Column:
    return F.struct(
        F.lit(kind).alias("kind"),
        text.alias("text"),
        (media_ref if media_ref is not None else F.lit("")).alias("media_ref"),
        F.lit(off).alias("offset"),
    )


def _page_url(host: Column, page: Column) -> Column:
    return F.concat(
        F.lit("http://host"),
        host.cast("string"),
        F.lit(".test/"),
        F.when(page == 0, F.lit("")).otherwise(F.concat(F.lit("page"), page.cast("string"))),
    )


def corpus_df(
    spark: SparkSession,
    hosts: int = 1000,
    pages_per_host: int = 100,
    links_per_page: int = 6,
    hot_hosts: int = 2,
    missing_ppm: int = 50_000,
) -> DataFrame:
    """(doc_id, spans) for hosts x pages_per_host pages, expression-only.

    ``missing_ppm``/1e6 of link targets point at never-generated pages (the
    404 analog). ~30% of cross-host links hit the ``hot_hosts`` lowest ids.
    """
    n = hosts * pages_per_host
    base = (
        spark.range(n)
        .withColumn("host", (F.col("id") / pages_per_host).cast("long"))
        .withColumn("page", F.pmod(F.col("id"), pages_per_host))
    )

    def link(j: int) -> Column:
        h = F.col("id")
        same_host = F.pmod(F.xxhash64(h, F.lit(j), F.lit(1)), 100) < 55
        to_hot = F.pmod(F.xxhash64(h, F.lit(j), F.lit(2)), 100) < 30
        target_host = (
            F.when(same_host, F.col("host"))
            .when(to_hot, F.pmod(F.xxhash64(h, F.lit(j), F.lit(3)), hot_hosts))
            .otherwise(F.pmod(F.xxhash64(h, F.lit(j), F.lit(4)), hosts))
        )
        missing = F.pmod(F.xxhash64(h, F.lit(j), F.lit(5)), 1_000_000) < missing_ppm
        target_page = F.when(
            missing, F.lit(10**7) + F.pmod(F.xxhash64(h, F.lit(j), F.lit(6)), 10**6)
        ).otherwise(F.pmod(F.xxhash64(h, F.lit(j), F.lit(7)), pages_per_host))
        url = _page_url(target_host, target_page)
        # canonicalization-variant spellings (F2/F3 exercise)
        style = F.pmod(F.xxhash64(h, F.lit(j), F.lit(8)), 4)
        return (
            F.when(style == 0, url)
            .when(style == 1, F.regexp_replace(url, "^http://", "http://www."))
            .when(style == 2, F.concat(url, F.lit("?utm_source=x&gclid=1")))
            .otherwise(F.concat(url, F.lit("#frag")))
        )

    spans = F.array(
        _span("title", F.concat(F.lit("Page "), F.col("page").cast("string")), 0),
        _span("nav", F.lit("home about contact"), 1),
        _span("text", F.array_join(_words(F.col("id"), 10, 12), " "), 2),
        _span("text", F.array_join(_words(F.col("id"), 11, 14), " "), 3),
        _span(
            "media",
            F.lit(""),
            4,
            F.concat(F.lit("http://cdn.test/img"), F.pmod(F.xxhash64("id"), 1000).cast("string"), F.lit(".png")),
        ),
        *[_span("link", link(j), 5 + j) for j in range(links_per_page)],
    )
    # F8/F9 fetch-outcome columns, expression-only (twin of gen_corpus):
    # ~4% non-HTML content types and ~2% oversized bodies on non-root pages
    # (roots stay fetchable so seeded crawls always start); distinct hash
    # salts keep the draws decorrelated from each other and from the graph
    ct_roll = F.pmod(F.xxhash64(F.col("id"), F.lit(101)), 100)
    content_type = (
        F.when((F.col("page") == 0) | (ct_roll >= 4), F.lit("text/html; charset=utf-8"))
        .otherwise(
            F.element_at(
                F.array(
                    F.lit("application/pdf"), F.lit("image/png"), F.lit("application/json")
                ),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(102)), 3) + 1).cast("int"),
            )
        )
    )
    size_roll = F.pmod(F.xxhash64(F.col("id"), F.lit(103)), 100)
    size_bytes = (
        F.when(
            (F.col("page") > 0) & (size_roll < 2),
            F.lit(10_485_760) + F.pmod(F.xxhash64(F.col("id"), F.lit(104)), 1_000_000) + 1,
        )
        .otherwise(F.lit(500) + F.pmod(F.xxhash64(F.col("id"), F.lit(105)), 49_500))
        .cast("long")
    )
    return base.select(
        _page_url(F.col("host"), F.col("page")).alias("doc_id"),
        spans.alias("spans"),
        content_type.alias("content_type"),
        size_bytes.alias("size_bytes"),
    )


def sitemap_docs_df(
    spark: SparkSession,
    hosts: int,
    pages_per_host: int,
    every: int = 8,
    locs_per_sitemap: int = 20,
) -> DataFrame:
    """One generated sitemap XML per ``every``-th host, listing its first
    ``locs_per_sitemap`` non-root pages — expression-only, so the S3/S4
    frontier leg can be exercised at 10^5+ pages with zero driver data.
    Returns (sitemap_ord, xml) ready for ``run_crawl(sitemaps_df=...)``.
    """
    n_locs = max(min(locs_per_sitemap, pages_per_host - 1), 1)
    base = spark.range(0, hosts, every).withColumn("host", F.col("id"))
    locs = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), F.lit(n_locs)),
            lambda k: F.concat(
                F.lit("<url><loc>"),
                _page_url(F.col("host"), k),
                F.lit("</loc></url>"),
            ),
        ),
    )
    return base.select(
        (F.col("id") / every).cast("int").alias("sitemap_ord"),
        F.concat(F.lit("<urlset>"), locs, F.lit("</urlset>")).alias("xml"),
    )


def seed_urls(hosts: int, every: int = 1) -> list[dict]:
    """Seed list: root page of every ``every``-th host."""
    return [
        {"url": f"http://host{h}.test/", "priority": 10, "depth": 0}
        for h in range(0, hosts, every)
    ]
