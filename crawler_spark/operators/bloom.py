"""Partitioned Bloom filter as plain DataFrame bit arithmetic.

The reference keeps a Bloom filter beside its exact URL-seen set
(/root/reference/src/crawler/url_management/queue.py:60-77: ``put()``
consults the Bloom + pending map; the visited set stays the source of
truth), and the north rule calls for a *partitioned* Bloom/cuckoo URL-seen
structure. Inside a single Spark job the engine already gets this for free
— the runtime Bloom-filter join (sparkutils.py) builds and pushes one
automatically into the J1 anti-join — but that filter lives and dies with
one query. This module is the EXPLICIT, persistable realization: one Bloom
per host_bucket, stored as ordinary (bucket, word, bits) rows, so a round
can prune candidates against last round's committed blooms BEFORE any
join, ship blooms to other systems, or rebuild only dirty buckets
alongside the dirty-bucket frontier commit.

Everything is exact integer bit math on int64 words holding 63 bits each
(bit 63 stays clear: DuckDB's ``<<`` refuses a 63-bit shift, and this way
every word is a nonnegative, engine-portable BIGINT) — so the whole
structure, including its false positives, is bit-reproducible in SQL and
sits under the driver's value-hash oracle.

Hashing: h1/h2 are the two independent 60-bit halves of one md5 (the
engine's portable-hash convention, functions/hashing.py), combined by
Kirsch–Mitzenmacher double hashing ``pos_i = (h1 + i*h2') mod m`` with
``h2' = 1 + (h2 mod (m-1))`` so the stride is never 0.

Scale: the build is one groupBy((bucket, word)) bit_or — map-side
combinable, output = buckets * m/63 words (a 2^20-bit bloom per 4096
buckets is ~64 MB total, broadcastable). The prune explodes k positions
per candidate and joins on (bucket, word): candidates-sized work, no
shuffle of the seen set, no false negatives ever (guaranteed by
construction and pinned by tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 63


def _h1(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _h2(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key), 16, 15), 16, 10).cast("long")


def bloom_positions(key: Column, m: int, k: int) -> Column:
    """array<long> of the k bit positions of ``key`` in an m-bit Bloom."""
    h1m = F.pmod(_h1(key), F.lit(m))
    h2m = F.lit(1) + F.pmod(_h2(key), F.lit(m - 1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1m + i.cast("long") * h2m, F.lit(m)),
    )


def _pos_words(df: DataFrame, key_col: str, bucket_col: str, m: int, k: int) -> DataFrame:
    """(bucket, key, word, mask): one row per (key, hash index)."""
    pos = F.explode(bloom_positions(F.col(key_col), m, k)).alias("_pos")
    return df.select(
        F.col(bucket_col).alias("_bkt"), F.col(key_col).alias("_key"), pos
    ).select(
        "_bkt",
        "_key",
        F.expr(f"_pos div {WORD_BITS}").alias("word"),
        F.expr(f"shiftleft(1L, CAST(_pos % {WORD_BITS} AS INT))").alias("mask"),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Per-bucket Bloom bitmaps: (bucket, word, bits), only nonzero words.

    ``m`` is bits per BUCKET (not global), so the false-positive rate is
    governed by the bucket's own key count — the partitioned sizing the
    reference applies per crawl session (queue.py Bloom capacity).
    """
    return (
        _pos_words(df, key_col, bucket_col, m, k)
        .groupBy(F.col("_bkt").alias(bucket_col), "word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prune(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    bucket_col: str,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Candidates that the Bloom reports as POSSIBLY SEEN (all k bits set).

    The complement (definitely-fresh rows) can skip the exact anti-join
    entirely; rows returned here still need the exact check — Bloom
    semantics, false positives possible, false negatives impossible.
    Returns the candidate rows (original columns) that hit.
    """
    probes = _pos_words(candidates, key_col, bucket_col, m, k)
    b = bloom.select(
        F.col(bucket_col).alias("_bkt"), "word", "bits"
    )
    hits = (
        probes.join(b, ["_bkt", "word"], "left")
        .withColumn(
            "_hit",
            F.when((F.col("bits").isNotNull()) & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")), 1).otherwise(0),
        )
        .groupBy("_bkt", "_key")
        .agg(F.sum("_hit").alias("_nhit"))
        .where(F.col("_nhit") == k)
        .select(F.col("_bkt").alias(bucket_col), F.col("_key").alias(key_col))
    )
    return candidates.join(hits, [bucket_col, key_col], "left_semi")
