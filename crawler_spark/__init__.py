"""crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the dataflow semantics of
``gennadylaventman/crawler`` (reference at /root/reference, analyzed in
SURVEY.md) on an idiomatic Spark substrate:

- frontier / url_seen / pages / word_frequencies / links / metrics live in
  snapshot-committed tables (Iceberg semantics; parquet-backed here because
  the sandbox ships no Iceberg runtime — see ``crawler_spark.tables``),
- one *scheduling round* = a deterministic set of DataFrame jobs ending in a
  single atomic commit (SURVEY.md §4 physical-plan sketch),
- politeness, priority ordering, dedup, extraction and word frequency are
  pure column expressions / vectorized pandas UDFs — no per-row Python.
"""

__version__ = "0.2.1"
