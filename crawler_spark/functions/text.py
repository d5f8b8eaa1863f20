"""Span -> text -> tokens pipeline (SURVEY.md T1-T3, A1) as column expressions.

Reproduces the reference *worker path* exactly (SURVEY.md §7 decision 5):

  extractor.extract_text          /root/reference/src/crawler/content/extractor.py:43-73,306-330
  -> processor._clean_text        /root/reference/src/crawler/content/processor.py:228-248
  -> analyzer.analyze_text        /root/reference/src/crawler/content/analyzer.py:69-152

The input is the interleaved-documents span table (BASELINE.json input_hint):
``spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>``.
HTML parsing in the reference becomes span-kind predicates here — the corpus
is pre-segmented, so boilerplate removal (extractor.py:198-254) is
``filter(spans, kind in visible set)``.

Everything below is whole-stage-codegen-friendly: chained ``regexp_replace``,
``regexp_extract_all``, higher-order array functions. No Python executes on
the hot path; the pure-Python twin lives in oracle/simulator.py and is used
only to cross-check results in tests.

Note on charsets: the reference's non-printable regex ``[^\\x20-\\x7E\\u00A0-\\uFFFF]``
behaves differently for astral-plane codepoints under Python (re, UTF-32) vs
the JVM (UTF-16 surrogate pairs). The corpus generator emits BMP-only text so
both engines agree; documented in sources/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Span kinds that contribute to visible text. 'nav' is removed by
# remove_navigation=True (extractor.py:64-66, default), 'script'/'meta' by
# _remove_unwanted_elements (extractor.py:198-233); 'link' spans carry hrefs,
# 'media' spans carry media_ref only.
VISIBLE_KINDS = ("text", "title", "main")

# Hardcoded stopword set, verbatim semantic constant from the reference
# (analyzer.py:47-57). 78 distinct words ('the' is listed twice there).
STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "will", "with", "this", "but", "they", "have",
    "had", "what", "said", "each", "which", "she", "do", "how", "their",
    "if", "up", "out", "many", "then", "them", "these", "so", "some",
    "her", "would", "make", "like", "into", "him", "time", "two", "more",
    "go", "no", "way", "could", "my", "than", "first", "been", "call",
    "who", "oil", "sit", "now", "find", "down", "day", "did", "get",
    "come", "made", "may", "part",
)

MIN_WORD_LEN = 2   # analyzer.py:64
MAX_WORD_LEN = 50  # analyzer.py:65

# Simple alpha-token pattern on LOWERED text (analyzer.py:60 without the \b
# anchors — equivalent on all-lowercase input, cheaper, and expressible
# identically in DuckDB RE2). Shared by the dedup/textstats operators; the
# worker-parity tokenizer below keeps the exact (?U)\b form.
SIMPLE_WORD_RE = "[a-z]+"

# Regexes shared by both _clean_text variants (processor.py:228-248,
# extractor.py:306-330). Same pattern semantics in Java regex as in Python re.
_RE_NONPRINTABLE = r"[^\x20-\x7E -￿]"
_RE_URL = r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+"
_RE_EMAIL = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"
# (?U) = UNICODE_CHARACTER_CLASS so Java's \b treats non-ASCII letters as word
# chars, matching Python re semantics ('naïve' must NOT yield 'na').
_RE_WORD = r"(?U)\b[a-zA-Z]+\b"


def spans_sorted(spans: Column) -> Column:
    """Order spans by document offset (defensive; generator emits in order)."""
    return F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )


def visible_spans(spans: Column) -> Column:
    """F13/F14 boilerplate removal as a span-kind predicate."""
    return F.filter(spans_sorted(spans), lambda s: s["kind"].isin(*VISIBLE_KINDS))


def extract_text(spans: Column) -> Column:
    """T1 — soup.get_text(separator=' ', strip=True) analog over spans.

    extractor.py:256-270: visible text fragments joined with single spaces.
    Span text is pre-stripped by the corpus generator; empty fragments are
    dropped (get_text skips whitespace-only strings).
    """
    texts = F.transform(visible_spans(spans), lambda s: s["text"])
    return F.array_join(F.filter(texts, lambda t: t != F.lit("")), " ")


def clean_text_extractor(text: Column) -> Column:
    """T2a — extractor._clean_text (extractor.py:306-330).

    Whitespace collapse, '...'/'---' collapse, non-printable strip, URL strip,
    email strip, final collapse+trim. Applied first in the worker pipeline
    (inside extract_text, extractor.py:66-71).
    """
    t = F.regexp_replace(text, r"\s+", " ")
    t = F.regexp_replace(t, r"[.]{3,}", "...")
    t = F.regexp_replace(t, r"[-]{3,}", "---")
    t = F.regexp_replace(t, _RE_NONPRINTABLE, "")
    t = F.regexp_replace(t, _RE_URL, "")
    t = F.regexp_replace(t, _RE_EMAIL, "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def clean_text_processor(text: Column) -> Column:
    """T2b — processor._clean_text (processor.py:228-248).

    Same pipeline WITHOUT the '...'/'---' collapse. The worker applies this
    on top of the extractor clean (worker.py:154) — the double-clean
    composition is intentional and reproduced (SURVEY.md T2 note).
    """
    t = F.regexp_replace(text, r"\s+", " ")
    t = F.regexp_replace(t, _RE_NONPRINTABLE, "")
    t = F.regexp_replace(t, _RE_URL, "")
    t = F.regexp_replace(t, _RE_EMAIL, "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def worker_clean_text(spans: Column) -> Column:
    """Full worker-path text: extract_text -> extractor clean -> processor clean."""
    return clean_text_processor(clean_text_extractor(extract_text(spans)))


def tokens(text: Column) -> Column:
    """T3 — analyzer._extract_words (analyzer.py:127-152).

    findall(r'\\b[a-zA-Z]+\\b', text.lower()), keep 2<=len<=50, drop
    stopwords. The isalpha() check is implied by the [a-zA-Z]+ pattern.
    Returns array<string> preserving occurrence order and multiplicity.
    """
    raw = F.regexp_extract_all(F.lower(text), F.lit(_RE_WORD), F.lit(0))
    return F.filter(
        raw,
        lambda w: (F.length(w) >= MIN_WORD_LEN)
        & (F.length(w) <= MAX_WORD_LEN)
        & ~w.isin(*STOPWORDS),
    )


def link_spans(spans: Column) -> Column:
    """T5 feed — href spans in document order (kind='link', text=href)."""
    return F.filter(spans_sorted(spans), lambda s: s["kind"] == F.lit("link"))


def main_content(spans: Column) -> Column:
    """F15/O4 — main-content selection (extractor.py:272-304).

    The reference tries CSS selectors (main, article, [role=main], ...) and
    falls back to the largest text block over 50 chars, else the whole page.
    Span analog: 'main'-kind spans if present; else the single longest
    'text' span > 50 chars (argmax via array_max over (len, -offset, text)
    structs — unique offsets make the tiebreak deterministic); else the full
    visible text (extract_text's own fallback, extractor.py:56-62).
    """
    mains = F.filter(spans_sorted(spans), lambda s: s["kind"] == F.lit("main"))
    texts = F.filter(
        spans_sorted(spans),
        lambda s: (s["kind"] == F.lit("text")) & (F.length(s["text"]) > 50),
    )
    best = F.array_max(
        F.transform(
            texts,
            lambda s: F.struct(
                F.length(s["text"]).alias("l"), (-s["offset"]).alias("o"), s["text"].alias("t")
            ),
        )
    )
    return (
        F.when(F.size(mains) > 0, F.array_join(F.transform(mains, lambda s: s["text"]), " "))
        .when(F.size(texts) > 0, best["t"])
        .otherwise(extract_text(spans))
    )


def metadata_map(spans: Column) -> Column:
    """T4 — meta/JSON-LD span extraction (extractor.py:75-122, 387-424).

    The corpus carries page metadata (og:*, twitter:*, JSON-LD flattened) as
    JSON text in ``kind='meta'`` spans; this merges them, later spans winning
    on key collision like the reference's sequential dict .update(). Returns
    ``map<string,string>`` (empty map when the page has no meta spans).
    """
    metas = F.filter(spans_sorted(spans), lambda s: s["kind"] == F.lit("meta"))
    parsed = F.transform(
        metas, lambda s: F.from_json(s["text"], "map<string,string>")
    )
    empty = F.from_json(F.lit("{}"), "map<string,string>")
    return F.aggregate(
        parsed,
        empty,
        lambda acc, m: F.map_zip_with(
            acc,
            F.coalesce(m, empty),
            lambda _, v1, v2: F.coalesce(v2, v1),
        ),
    )
