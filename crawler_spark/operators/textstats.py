"""Text analysis operators — language-ID, quality scoring, token counts,
document fingerprinting.

These extend the reference's content pipeline (processor.py quality metrics at
/root/reference/src/crawler/content/processor.py:338-378, analyzer word stats
at content/analyzer.py:93-122) with the operations a training-data pipeline
runs over a crawled corpus. Everything is pure column expressions inside
whole-stage codegen — no Python UDFs — and every operator has a DuckDB oracle
twin in crawler_spark.queries.

Language ID is the classic stopword-profile heuristic (Cavnar & Trenkle-style
rank profiles reduced to a coverage score): the fraction of tokens that are
English function words. It is deliberately deterministic and SQL-expressible;
a production system would swap in fastText behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.hashing import hash60, minhash_term
from crawler_spark.functions.text import SIMPLE_WORD_RE as TOKEN_RE
from crawler_spark.functions.text import STOPWORDS

# English function-word profile used by the language-ID vote. Distinct from
# the analyzer STOPWORDS (that set is a *filter*; this one is a *signal*).
EN_MARKERS = (
    "the", "and", "of", "to", "in", "is", "that", "for", "with", "are",
    "was", "this", "they", "from", "have", "has", "not", "you", "his", "her",
)

# Multi-language function-word profiles (Cavnar & Trenkle-style coverage
# vote, one set per language). Small and overlapping by nature (fr/es share
# 'la'); the argmax with a deterministic alphabetical tiebreak handles it.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "das", "nicht", "ein", "mit",
           "auf", "für", "von", "sich", "dem", "den", "zu"),
    "en": EN_MARKERS,
    "es": ("el", "los", "las", "es", "una", "en", "por", "para",
           "con", "del", "se", "que", "un", "como", "más"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "pour",
           "que", "pas", "sur", "au", "ce", "il"),
}


def _tokens(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), F.lit(0))


def with_lang_id(df: DataFrame, text_col: str, threshold: float = 0.05) -> DataFrame:
    """Add ``pred_lang``: 'en' if the English-marker token ratio >= threshold.

    ratio = |tokens in EN_MARKERS| / |tokens| (0 when the doc has no tokens).
    """
    toks = _tokens(F.col(text_col))
    n_mark = F.size(F.filter(toks, lambda t: t.isin(*EN_MARKERS)))
    ratio = F.when(F.size(toks) > 0, n_mark / F.size(toks)).otherwise(F.lit(0.0))
    return df.withColumn(
        "pred_lang", F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other"))
    )


def with_lang_id_multi(
    df: DataFrame, text_col: str, threshold: float = 0.05
) -> DataFrame:
    """Multi-class language ID: per-language marker-coverage scores, argmax
    with an alphabetical tiebreak, 'other' when the best score is under the
    threshold. Pure column expressions; the deterministic heuristic stands
    in for fastText behind the same column contract."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)

    def _in_markers(markers):
        # one-arg lambda per set: a (t, m=m) signature would make F.filter
        # pass the array index as the second argument
        return lambda t: t.isin(*markers)

    scores = {}
    for lang in sorted(LANG_MARKERS):
        hits = F.size(F.filter(toks, _in_markers(LANG_MARKERS[lang])))
        scores[lang] = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
    best = F.greatest(*scores.values())
    pred = F.when(best < threshold, F.lit("other"))
    for lang in sorted(scores):  # alphabetical: first equal-to-best wins
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.withColumn("pred_lang", pred)


def quality_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality scoring: char/word/sentence counts, ratios, validity.

    - word_count / char counts mirror processor.py:338-349 content density;
    - sentence_count uses the reference's deterministic fallback
      ``[.!?]+`` splitter (processor.py:351-362);
    - stopword_ratio over the analyzer stopword set (analyzer.py:47-57);
    - is_valid applies the F11 thresholds (processor.py:364-378):
      >= 100 chars and 10 <= words <= 50000.
    Ratios are rounded to 4 dp so oracle value-hashing is float-safe.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    return df.select(
        F.col(id_col).alias("doc"),
        F.length(text).alias("char_count"),
        n_tok.alias("word_count"),
        F.size(F.regexp_extract_all(text, F.lit("[.!?]+"), F.lit(0))).alias("sentence_count"),
        F.round(F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)), 4).alias("stopword_ratio"),
        F.round(F.when(F.length(text) > 0, alpha_chars / F.length(text)).otherwise(F.lit(0.0)), 4).alias("alpha_ratio"),
        F.round(F.when(F.length(text) > 0, punct_chars / F.length(text)).otherwise(F.lit(0.0)), 4).alias("punct_ratio"),
        (
            (F.length(text) >= 100) & (n_tok >= 10) & (n_tok <= 50_000)
        ).alias("is_valid"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens, alpha tokens, and BPE-ish piece counts per doc.

    pieces = runs of letters, runs of digits, or single other non-space chars
    (a crude byte-pair proxy: the count an ASCII BPE would not exceed).
    """
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda t: t != F.lit("")))
    alpha = F.size(_tokens(text))
    pieces = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    return df.select(
        F.col(id_col).alias("doc"),
        ws.alias("ws_tokens"),
        alpha.alias("alpha_tokens"),
        pieces.alias("pieces"),
    )


# T6 — span-kind structure counts, the interleaved-span analog of the
# reference's per-page HTML tag counts (processor.py:322-336 counts total
# tags plus a fixed tag list; our documents are pre-segmented spans, so the
# kinds below are the tag vocabulary).
SPAN_KINDS = ("title", "nav", "script", "meta", "text", "main", "media", "link")


def _kind_pred(k: str):
    # a one-arg lambda per kind: a default-arg (s, k=k) signature would make
    # F.filter pass the ARRAY INDEX as the second argument
    return lambda s: s["kind"] == F.lit(k)


def span_structure(spans_col: Column) -> Column:
    """Struct of per-kind span counts + total, all JVM-side array filters."""
    return F.struct(
        F.size(spans_col).alias("n_spans"),
        *[
            F.size(F.filter(spans_col, _kind_pred(k))).alias(f"n_{k}")
            for k in SPAN_KINDS
        ],
    )


def span_structure_counts(
    df: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """(doc, n_spans, n_title, ..., n_link) per document (T6)."""
    s = span_structure(F.col(spans_col))
    return df.select(F.col(id_col).alias("doc"), s.alias("_s")).select(
        "doc", "_s.*"
    )


def span_interleaving_stats(
    df: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Interleaving-structure statistics over the spans array — the
    multimodal layout view of the input_hint's interleaved document shape
    (text + media spans in offset order), complementing the per-kind
    histogram of :func:`span_structure_counts`.

    Per document: n_spans, n_kinds (distinct kind alphabet used),
    n_media / n_text (kind buckets), n_transitions (adjacent spans whose
    kind differs — 0 for a single-kind doc), and media_permille (exact
    integer parts-per-thousand of media spans). Pure array expressions on
    the already-loaded spans column: zero shuffles, zero Python — the map-
    side profile that precedes any media-aware sharding/mixing decision.
    """
    spans = F.col(spans_col)
    kinds = F.transform(spans, lambda s: s["kind"])
    trans = F.when(
        F.size(spans) >= 2,
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size(spans) - 1),
                lambda i: F.get(kinds, i) != F.get(kinds, i - 1),
            )
        ),
    ).otherwise(F.lit(0))
    n_media = F.size(F.filter(spans, lambda s: s["kind"] == "media"))
    n_text = F.size(
        F.filter(spans, lambda s: s["kind"].isin("text", "main", "title"))
    )
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(spans).cast("long").alias("n_spans"),
        F.size(F.array_distinct(kinds)).cast("long").alias("n_kinds"),
        n_text.cast("long").alias("n_text"),
        n_media.cast("long").alias("n_media"),
        trans.cast("long").alias("n_transitions"),
        F.expr(
            f"(size(filter({spans_col}, s -> s.kind = 'media')) * 1000)"
            f" div size({spans_col})"
        ).alias("media_permille"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive 60-bit doc fingerprint + MinHash-style sketch value.

    fp_xor  = bit_xor over hash60 of the doc's distinct tokens — a set
              fingerprint (two docs with equal token sets collide by design).
    fp_min  = min over tokens of the first MinHash permutation — a 1-wide
              MinHash sketch usable as a cheap near-dup prefilter.
    Both are one shuffle (groupBy doc) over the exploded token stream.
    """
    toks = _tokens(F.col(text_col))
    exploded = df.select(
        F.col(id_col).alias("doc"), F.explode(F.array_distinct(toks)).alias("tok")
    ).withColumn("th", hash60(F.col("tok")))
    return exploded.groupBy("doc").agg(
        F.bit_xor(F.col("th")).alias("fp_xor"),
        F.min(minhash_term(0, F.pmod(F.col("th"), F.lit(2_147_483_647)))).alias("fp_min"),
    )


# --------------------------------------------------------------------------
# Training-data hygiene beyond the reference: repetition scoring (the
# Gopher/MassiveText repetition filters, token-count variant) and PII
# redaction (the standard email/IP/phone scrub, e.g. BigScience ROOTS).
# The reference crawler has no analog; these are LLM-corpus operators over
# the same tokenizer the rest of the package uses.

# ASCII-only patterns chosen to behave identically under java.util.regex
# (Spark) and RE2 (DuckDB oracle): no lookaround, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PII_PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,5}\b"


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition scores (Gopher-style, token-count variant).

    - max_word_ratio: occurrences of the single most frequent token / total
      tokens;
    - top_bigram_ratio: tokens covered by the most frequent bigram
      (2 * its count) / total tokens;
    - is_repetitive: either ratio past its threshold (0.14 / 0.15 — the
      ~p90 of the synthetic corpus; production corpora retune these).

    Plan shape: two explode+groupBy passes (words, bigrams) joined back on
    doc — each a single hash-partitioned aggregate, no windows, no UDFs.
    Ratios rounded to 4 dp for oracle float-safety.
    """
    d = df.select(F.col(id_col).alias("doc"), _tokens(F.col(text_col)).alias("t"))
    base = d.select("doc", F.size("t").alias("n_tok"))
    wtop = (
        d.select("doc", F.explode("t").alias("w"))
        .groupBy("doc", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc")
        .agg(F.max("c").alias("max_w"))
    )
    bigrams = F.expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    btop = (
        d.where(F.size("t") >= 2)
        .select("doc", F.explode(bigrams).alias("b"))
        .groupBy("doc", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc")
        .agg(F.max("c").alias("max_b"))
    )
    n_tok = F.col("n_tok")
    wr = F.round(F.when(n_tok > 0, F.coalesce(F.col("max_w"), F.lit(0)) / n_tok).otherwise(F.lit(0.0)), 4)
    br = F.round(F.when(n_tok > 0, 2 * F.coalesce(F.col("max_b"), F.lit(0)) / n_tok).otherwise(F.lit(0.0)), 4)
    return (
        base.join(wtop, "doc", "left")
        .join(btop, "doc", "left")
        .select(
            "doc",
            "n_tok",
            wr.alias("max_word_ratio"),
            br.alias("top_bigram_ratio"),
            ((wr > 0.14) | (br > 0.15)).alias("is_repetitive"),
        )
    )


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub emails, IPv4 addresses, and phone numbers from ``text_col``.

    Redaction is sequential — email, then IPv4, then phone — so the phone
    pattern can never re-match the digit runs of an already-redacted IP
    (3-digit octets would otherwise phone-match). Each count is taken on
    the text as it stood when that pattern ran, making the triple
    (n_emails, n_ips, n_phones) disjoint by construction.

    Pure regexp_replace/regexp_extract_all column expressions: JVM-side,
    whole-stage-codegen, no UDFs; at 100 TB this is a map-only pass.
    """
    raw = F.col(text_col)
    after_email = F.regexp_replace(raw, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    after_phone = F.regexp_replace(after_ip, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(F.regexp_extract_all(raw, F.lit(PII_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(PII_IPV4_RE), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(PII_PHONE_RE), F.lit(0))).alias("n_phones"),
        after_phone.alias("redacted"),
    )
