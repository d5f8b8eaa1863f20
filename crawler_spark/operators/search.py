"""Search-side operators — inverted index and BM25 ranking over the corpus.

The reference crawler's downstream store is a word-frequency warehouse
(storage/database.py:422-433,502-562 — per-word totals and per-page counts
via analyzer.py:127-152's tokenizer); the natural consumer of that store is
a search index. These operators build that consumer Spark-first:

- :func:`inverted_index` — the classic posting-list index (term -> document
  ids), with hot-term posting pruning: document frequencies are computed in
  a cheap map-side-combinable aggregate first, and full posting arrays are
  materialized only for terms under a df cap (the under-cap vocabulary is
  broadcast back onto the token stream, so no giant stop-word posting list
  is ever collected then thrown away). At web scale the over-cap terms are
  exactly the ones a real engine stores as blocked/skipped postings or
  drops as stopwords, so the cap is the honest scale knob, not a shortcut.

- :func:`bm25_topk` — Okapi BM25 ranking (Robertson et al., TREC-3) with
  k1 = 1.2, b = 0.75, reformulated in exact integer arithmetic so the
  result value-hashes identically in Spark and the DuckDB oracle:

      tf_norm = tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)
              = 22*tf*S / (10*tf*S + 3*S + 9*dl*N)        [avgdl = S/N]
      tf_norm_bp  = (220000*tf*S) div (10*tf*S + 3*S + 9*dl*N)
      idf_bp      = (2N - 2df + 1) * 10000 div (2df + 1)
      score_scaled = sum over matched query terms of idf_bp * tf_norm_bp

  i.e. the length-normalized saturating-tf term is exact basis points of
  the real BM25 tf term, and the idf weight is the exact rational argument
  of the Robertson-Sparck Jones log idf, scaled. The rational idf is a
  monotone (rank-preserving per term) stand-in for ln((N-df+.5)/(df+.5));
  production swaps one line to the float-log form — same plan shape. All
  quantities are int64-exact while tf*S < 2^63/220000 (~4e13 token-pairs;
  beyond that the same expressions run in decimal(38,0) or double).

Plan shape / scale: the token stream is filtered to the query terms BEFORE
any aggregation (predicate on the exploded words — only postings for the
query vocabulary shuffle), per-term df and the 1-row corpus stats join back
via broadcast, and the only doc-keyed shuffle is the per-doc (dl, tf)
aggregation. Top-k is a global sort of per-doc scores over the matched
docs only — the set a real index would score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions import text as X


def _word_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, word) with multiplicity, through the analyzer tokenizer (T3)."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.explode(X.tokens(F.col(text_col))).alias("word"),
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 100,
) -> DataFrame:
    """Posting-list inverted index: (word, df, tf_total, postings).

    ``postings`` is the sorted array of distinct doc ids for terms whose
    document frequency is <= ``postings_cap``, else NULL (hot-term
    pruning — see module docstring). Deterministic: arrays are sorted,
    output ordered by word.
    """
    w = _word_stream(docs, id_col, text_col).localCheckpoint(eager=False)
    stats = w.groupBy("word").agg(
        F.countDistinct("doc").alias("df"), F.count("*").alias("tf_total")
    )
    small = stats.where(F.col("df") <= postings_cap).select("word")
    postings = (
        w.select("word", "doc")
        .distinct()
        .join(F.broadcast(small), "word")
        .groupBy("word")
        .agg(F.sort_array(F.collect_list("doc")).alias("postings"))
    )
    return (
        stats.join(postings, "word", "left")
        .select("word", "df", "tf_total", "postings")
        .orderBy("word")
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """BM25 top-``k`` docs for a bag-of-words query (exact-integer scoring
    per the module docstring). Returns (doc_id, n_terms, score_scaled),
    ordered by score desc with doc id as the deterministic tiebreak.
    """
    w = _word_stream(docs, id_col, text_col).localCheckpoint(eager=False)
    dl = w.groupBy("doc").agg(F.count("*").alias("dl"))
    corpus = dl.groupBy().agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    hits = w.where(F.col("word").isin(list(terms)))
    dfs = hits.groupBy("word").agg(F.countDistinct("doc").alias("term_df"))
    tfs = hits.groupBy("doc", "word").agg(F.count("*").alias("tf"))
    scored = (
        tfs.join(F.broadcast(dfs), "word")
        .join(dl, "doc")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf_bp",
            F.expr("(2*n_docs - 2*term_df + 1) * 10000 div (2*term_df + 1)"),
        )
        .withColumn(
            "tfn_bp",
            F.expr(
                "(220000 * tf * sum_dl)"
                " div (10*tf*sum_dl + 3*sum_dl + 9*dl*n_docs)"
            ),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum(F.col("idf_bp") * F.col("tfn_bp")).alias("score_scaled"),
        )
        .select(F.col("doc").alias(id_col), "n_terms", "score_scaled")
        .orderBy(F.desc("score_scaled"), F.asc(id_col))
        .limit(k)
    )


def anchor_topk(anchors: DataFrame, k: int = 3) -> DataFrame:
    """Per-target top-k anchor-term aggregation — the classic web-search
    relevance signal (anchor text describes the TARGET page better than its
    own body; Brin & Page 1998 §2.2 store anchors with the page they point
    TO, and every production engine since aggregates them per target).

    Input: (target, anchor) rows, one per link whose anchor term was
    extracted — in this repo's crawl that is the links sink joined to the
    link-context extractor; the reference stores the raw links table
    (storage/database.py link rows) without anchor rollup, so this is the
    downstream consumer built Spark-first.

    Output: (target, anchor, n, rank) — each target's ``k`` most frequent
    anchor terms, ties broken by anchor string ascending so the result is a
    pure function of the multiset (value-hashable cross-engine).

    Scale: one groupBy(target, anchor) count (map-side combinable — the
    anchor vocabulary per target is long-tailed but each (target, anchor)
    partial collapses locally) and one per-target window whose partitions
    are bounded by the target's DISTINCT anchor vocabulary, not its
    in-degree: a 10^8-in-link hub with 10^4 distinct anchor terms ranks
    10^4 rows. Hot targets therefore never funnel raw link volume through
    one task.
    """
    from pyspark.sql import Window

    counts = anchors.groupBy("target", "anchor").agg(F.count("*").alias("n"))
    w = Window.partitionBy("target").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def positional_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, word): the POSITIONAL posting stream — raw lowercase
    [a-z]+ tokens with their 1-based ordinal in the token stream (no
    stopword/length filter: phrase adjacency is adjacency in the original
    stream, so positions must be assigned before any vocabulary pruning).

    This is the index layout phrase and proximity queries need; the
    plain :func:`inverted_index` stores only (term -> doc) postings.
    """
    return docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("pos0", "word"),
    ).select("doc", (F.col("pos0") + 1).alias("pos"), "word")


def phrase_occurrences(postings: DataFrame, phrases: DataFrame) -> DataFrame:
    """Exact phrase-occurrence counts via POSTING-LIST INTERSECTION: for
    each trigram phrase (w1, w2, w3), join the w1 postings against the w2
    postings at pos+1 and the w3 postings at pos+2 — the positional-index
    evaluation every search engine runs for quoted queries, instead of
    re-scanning documents per phrase.

    Plan shape / scale: the posting stream is SEMI-JOINED down to the
    query vocabulary first (a broadcast of the tiny phrase word set), so
    only postings for words appearing in some phrase ever shuffle; the two
    adjacency joins are equality joins on (doc, pos), hash-partitioned on
    doc — the selective-phrase regime where intersection beats scanning by
    the corpus/postings ratio. Longer phrases chain one more (doc, pos+i)
    join per word, same shape.

    ``phrases``: (phrase_id, w1, w2, w3). Returns (phrase_id, doc,
    n_occur) with n_occur >= 1 (docs without the phrase produce no row).
    """
    vocab = (
        phrases.select(F.col("w1").alias("word"))
        .union(phrases.select("w2"))
        .union(phrases.select("w3"))
        .distinct()
    )
    p = postings.join(F.broadcast(vocab), "word")
    p1 = p.select(F.col("doc"), F.col("pos"), F.col("word").alias("w1"))
    p2 = p.select(F.col("doc"), (F.col("pos") - 1).alias("pos"), F.col("word").alias("w2"))
    p3 = p.select(F.col("doc"), (F.col("pos") - 2).alias("pos"), F.col("word").alias("w3"))
    triples = p1.join(p2, ["doc", "pos"]).join(p3, ["doc", "pos"])
    return (
        triples.join(F.broadcast(phrases), ["w1", "w2", "w3"])
        .groupBy("phrase_id", "doc")
        .agg(F.count("*").alias("n_occur"))
    )
