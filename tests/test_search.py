"""Search-side operators: inverted index, BM25, prefix-filter similarity
join, and deterministic stratified sampling.

The oracle registry pins cross-engine value equality; these tests pin the
*contracts* that make the operators correct at scale:

- prefix filtering is EXACT — identical pair set to the naive all-pairs
  Jaccard join (no false negatives, no false positives);
- hot-term posting pruning nulls exactly the over-cap terms and keeps
  df == |postings| for the rest;
- BM25 scores only docs matching >=1 query term, and a doc with strictly
  more hits of every query term outranks its strict subset twin;
- the stratified sample is invariant under repartitioning (the property
  Bernoulli df.sample() lacks) and equals the plain-window definition.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    """120 docs over a moderate vocab so some shingles collide across
    unrelated docs (exercising the prefix filter's pruning) plus 12
    planted >=0.5-Jaccard pairs."""
    rng = random.Random(13)

    def word(i: int) -> str:
        s = ""
        for _ in range(3):
            s += chr(97 + i % 26)
            i //= 26
        return "q" + s

    vocab = [word(i) for i in range(300)]
    rows = []
    doc_id = 0
    for base in range(60):
        toks = [rng.choice(vocab) for _ in range(30)]
        rows.append((doc_id, " ".join(toks)))
        if base % 5 == 0:  # near-dup: swap 2 of 30 tokens
            dup = list(toks)
            for pos in rng.sample(range(30), 2):
                dup[pos] = rng.choice(vocab)
            rows.append((doc_id + 1, " ".join(dup)))
            doc_id += 2
        else:
            doc_id += 1
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)


def _naive_jaccard_pairs(spark, corpus, n, th_num, th_den):
    from crawler_spark.operators.dedup import doc_shingles

    sets = {}
    for r in doc_shingles(corpus, "doc_id", "text", n).collect():
        sets.setdefault(r["doc"], set()).add(r["sh"])
    out = set()
    docs = sorted(sets)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * th_den >= union * th_num:
                out.add((a, b, inter, union))
    return out


def test_prefix_jaccard_exact_vs_all_pairs(spark, corpus):
    from crawler_spark.operators.dedup import prefix_jaccard_pairs

    got = {
        (r["doc_a"], r["doc_b"], r["inter"], r["sz_union"])
        for r in prefix_jaccard_pairs(
            corpus, "doc_id", "text", n=3, th_num=1, th_den=2
        ).collect()
    }
    want = _naive_jaccard_pairs(spark, corpus, 3, 1, 2)
    assert got == want
    assert len(want) >= 10  # the planted pairs actually exercise the join


def test_prefix_jaccard_tighter_threshold_is_subset(spark, corpus):
    from crawler_spark.operators.dedup import prefix_jaccard_pairs

    loose = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_jaccard_pairs(
            corpus, "doc_id", "text", n=3, th_num=1, th_den=2
        ).collect()
    }
    tight = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_jaccard_pairs(
            corpus, "doc_id", "text", n=3, th_num=4, th_den=5
        ).collect()
    }
    assert tight <= loose


def test_inverted_index_cap_and_counts(spark, corpus):
    from crawler_spark.operators.search import inverted_index

    rows = inverted_index(corpus, postings_cap=8).collect()
    assert rows  # non-trivial vocabulary
    seen_null = seen_list = False
    for r in rows:
        if r["df"] > 8:
            assert r["postings"] is None
            seen_null = True
        else:
            assert r["postings"] is not None
            assert len(r["postings"]) == r["df"]
            assert r["postings"] == sorted(set(r["postings"]))
            assert r["tf_total"] >= r["df"]
            seen_list = True
    assert seen_null and seen_list  # cap actually separates the vocab


def test_bm25_matches_only_and_dominance(spark):
    from crawler_spark.operators.search import bm25_topk

    rows = [
        (0, "alpha beta gamma delta"),          # 1 hit of each term
        (1, "alpha alpha beta beta gamma"),     # strictly more hits, same dl+1
        (2, "gamma delta epsilon zeta eta"),    # no query terms
        (3, "alpha zeta zeta zeta zeta zeta"),  # one term, long doc
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bm25_topk(docs, ["alpha", "beta"], k=10).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert 2 not in by_id  # unmatched docs are never scored
    assert set(by_id) == {0, 1, 3}
    # doc 1 has tf >= doc 0 on every query term with near-equal length:
    assert by_id[1]["score_scaled"] > by_id[0]["score_scaled"]
    assert by_id[0]["n_terms"] == 2 and by_id[3]["n_terms"] == 1


def test_stratified_sample_matches_window_and_is_layout_invariant(spark):
    from crawler_spark.functions.hashing import hash60
    from crawler_spark.operators.pipeline import stratified_sample

    rng = random.Random(5)
    rows = [
        (f"d{i:04d}", rng.choice(["en", "de", "fr"]), rng.choice(["a", "b"]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])

    def key(out):
        return {(r["doc_id"], r["rank"]) for r in out.collect()}

    got = key(stratified_sample(df, ["lang", "source"], "doc_id", k=5))
    # plain-window definition
    w = Window.partitionBy("lang", "source").orderBy(
        hash60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = key(
        df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 5)
    )
    assert got == want
    assert len(got) == 3 * 2 * 5
    # layout invariance: same sample from 1 partition and from 16
    assert key(
        stratified_sample(df.coalesce(1), ["lang", "source"], "doc_id", k=5)
    ) == got
    assert key(
        stratified_sample(df.repartition(16), ["lang", "source"], "doc_id", k=5)
    ) == got


def test_anchor_topk_counts_and_ties(spark):
    from crawler_spark.operators.search import anchor_topk

    rows = (
        [(1, "b")] * 2 + [(1, "a")] * 2 + [(1, "c")]
        + [(2, "z")] * 3
    )
    df = spark.createDataFrame(rows, ["target", "anchor"])
    got = {
        (r["target"], r["rank"]): (r["anchor"], r["n"])
        for r in anchor_topk(df, k=2).collect()
    }
    # target 1: a and b tie at 2 -> 'a' wins rank 1 (anchor asc); c cut by k=2
    assert got == {
        (1, 1): ("a", 2),
        (1, 2): ("b", 2),
        (2, 1): ("z", 3),
    }


@pytest.mark.parametrize("seed,th_num,th_den", [
    (1, 4, 5), (2, 2, 3), (3, 1, 3), (4, 1, 2), (5, 9, 10),
])
def test_prefix_jaccard_randomized_thresholds(spark, seed, th_num, th_den):
    """Randomized equivalence vs the naive all-pairs reference across the
    threshold range, stressing the in-join size + PPJoin positional filter
    boundaries: tiny docs (prefix = whole set), exact duplicates (ubound
    exactly meets the bar), heavy shared-vocab docs (hot-shingle match
    blocks), and mixed lengths (size-filter boundary)."""
    rng = random.Random(seed)

    def word(i: int) -> str:
        s = ""
        for _ in range(3):
            s += chr(97 + i % 26)
            i //= 26
        return "r" + s

    vocab = [word(i) for i in range(40)]  # tiny vocab: many collisions
    rows, doc_id = [], 0
    for _ in range(40):
        ln = rng.choice([3, 4, 5, 8, 12, 20, 30])  # mixed lengths
        toks = [rng.choice(vocab) for _ in range(ln)]
        rows.append((doc_id, " ".join(toks)))
        doc_id += 1
        draw = rng.random()
        if draw < 0.2:  # exact duplicate: jaccard == 1, boundary ubound
            rows.append((doc_id, " ".join(toks)))
            doc_id += 1
        elif draw < 0.4:  # near-dup at a random edit distance
            dup = list(toks)
            for pos in rng.sample(range(ln), max(1, ln // 6)):
                dup[pos] = rng.choice(vocab)
            rows.append((doc_id, " ".join(dup)))
            doc_id += 1
    corpus = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)

    from crawler_spark.operators.dedup import prefix_jaccard_pairs

    got = {
        (r["doc_a"], r["doc_b"], r["inter"], r["sz_union"])
        for r in prefix_jaccard_pairs(
            corpus, "doc_id", "text", n=2, th_num=th_num, th_den=th_den
        ).collect()
    }
    want = _naive_jaccard_pairs(spark, corpus, 2, th_num, th_den)
    assert got == want
    assert want, "fixture must actually plant qualifying pairs"
