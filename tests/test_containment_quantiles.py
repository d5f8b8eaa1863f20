"""Containment dedup, bottom-k sample quantiles, trap admission — semantics pins.

The registry oracle test (test_queries_oracle) value-checks the three round-4
additions against DuckDB; these tests pin the CLAIMS the oracle comparison
cannot express: the containment prefix filter loses no pair vs the naive
all-pairs join, a token-prefix twin scores containment exactly 10000 while
Jaccard stays under the dedup bar, bottom-k samples obey the KMV-style merge
law, and the trap audit separates the planted trap host from the clean ones.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import containment_pairs, doc_shingles

TH_NUM, TH_DEN = 4, 5


def _naive_containment(spark, df, th_num=TH_NUM, th_den=TH_DEN):
    """Ground truth: ALL ordered pairs via the quadratic shared-shingle join."""
    sh = doc_shingles(df, "doc_id", "text", 3)
    sa = sh.select(F.col("doc").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc").alias("doc_b"), "sh")
    inter = (
        sa.join(sb, "sh")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    return {
        (r["doc_a"], r["doc_b"])
        for r in inter.join(
            sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"),
            "doc_a",
        )
        .where(F.col("inter") * th_den >= F.col("sz_a") * th_num)
        .collect()
    }


@pytest.fixture(scope="module")
def overlap_corpus(spark):
    """Docs built from a TINY vocabulary plus slice-of-another-doc docs, so
    organic containment pairs exist at many similarity levels (shared
    shingles are common) — the adversarial case for a prefix filter."""
    rng = random.Random(11)
    vocab = [chr(97 + i) * 3 for i in range(8)]
    rows = []
    for doc_id in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(8, 30))]
        rows.append((doc_id, " ".join(toks)))
    for doc_id in range(30, 45):  # contiguous slices of earlier docs
        base = rng.randrange(30)
        toks = rows[base][1].split()
        lo = rng.randrange(max(1, len(toks) - 5))
        rows.append((doc_id, " ".join(toks[lo : lo + rng.randint(4, 12)])))
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)


@pytest.mark.parametrize("th", [(1, 2), (4, 5)])
def test_containment_prefix_filter_no_false_negatives(spark, overlap_corpus, th):
    got = {
        (r["doc_a"], r["doc_b"])
        for r in containment_pairs(
            overlap_corpus, "doc_id", "text", 3, th[0], th[1]
        ).collect()
    }
    truth = _naive_containment(spark, overlap_corpus, th[0], th[1])
    assert truth, "fixture degenerate: no containment pairs to verify"
    assert got == truth


def test_containment_token_prefix_twin_scores_10000(spark):
    """A token-level prefix twin's shingles are a strict subset of its
    parent's, so containment(twin -> parent) must be EXACTLY 10000 basis
    points while Jaccard sits far below the 0.5 dedup bar — the asymmetric
    case the operator exists for."""
    rng = random.Random(3)

    def word(i):
        s = ""
        for _ in range(4):
            s += chr(97 + i % 26)
            i //= 26
        return "q" + s

    vocab = [word(i) for i in range(5_000)]
    rows, planted = [], []
    for base in range(50):
        toks = [rng.choice(vocab) for _ in range(80)]
        rows.append((base, " ".join(toks)))
        rows.append((base + 1_000, " ".join(toks[:24])))  # 30% prefix
        planted.append((base + 1_000, base))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    out = {
        (r["doc_a"], r["doc_b"]): (r["containment_bp"], r["jaccard_bp"])
        for r in containment_pairs(df, "doc_id", "text", 3, TH_NUM, TH_DEN).collect()
    }
    for pair in planted:
        assert pair in out, f"missed planted containment pair {pair}"
        cont, jac = out[pair]
        assert cont == 10000
        assert jac < 5000  # Jaccard dedup would never pair these


def test_bottomk_sample_merge_law(spark):
    """bottom-k of a union == bottom-k of the union of per-part bottom-k
    samples — the mergeability a 1000-executor cluster relies on."""
    from crawler_spark.operators.sketches import bottomk_sample

    a = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    b = spark.range(5_000, 11_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    import heapq

    k = 64
    whole = bottomk_sample(a.unionByName(b), "k", "v", k).collect()
    # the merge operation itself: k smallest hash ranks of the two part
    # samples' union (ranks carry over — merging never re-hashes)
    pa = bottomk_sample(a, "k", "v", k).collect()
    pb = bottomk_sample(b, "k", "v", k).collect()
    merged_rows = heapq.nsmallest(k, [(r["hk"], r["v"]) for r in pa + pb])
    assert sorted((r["hk"], r["v"]) for r in whole) == sorted(merged_rows)


def test_sample_quantiles_exact_when_sample_covers(spark):
    """With k >= n the sample IS the data, so the estimate must equal the
    exact nearest-rank quantile: q(p) = value at rank ceil(p*n/100)."""
    from crawler_spark.operators.sketches import sample_quantiles

    n = 100
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    got = {
        r["pct"]: r["est_v"]
        for r in sample_quantiles(df, "k", "v", (25, 50, 75, 90), k=256).collect()
    }
    assert got == {25: 25, 50: 50, 75: 75, 90: 90}


def test_trap_score_admits_clean_hosts_rejects_trap(spark):
    from crawler_spark.queries import REGISTRY

    rows = REGISTRY["trap_score"].fn(spark, "/root/testdata/sf0.001").collect()
    by_host = {r["host"]: r for r in rows}
    assert by_host["trap.test"]["admit"] == 0
    assert by_host["trap.test"]["unbounded_bp"] == 10000
    for h, r in by_host.items():
        if h != "trap.test":
            assert r["admit"] == 1, f"{h} wrongly rejected"


@pytest.mark.parametrize("seed,th", [
    (21, (1, 3)), (22, (2, 3)), (23, (4, 5)), (24, (9, 10)), (25, (1, 2)),
])
def test_containment_randomized_positional_boundaries(spark, seed, th):
    """Randomized equivalence vs the naive quadratic reference, stressing
    the in-join positional bounds at their boundaries: exact subset docs
    (containment == 1, minimal-common-shingle row must survive), tiny docs
    (prefix = whole set), hot shared-vocab shingles (the match blocks the
    b-side bound prunes), and mixed lengths."""
    rng = random.Random(seed)
    vocab = [chr(97 + i % 26) * 3 + chr(97 + (i // 26) % 26) for i in range(30)]
    rows, doc_id = [], 0
    for _ in range(35):
        ln = rng.choice([4, 5, 6, 10, 16, 24])
        toks = [rng.choice(vocab) for _ in range(ln)]
        rows.append((doc_id, " ".join(toks)))
        doc_id += 1
        draw = rng.random()
        if draw < 0.25:  # verbatim slice: containment(slice -> doc) == 1
            lo = rng.randrange(max(1, ln - 4))
            rows.append((doc_id, " ".join(toks[lo:lo + rng.randint(4, 10)])))
            doc_id += 1
        elif draw < 0.45:  # doc + noise: high-but-<1 containment
            rows.append((doc_id, " ".join(toks + [rng.choice(vocab) for _ in range(3)])))
            doc_id += 1
    corpus = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)

    got = {
        (r["doc_a"], r["doc_b"])
        for r in containment_pairs(
            corpus, "doc_id", "text", 3, th[0], th[1]
        ).collect()
    }
    want = _naive_containment(spark, corpus, th[0], th[1])
    assert got == want
    assert want, "fixture must plant qualifying containment pairs"
