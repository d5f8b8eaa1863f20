"""Planted-near-dup recall for MinHash+LSH at moderate scale.

The tiny fixtures in test_training_ops pin exact semantics; this test checks
the LSH *probabilistic* contract on a corpus large enough for false bands to
matter: 2,000 base docs over a large vocabulary (so unrelated docs share no
shingles) plus planted near-duplicates at known Jaccard, which the banding
(K=8, 4 bands x 2 rows) must recover with high probability — for J ~ 0.9 the
single-band hit rate is 1-(1-J^2)^4 ~ 0.9987.
"""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(7)

    def word(i: int) -> str:  # alpha-only: the tokenizer is [a-z]+
        s = ""
        for _ in range(4):
            s += chr(97 + i % 26)
            i //= 26
        return "z" + s

    vocab = [word(i) for i in range(20_000)]
    rows, pairs = [], []
    doc_id = 0
    for base in range(2_000):
        toks = [rng.choice(vocab) for _ in range(60)]
        rows.append((doc_id, " ".join(toks)))
        if base % 10 == 0:  # plant a near-dup: replace 2 of 60 tokens
            dup = list(toks)
            for pos in rng.sample(range(60), 2):
                dup[pos] = rng.choice(vocab)
            rows.append((doc_id + 1, " ".join(dup)))
            pairs.append((doc_id, doc_id + 1))
            doc_id += 2
        else:
            doc_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    return df, pairs


def test_minhash_lsh_recall_and_precision(spark, planted):
    from crawler_spark.operators.dedup import minhash_lsh_dedup

    df, pairs = planted
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_dedup(df, "doc_id", "text", threshold=0.5).collect()
    }
    planted_set = set(pairs)
    recall = len(got & planted_set) / len(planted_set)
    assert recall >= 0.95, f"recall {recall}: {len(got & planted_set)}/{len(planted_set)}"
    # the Jaccard verify stage kills banding false positives: nothing
    # unplanted survives on a disjoint-vocabulary corpus
    assert got <= planted_set, f"unexpected pairs: {list(got - planted_set)[:5]}"


def test_simhash_separates_planted_dups(spark, planted):
    from crawler_spark.operators.dedup import simhash

    df, pairs = planted
    sim = {r["doc"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}
    ham = lambda a, b: bin(sim[a] ^ sim[b]).count("1")
    planted_h = [ham(a, b) for a, b in pairs[:50]]
    rng = random.Random(3)
    ids = sorted(sim)
    random_h = [ham(*rng.sample(ids, 2)) for _ in range(50)]
    # 2-token edits move few bits; random pairs should sit near 16/32
    assert sum(planted_h) / len(planted_h) < sum(random_h) / len(random_h) - 4

def test_minhash_k16_recall_at_least_k8(spark, planted):
    """The k/band_size knobs work: K=16 (8 bands x 2) is the production-ish
    setting; banding with more bands can only ADD candidates at fixed r, so
    recall must be >= the K=8 run on the same fixture and precision still
    holds (the Jaccard verify stage is knob-independent)."""
    from crawler_spark.operators.dedup import minhash_lsh_dedup

    df, pairs = planted
    got8 = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_dedup(df, "doc_id", "text", threshold=0.5).collect()
    }
    got16 = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_dedup(
            df, "doc_id", "text", threshold=0.5, k=16, band_size=2
        ).collect()
    }
    planted_set = set(pairs)
    assert len(got16 & planted_set) >= len(got8 & planted_set)
    assert got16 - planted_set == set()  # verify stage still exact
    recall16 = len(got16 & planted_set) / len(planted_set)
    assert recall16 >= 0.97, recall16


def test_srp_neardup_recovers_planted_high_sim_pairs(spark):
    """Hyperplane-LSH: planted near-identical vectors (cosine ~0.99) land in
    the same band with high probability (P[bit]=1-theta/pi ~0.97, so one
    4-bit band hits ~0.88 and any-of-4 ~0.9998); unrelated random vectors
    that collide in a band are killed by the exact-cosine verify stage."""
    import random

    from crawler_spark.operators.similarity import srp_neardup

    rng = random.Random(13)
    rows, planted = [], []
    vid = 0
    for base in range(200):
        v = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((vid, v))
        if base % 10 == 0:
            dup = [x + rng.gauss(0, 0.02) for x in v]  # tiny perturbation
            rows.append((vid + 1, dup))
            planted.append((vid, vid + 1))
            vid += 2
        else:
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["vec_a"], r["vec_b"])
        for r in srp_neardup(df, threshold=0.9).collect()
    }
    planted_set = set(planted)
    recall = len(got & planted_set) / len(planted_set)
    assert recall >= 0.9, recall
    # verify stage exact: random 64-d gaussians essentially never reach
    # cosine 0.9, so nothing unplanted survives the verify join
    assert got - planted_set == set()


def test_winnow_guarantee_shared_substring(spark):
    """Winnowing theorem: documents sharing any substring of length
    >= w + k - 1 (= 23 chars at the defaults) share >= 1 fingerprint."""
    import random

    from pyspark.sql import functions as F

    from crawler_spark.operators.dedup import winnow_fingerprints, winnow_pairs

    rng = random.Random(11)

    def blob(n):
        return "".join(chr(97 + rng.randrange(26)) for _ in range(n))

    shared = blob(40)  # > 23-char common span
    rows = [(i, blob(150) + shared + blob(150)) for i in range(10)]
    rows += [(100 + i, blob(400)) for i in range(10)]  # unrelated noise
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    fps = winnow_fingerprints(df, "doc_id", "text")
    carriers = (
        fps.groupBy("fp").agg(F.collect_set("doc").alias("docs"))
        .where(F.size("docs") >= 10)
        .count()
    )
    assert carriers >= 1  # some fingerprint is common to all 10 planted docs

    pairs = winnow_pairs(df, "doc_id", "text", df_cap=50, min_shared=1)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    for a in range(10):
        for b in range(a + 1, 10):
            assert (a, b) in got, (a, b)


def test_winnow_short_doc_has_no_fingerprints(spark):
    from crawler_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(1, "tiny text")], ["doc_id", "text"])
    assert winnow_fingerprints(df, "doc_id", "text").count() == 0
