"""Unit tests for the training-data operators (dedup / similarity /
multimodal) on hand-built fixtures with known answers — independent of the
DuckDB oracle, these pin the *semantics* (the oracle only pins engine parity).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),          # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),           # near dup of 1
        (4, "one two three four five six seven eight nine"),  # unrelated
        (5, "tiny"),                                          # < 3 tokens: no shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep[1] == 2  # docs 1 and 2 collapse
    assert by_keep[3] == 1 and by_keep[4] == 1 and by_keep[5] == 1
    assert 2 not in by_keep


def test_shingles_and_jaccard(docs):
    sh = dedup.doc_shingles(docs, "doc_id", "text", n=3)
    counts = {r["doc"]: r["n"] for r in sh.groupBy("doc").agg(F.count("*").alias("n")).collect()}
    assert counts[1] == 4  # 6 tokens -> 4 trigrams
    assert 5 not in counts  # no shingles for a 1-token doc

    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_pct"] for r in pairs}
    assert got[(1, 2)] == 100  # identical shingle sets
    # docs 1,3 share trigrams 'alpha beta gamma','beta gamma delta','gamma delta epsilon'
    # -> |inter|=3, |union|=5 -> 60%
    assert got[(1, 3)] == 60
    assert (1, 4) not in got


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = dedup.minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_pct"] for r in pairs}
    assert got[(1, 2)] == 100
    assert got[(2, 3)] == got.get((1, 3), got[(2, 3)])  # symmetry via doc 2 == doc 1


def test_simhash_identical_docs_equal(docs):
    sim = {r["doc"]: r["simhash"] for r in dedup.simhash(docs, "doc_id", "text").collect()}
    assert sim[1] == sim[2]
    assert sim[1] != sim[4]
    pairs = dedup.simhash_pairs(
        dedup.simhash(docs, "doc_id", "text"), max_hamming=3
    ).collect()
    ham = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert ham[(1, 2)] == 0


def test_cosine_topk_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # antipode of 0
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2, 3]


def test_ivf_assign_and_search(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),            # centroids (ids < 2)
        (2, [0.99, 0.05]), (3, [0.05, 0.99]), (4, [0.9, 0.1]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cells = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(emb, n_centroids=2).collect()}
    assert cells[2] == 0 and cells[4] == 0 and cells[3] == 1
    out = similarity.ivf_topk(emb, emb.where(F.col("vec_id") == 2), n_centroids=2, k=2).collect()
    assert {r["neighbor_id"] for r in out} <= {0, 4}  # same-cell members only


def test_media_decode_fake_matches_bytes(spark):
    df = spark.createDataFrame([(7, "hello world")], ["doc_id", "text"])
    media = multimodal.synth_media(df, "doc_id", "text")
    row = multimodal.decode_features(media, backend="fake").collect()[0]
    import hashlib

    digest = hashlib.md5(b"hello world").digest()
    assert row["width"] == digest[0]
    assert row["height"] == digest[1]
    assert row["mean_byte"] == round(sum(digest) / len(digest), 4)


def test_media_real_backend_is_marked_stub(spark):
    df = spark.createDataFrame([(7, "x")], ["doc_id", "text"])
    media = multimodal.synth_media(df, "doc_id", "text")
    with pytest.raises(NotImplementedError):
        multimodal.decode_features(media, backend="real")


def test_embedding_neardup_blocked_is_subset_of_exact(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)
    ] + [(100 + i, [x + rng.gauss(0, 0.01) for x in [1.0] * 8]) for i in range(5)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_neardup(emb, threshold=0.9).collect()
    }
    blocked = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_neardup(
            emb, threshold=0.9, cell_blocked=True, n_centroids=4
        ).collect()
    }
    # the planted clones (ids 100..104) are near-identical: exact finds all
    # 10 pairs, and blocking cannot invent pairs
    planted = {(a, b) for a in range(100, 105) for b in range(100, 105) if a < b}
    assert planted <= exact
    assert blocked <= exact
    assert planted <= blocked  # clones share a cell by construction


def test_top_per_key_equals_naive_window(spark):
    """Salted + threshold-pruned top_per_key is plan-level optimization only:
    equal to the naive window on randomized data with ties and varied budgets."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.operators.ordering import top_per_key

    rng = random.Random(5)
    rows = [
        (f"k{rng.randint(0, 6)}", rng.randint(0, 3), rng.randint(0, 5), f"id{i:04d}")
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["key", "prio", "depth", "ident"])
    order = [F.desc("prio"), F.asc("depth"), F.asc("ident")]
    budget = (F.length("key") * 0 + 7)  # constant budget 7, as a column
    got = top_per_key(
        df, key="key", order_exprs=order, limit_col=budget,
        salt_on="ident", salt_buckets=4, prune_col="prio", prune_max=7,
    )
    w = Window.partitionBy("key").orderBy(*order)
    want = (
        df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 7)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_media_resize_pools_4x4_to_2x2(spark, docs):
    """Fake resize: pooled pixel = floor-mean of its 2x2 block of the
    payload-as-4x4-image; verified against a driver-side recomputation."""
    import hashlib

    media = multimodal.synth_media(docs, "doc_id", "text")
    got = {r["doc"]: (r["p00"], r["p01"], r["p10"], r["p11"])
           for r in multimodal.resize_image(media).collect()}
    for doc_id, text in [(1, "alpha beta gamma delta epsilon zeta"), (5, "tiny")]:
        b = hashlib.md5(text.encode()).digest()
        expect = (
            (b[0] + b[1] + b[4] + b[5]) // 4,
            (b[2] + b[3] + b[6] + b[7]) // 4,
            (b[8] + b[9] + b[12] + b[13]) // 4,
            (b[10] + b[11] + b[14] + b[15]) // 4,
        )
        assert got[doc_id] == expect, doc_id
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.resize_image(media, backend="real")
    with pytest.raises(ValueError, match="geometry"):
        multimodal.resize_image(media, out_w=3, out_h=3)


def test_media_frame_sample_explodes_strided(spark, docs):
    """Fake frame sampling: 1-in/N-out mapInPandas — every 3rd byte, with
    the right indices and values."""
    import hashlib

    media = multimodal.synth_media(docs, "doc_id", "text")
    rows = multimodal.frame_sample(media, stride=3).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc"], []).append((r["frame_idx"], r["frame_val"]))
    assert set(by_doc) == {1, 2, 3, 4, 5}
    b = hashlib.md5(b"tiny").digest()
    assert sorted(by_doc[5]) == [(i, b[i]) for i in (0, 3, 6, 9, 12, 15)]
    with pytest.raises(NotImplementedError, match="PyAV"):
        multimodal.frame_sample(media, backend="real")


def test_lang_id_multi_classifies_planted_languages(spark):
    """Marker-coverage argmax picks the right language for short planted
    sentences in each class; marker-free text falls to 'other'."""
    from crawler_spark.operators.textstats import with_lang_id_multi

    rows = [
        (1, "the cat is in the house and they have not seen it"),
        (2, "der hund ist nicht mit der katze und das ist ein problem"),
        (3, "le chat est dans la maison et il est pour le moment sur le lit"),
        (4, "el perro es un animal y las casas son para los gatos del pueblo"),
        (5, "zxqv wkjh pqrs mnbv"),  # no markers anywhere -> other
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in with_lang_id_multi(df, "text").collect()
    }
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "other"}


def test_neardup_clusters_connected_components(spark):
    """Min-label propagation finds components: a 3-chain and a 2-pair plus
    a transitive bridge converge to min-id cluster labels."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        ["doc_a", "doc_b"],
    )
    got = {r["doc"]: r["cluster"] for r in dedup.neardup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_neardup_clusters_long_chain_converges(spark):
    """ADVICE r2: a 25-link chain (the transitive near-dup case) must still
    converge — pointer jumping makes rounds O(log L), so max_iter=6 covers
    L=25 where plain propagation would need ~25 rounds."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], ["doc_a", "doc_b"]
    )
    got = {r["doc"]: r["cluster"] for r in dedup.neardup_clusters(pairs, max_iter=6).collect()}
    assert got == {i: 0 for i in range(26)}


def test_neardup_clusters_raises_when_unconverged(spark):
    """ADVICE r2: unconverged labels must never be returned silently."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.neardup_clusters(pairs, max_iter=1)


def test_neardup_clusters_star_matches_propagation(spark):
    """Large-star/small-star contraction must assign the SAME labels as
    min-label propagation on every graph shape: chain + components + a
    hash-scrambled random graph (ids far from contiguous)."""
    fixtures = [
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        [(i, i + 1) for i in range(25)],
        [((i * 131) % 997, (i * 517 + 88) % 997) for i in range(150)],
    ]
    for edges in fixtures:
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges if a != b], ["doc_a", "doc_b"]
        )
        want = sorted(
            (r["doc"], r["cluster"]) for r in dedup.neardup_clusters(pairs).collect()
        )
        got = sorted(
            (r["doc"], r["cluster"])
            for r in dedup.neardup_clusters_star(pairs).collect()
        )
        assert got == want


def test_neardup_clusters_star_raises_when_unconverged(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.neardup_clusters_star(pairs, max_iter=1)


def test_training_keepset_statuses(spark):
    """Composed curation pipeline: each gate fires on its planted doc and
    the min-id representative of each duplicate group is kept."""
    from crawler_spark.operators.pipeline import training_keepset

    base = (
        "the quick brown fox jumps over the lazy dog and runs through the "
        "green field while the sun shines bright over the quiet hills today"
    )
    near = base.replace("quiet hills", "silent hills")
    non_en = (
        "zorka blimmt vexqua plonter grashwin toffel brunzel quampa "
        "dreffin solwak trivven moxpal underquelle bastofen wrimzel karpstein"
    )
    rows = [
        (1, base),          # kept: representative of both dup groups
        (2, base),          # exact_dup of 1
        (3, near),          # near_dup of 1 (one bigram changed)
        (4, "too short"),   # quality (< 100 chars)
        (5, non_en),        # lang: long, >= 10 tokens, but no en markers
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc"]: r["status"] for r in training_keepset(df).collect()}
    assert got == {1: "kept", 2: "exact_dup", 3: "near_dup", 4: "quality", 5: "lang"}


def test_split_assign_deterministic_hash(spark):
    """corpus_split contract: assignment is a pure function of hash60(id) —
    re-derivable by hand, stable across runs, covers all three splits."""
    import hashlib

    from crawler_spark.operators.pipeline import split_assign

    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    got = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id").collect()}

    def expect(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100
        return "train" if b < 98 else ("val" if b == 98 else "test")

    assert got == {i: expect(i) for i in range(500)}
    assert {"train", "val", "test"} <= set(got.values())
    # stability: a second evaluation is identical (no RNG anywhere)
    again = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id").collect()}
    assert again == got


def test_contamination_pairs_ngram_overlap(spark):
    """An 8-gram copied from a benchmark doc flags the pair once per shared
    distinct shingle; unrelated docs never appear; min_shared gates."""
    from crawler_spark.operators.pipeline import contamination_pairs

    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    corpus = spark.createDataFrame(
        [
            # copies a 12-token run -> 5 shared 8-grams
            (1, "xx yy " + bench_text + " zz"),
            # copies an 11-token run -> only 4 shared 8-grams (< min_shared)
            (2, "aa " + " ".join(bench_text.split()[:11]) + " bb"),
            (3, "one two three four five six seven eight nine ten eleven twelve"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, bench_text)], ["doc_id", "text"])
    got = {
        (r["doc"], r["bench_doc"]): r["n_shared"]
        for r in contamination_pairs(corpus, bench, min_shared=5).collect()
    }
    assert got == {(1, 100): 5}
    lowered = {
        (r["doc"], r["bench_doc"]): r["n_shared"]
        for r in contamination_pairs(corpus, bench, min_shared=4).collect()
    }
    assert lowered == {(1, 100): 5, (2, 100): 4}


def test_repetition_metrics_hand_computed(spark):
    """Ratios match hand counts; empty doc is 0/0/False; thresholds gate."""
    from crawler_spark.operators.textstats import repetition_metrics

    uniq20 = " ".join(f"w{chr(97 + i)}x" for i in range(20))  # 20 distinct tokens
    df = spark.createDataFrame(
        [(1, "a a a b c"), (2, uniq20), (3, "")], ["doc_id", "text"]
    )
    got = {r["doc"]: r for r in repetition_metrics(df).collect()}
    # doc 1: 5 tokens, max word 'a' x3 -> 0.6; bigram 'a a' x2 -> 2*2/5 = 0.8
    assert got[1]["n_tok"] == 5
    assert got[1]["max_word_ratio"] == 0.6
    assert got[1]["top_bigram_ratio"] == 0.8
    assert got[1]["is_repetitive"] is True
    # doc 2: all distinct -> 1/20 and 2/20, both under threshold
    assert got[2]["max_word_ratio"] == 0.05
    assert got[2]["top_bigram_ratio"] == 0.1
    assert got[2]["is_repetitive"] is False
    # doc 3: tokenizes empty
    assert got[3]["n_tok"] == 0
    assert got[3]["max_word_ratio"] == 0.0
    assert got[3]["is_repetitive"] is False


def test_redact_pii_order_and_counts(spark):
    """Email -> IP -> phone order: a 3-digit-octet IP is redacted as an IP,
    never double-counted by the phone pattern; counts are disjoint."""
    from crawler_spark.operators.textstats import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org server 100.200.300.1 call +44-201-55555 done"),
            (2, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc"]: r for r in redact_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 1, 1)
    assert got[1]["redacted"] == "mail <EMAIL> server <IP> call <PHONE> done"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 0, 0)
    assert got[2]["redacted"] == "no pii here at all"


def test_domain_cap_equals_window(spark):
    """The salted two-phase plan must equal the naive per-domain window."""
    from pyspark.sql import Window

    from crawler_spark.operators.pipeline import domain_cap

    rows = [
        (i, f"d{i % 7}", (i * 37) % 50 + 10)  # ties in n_chars across ids
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = {
        (r["doc_id"], r["rank"])
        for r in domain_cap(df, "source", "doc_id", "n_chars", cap=5).collect()
    }
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    want = {
        (r["doc_id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert got == want and len(got) == 35  # 7 domains x cap 5


def test_segment_dedup_drops_shared_boilerplate(spark):
    """A 10-token banner shared by two docs is dropped from BOTH; unique
    segments (including a short final partial) survive in position order;
    an all-boilerplate doc keeps a row with empty clean_text."""
    from crawler_spark.operators.dedup import segment_dedup

    bp = "subscribe to our newsletter for updates and offers today now"
    a_mid = " ".join(f"aa{chr(97 + i)}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"{bp} {a_mid} tail one two"),
            (2, f"{bp} " + " ".join(f"bb{chr(97 + i)}" for i in range(10))),
            (3, "completely unrelated words that stand alone just fine here"),
            (4, bp),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc"]: r for r in segment_dedup(df, seg_len=10).collect()}
    assert (got[1]["n_segments"], got[1]["n_dropped"]) == (3, 1)
    assert got[1]["clean_text"] == f"{a_mid} tail one two"
    assert (got[2]["n_segments"], got[2]["n_dropped"]) == (2, 1)
    assert got[3]["n_dropped"] == 0
    assert got[3]["clean_text"] == "completely unrelated words that stand alone just fine here"
    assert (got[4]["n_segments"], got[4]["n_dropped"]) == (1, 1)
    assert got[4]["clean_text"] == ""


def test_dup_span_removal_alignment_free(spark):
    """An 8-token run shared at DIFFERENT offsets is removed from both docs
    (the case segment_dedup's disjoint windows miss); unique docs and docs
    shorter than n are untouched; a doc made of the same run twice is fully
    removed (intra-doc duplication counts); empty text keeps an empty row."""
    from crawler_spark.operators.dedup import dup_span_removal

    run = "ra rb rc rd re rf rg rh"
    b = "ba bb bc bd be bf bg bh"
    df = spark.createDataFrame(
        [
            (1, f"xa xb {run} tailone"),
            (2, f"{run} other words here"),
            (3, "completely unique words that stand alone just fine here today"),
            (4, "short doc only"),
            (5, f"{b} {b}"),
            (6, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc"]: r for r in dup_span_removal(df, n=8).collect()}
    assert (got[1]["n_tokens"], got[1]["n_removed"]) == (11, 8)
    assert got[1]["clean_text"] == "xa xb tailone"
    assert (got[2]["n_removed"], got[2]["clean_text"]) == (8, "other words here")
    assert got[3]["n_removed"] == 0
    assert (got[4]["n_removed"], got[4]["clean_text"]) == (0, "short doc only")
    assert (got[5]["n_removed"], got[5]["clean_text"]) == (16, "")
    assert (got[6]["n_tokens"], got[6]["clean_text"]) == (0, "")


def test_incremental_lsh_keepset_decisions(spark):
    """A new doc duplicating an OLD doc is dropped with n_old_dups counted;
    of two identical NEW docs only the lower id survives (first-occurrence
    rule); unique new docs keep; old x old pairs are never reported."""
    from crawler_spark.operators.dedup import incremental_lsh_keepset

    a = "alpha beta gamma delta epsilon"
    d = "some brand new unique document text"
    old = spark.createDataFrame(
        [
            (0, a),
            (2, "completely different words here today"),
            (4, "unrelated text about nothing much"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, a), (3, d), (5, d), (7, "yet another standalone fresh page")],
        ["doc_id", "text"],
    )
    got = {
        r["doc"]: r
        for r in incremental_lsh_keepset(new, old, threshold=0.5).collect()
    }
    assert set(got) == {1, 3, 5, 7}
    assert (got[1]["n_old_dups"], got[1]["keep"]) == (1, False)
    assert (got[3]["n_old_dups"], got[3]["n_new_dups"], got[3]["keep"]) == (0, 0, True)
    assert (got[5]["n_new_dups"], got[5]["keep"]) == (1, False)
    assert got[7]["keep"]


def test_ngram_novelty_fractions(spark):
    """Half-overlapping doc scores 50, fully novel doc 100; docs too short
    to shingle are omitted; counts are exact integers."""
    from crawler_spark.operators.dedup import ngram_novelty

    ref = spark.createDataFrame([(0, "alpha beta gamma delta")], ["doc_id", "text"])
    mine = spark.createDataFrame(
        [
            (1, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota"),
            (5, "alpha beta"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc"]: r for r in ngram_novelty(mine, ref).collect()}
    assert set(got) == {1, 3}
    assert (got[1]["n_shingles"], got[1]["n_novel"], got[1]["novelty_pct"]) == (2, 1, 50)
    assert (got[3]["n_shingles"], got[3]["n_novel"], got[3]["novelty_pct"]) == (2, 2, 100)


def test_with_global_cumsum_equals_naive_window(spark):
    """The two-phase distributed prefix sum must equal the single-task
    global window on any input, including ties in the order key."""
    from pyspark.sql import Window

    from crawler_spark.operators.ordering import release_global_seq, with_global_cumsum

    rows = [(i, (i * 13) % 7, (i * 5) % 11 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "k", "v"]).repartition(8)
    order = [F.asc("k"), F.asc("id")]
    out = with_global_cumsum(df, order, "v", out_col="c")
    got = {r["id"]: r["c"] for r in out.collect()}
    release_global_seq(out)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
        ).collect()
    }
    assert got == want
    assert out._global_seq_total == sum(v for _, _, v in rows)


def test_corpus_mix_membership_is_pure_hash(spark):
    """Every keep/drop decision re-derivable by hand; rate 0 drops all,
    rate 1 keeps all; two runs identical."""
    import hashlib

    from crawler_spark.operators.pipeline import corpus_mix

    rows = [(i, f"s{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {"s0": 0.0, "s1": 0.3, "s3": 1.0}
    kept = {r["doc_id"] for r in corpus_mix(df, rates, "source", "doc_id", 0.5).collect()}

    def bucket(i, s):
        return int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16) % 10000

    want = {
        i for i, s in rows
        if bucket(i, s) < int({"s0": 0.0, "s1": 0.3, "s3": 1.0}.get(s, 0.5) * 10000)
    }
    assert kept == want
    assert not any(s == "s0" for i, s in rows if i in kept)
    assert all(i in kept for i, s in rows if s == "s3")
    again = {r["doc_id"] for r in corpus_mix(df, rates, "source", "doc_id", 0.5).collect()}
    assert again == kept


def test_corpus_shuffle_is_contiguous_permutation(spark):
    """seq is 0..n-1 exactly once, ordered by (hash60(id), id), stable."""
    import hashlib

    from crawler_spark.operators.pipeline import corpus_shuffle

    df = spark.createDataFrame([(i,) for i in range(257)], ["doc_id"]).repartition(8)
    got = {r["doc_id"]: r["seq"] for r in corpus_shuffle(df).collect()}
    assert sorted(got.values()) == list(range(257))

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    want_order = sorted(range(257), key=lambda i: (h(i), i))
    assert got == {doc: pos for pos, doc in enumerate(want_order)}


def test_pack_sequences_chunk_spans(spark):
    """Chunk spans follow the concatenated token stream exactly: spans are
    non-overlapping in order, cover every chunk, and straddle boundaries
    exactly when cum_before % budget + n_tok > budget."""
    from crawler_spark.operators.pipeline import pack_sequences

    rows = [(i, " ".join(f"t{j}x" for j in range((i * 7) % 13 + 1))) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        pack_sequences(df, budget=10).collect(), key=lambda r: r["cum_before"]
    )
    cum = 0
    for r in out:
        assert r["cum_before"] == cum
        assert r["start_chunk"] == cum // 10
        assert r["end_chunk"] == (cum + r["n_tok"] - 1) // 10
        cum += r["n_tok"]
    total_chunks = (cum + 9) // 10
    covered = set()
    for r in out:
        covered.update(range(r["start_chunk"], r["end_chunk"] + 1))
    assert covered == set(range(total_chunks))


def test_shard_assignment_balanced(spark):
    """Round-robin dealing over the size-sorted order: shard char totals
    must all land within one max-document of each other, and every doc is
    assigned exactly once."""
    from crawler_spark.queries import REGISTRY

    rows = REGISTRY["shard_assignment"].fn(spark, "/root/testdata/sf0.001").collect()
    assert sorted(r.shard for r in rows) == list(range(8))
    assert sum(r.n_docs for r in rows) == 500
    totals = [r.total_chars for r in rows]
    import duckdb

    max_doc = duckdb.sql(
        "SELECT max(n_chars) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert max(totals) - min(totals) <= max_doc


def test_temperature_rates_flatten_and_cap():
    """alpha=0.5 upweights small strata (keep-rate decreases with stratum
    size), alpha=1 degenerates to a uniform target_frac rate, and rates
    never exceed 10000 bp even when the formula over-allocates to a tiny
    stratum."""
    from crawler_spark.operators.pipeline import temperature_rates

    # mild skew + low target: no stratum hits the cap, so the pure
    # flattening order and the total-mass identity are both visible
    counts = {"big": 1_000_000, "mid": 100_000, "small": 10_000}
    bp = temperature_rates(counts, alpha=0.5, target_frac=0.1)
    assert bp["small"] > bp["mid"] > bp["big"]
    assert bp["small"] < 10000
    tot = sum(counts.values())
    expected = sum(counts[s] * bp[s] / 10000 for s in counts)
    assert abs(expected / tot - 0.1) < 0.01
    # heavy skew: tiny strata saturate at 100% keep (the cap), and the
    # capped mass is forfeited rather than redistributed
    bp_cap = temperature_rates({"big": 1_000_000, "tiny": 100}, 0.5, 0.5)
    assert bp_cap["tiny"] == 10000
    assert bp_cap["big"] < 5100
    # alpha=1: share == natural share, so every stratum keeps target_frac
    bp1 = temperature_rates(counts, alpha=1.0, target_frac=0.25)
    assert set(bp1.values()) == {2500}


def test_temperature_mix_membership_nested(spark):
    """Raising target_frac can only ADD documents (per-stratum thresholds
    are monotone in target_frac and membership is b < bp), and the kept set
    is deterministic across invocations."""
    from crawler_spark.operators.pipeline import temperature_mix

    rows = [(i, "src%d" % (i % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    keep_lo = {r.doc_id for r in temperature_mix(df, 0.5, 0.3).collect()}
    keep_hi = {r.doc_id for r in temperature_mix(df, 0.5, 0.7).collect()}
    keep_lo2 = {r.doc_id for r in temperature_mix(df, 0.5, 0.3).collect()}
    assert keep_lo == keep_lo2
    assert keep_lo <= keep_hi
    assert len(keep_lo) < len(keep_hi)


def test_span_interleaving_stats_hand_computed(spark):
    """[title,nav,text,text,media,text] -> 6 spans, 4 kinds, 4 text-bucket
    spans, 1 media, 4 adjacent-kind transitions, 166 permille media; a
    single-span doc has zero transitions."""
    from crawler_spark.operators.textstats import span_interleaving_stats

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    rows = [
        (
            "a",
            [
                ("title", "t", "", 0),
                ("nav", "n", "", 1),
                ("text", "x", "", 2),
                ("text", "y", "", 3),
                ("media", "", "http://h/i.png", 4),
                ("text", "z", "", 5),
            ],
        ),
        ("b", [("text", "solo", "", 0)]),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r["doc"]: r for r in span_interleaving_stats(df).collect()}
    a = got["a"]
    assert (
        a["n_spans"], a["n_kinds"], a["n_text"], a["n_media"],
        a["n_transitions"], a["media_permille"],
    ) == (6, 4, 4, 1, 4, 166)
    b = got["b"]
    assert (b["n_spans"], b["n_kinds"], b["n_transitions"], b["media_permille"]) == (
        1, 1, 0, 0,
    )


def test_source_gini_hand_computed(spark):
    """Strata of sizes (1, 3): G = (2*(1*1 + 2*3) - 3*4) / (2*4) = 0.25 ->
    2500 bp; perfectly even strata score 0."""
    from crawler_spark.operators.pipeline import source_gini

    skewed = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "b")], ["doc_id", "source"]
    )
    r = source_gini(skewed).collect()[0]
    assert (r["n_strata"], r["n_docs"], r["gini_bp"]) == (2, 4, 2500)
    even = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], ["doc_id", "source"]
    )
    assert source_gini(even).collect()[0]["gini_bp"] == 0


def test_gopher_rules_bullet_and_ellipsis_lines(spark, tmp_path):
    """Planted bullet-flood and ellipsis-flood docs fail exactly their
    Gopher rule; a clean 60-word doc passes every rule. (The sf corpus has
    no multi-line docs, so these paths only get coverage here.)"""
    from crawler_spark.queries import q_gopher_rules

    clean = " ".join(
        ["the", "be", "to", "of", "and"] * 2
        + [f"word{chr(97 + i % 26)}" for i in range(50)]
    )
    bullets = "\n".join(f"- item {i} in a list" for i in range(10))
    ellipses = "\n".join(f"truncated teaser number {i} ..." for i in range(10))
    df = spark.createDataFrame(
        [(1, clean), (2, bullets), (3, ellipses)], ["doc_id", "text"]
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc"]: r for r in q_gopher_rules(spark, str(tmp_path)).collect()}
    assert got[1]["keep"], got[1]
    assert not got[2]["bullet_ok"] and got[2]["ellipsis_ok"]
    assert not got[3]["ellipsis_ok"] and got[3]["bullet_ok"]


def test_exact_auc_perfect_separation(spark):
    from crawler_spark.operators.ordering import release_global_seq
    from crawler_spark.operators.pipeline import exact_auc

    rows = [(s, 0) for s in (1, 2, 3)] + [(s, 1) for s in (10, 20, 30)]
    out = exact_auc(spark.createDataFrame(rows, ["score", "label"]), "score", "label")
    r = out.collect()[0]
    release_global_seq(out)
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (3, 3, 1_000_000)


def test_exact_auc_all_tied_is_half(spark):
    from crawler_spark.operators.ordering import release_global_seq
    from crawler_spark.operators.pipeline import exact_auc

    rows = [(7, 0)] * 4 + [(7, 1)] * 4
    out = exact_auc(spark.createDataFrame(rows, ["score", "label"]), "score", "label")
    r = out.collect()[0]
    release_global_seq(out)
    assert r["auc_ppm"] == 500_000


def test_exact_auc_hand_computed_with_ties(spark):
    from crawler_spark.operators.ordering import release_global_seq
    from crawler_spark.operators.pipeline import exact_auc

    # scores/labels: (1,0) (2,1) (3,0) (3,1) (4,1)
    # pos-neg pairs: 2>1 win; 2<3 loss; 3>1 win; 3=3 tie (0.5); 4>1,4>3 wins
    # U = 4.5 of n_pos*n_neg = 6 -> AUC = 0.75 -> 750000 ppm
    rows = [(1, 0), (2, 1), (3, 0), (3, 1), (4, 1)]
    out = exact_auc(spark.createDataFrame(rows, ["score", "label"]), "score", "label")
    r = out.collect()[0]
    release_global_seq(out)
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (3, 2, 750_000)


def test_source_overlap_mirror_and_disjoint(spark):
    from crawler_spark.operators.dedup import source_overlap

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, text, "mirror_a"),
        (2, text, "mirror_b"),
        (3, "totally different words nothing shared here at all", "lone"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = source_overlap(df, "doc_id", "text", "source", n=3).collect()
    assert len(got) == 1  # only the mirror pair; 'lone' shares nothing
    r = got[0]
    assert (r["source_a"], r["source_b"]) == ("mirror_a", "mirror_b")
    assert r["containment_ppm"] == 1_000_000  # full mirror of the smaller side
    assert r["n_shared"] == 6  # 8 tokens -> 6 distinct 3-gram shingles


def test_source_overlap_group_cap_drops_boilerplate(spark):
    from crawler_spark.operators.dedup import source_overlap

    # the same boilerplate in 4 sources; cap 3 drops those shingles entirely
    rows = [(i, "one two three four five", f"s{i}") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    assert source_overlap(df, "doc_id", "text", "source", n=3, group_cap=3).count() == 0
    assert source_overlap(df, "doc_id", "text", "source", n=3, group_cap=4).count() == 6


def test_cluster_representatives_keep_best(spark):
    from crawler_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame([(1, 1), (2, 1), (3, 3)], ["doc", "cluster"])
    quality = spark.createDataFrame([(1, 5), (2, 9), (3, 7)], ["doc", "quality"])
    got = {
        r["cluster"]: (r["kept_doc"], r["n_members"], r["quality"])
        for r in cluster_representatives(clusters, quality).collect()
    }
    assert got == {1: (2, 2, 9), 3: (3, 1, 7)}


def test_cluster_representatives_tie_breaks_to_min_doc(spark):
    from crawler_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame([(4, 0), (9, 0)], ["doc", "cluster"])
    quality = spark.createDataFrame([(4, 7), (9, 7)], ["doc", "quality"])
    [r] = cluster_representatives(clusters, quality).collect()
    assert (r["cluster"], r["kept_doc"], r["n_members"]) == (0, 4, 2)


def test_dhash_pairs_planted(spark):
    # base: strictly ascending pixels -> every gradient sign 0 -> dh = 0
    # near: last adjacent pair swapped -> exactly bit 14 set -> hamming 1
    # far: descending pixels -> all 15 bits set -> beyond max_hamming=2
    base = bytes(range(16))
    near = bytes(list(range(14)) + [15, 14])
    far = bytes(reversed(range(16)))
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(near)), (3, bytearray(far))],
        "doc long, payload binary",
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal.dhash_pairs(df, max_hamming=2).collect()
    }
    assert got == {(1, 2): 1}


def test_dhash_real_backend_is_marked_stub(spark):
    df = spark.createDataFrame([(1, bytearray(range(16)))], "doc long, payload binary")
    with pytest.raises(NotImplementedError):
        multimodal.dhash_bits(df, backend="real")


def test_caption_pairs_nearest_and_tiebreak(spark):
    rows = [
        (1, [("text", "far", None, 0), ("main", "near", None, 8),
             ("media", None, "img://a", 10),
             ("text", "eq-before", None, 15),
             ("media", None, "img://b", 20),
             ("text", "eq-after", None, 25)]),
        (2, [("media", None, "img://c", 5)]),  # no text span: no pair
    ]
    schema = (
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    got = {
        (r.doc, r.media_pos): (r.media_ref, r.caption, r.distance)
        for r in multimodal.caption_pairs(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    # img://a: 'near' at dist 2 beats 'far' (10) and 'eq-before' (5);
    # img://b: dist-5 tie between eq-before (15) and eq-after (25) ->
    # the PRECEDING span wins
    assert got == {
        (1, 0): ("img://a", "near", 2),
        (1, 1): ("img://b", "eq-before", 5),
    }


def test_temperature_mix_null_stratum_dropped_not_crash(spark):
    from crawler_spark.operators.pipeline import temperature_mix

    rows = [(i, "a" if i % 2 == 0 else None) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mix(df, alpha=0.5, target_frac=1.0).collect()
    # NULL-stratum rows are dropped (no rate, NULL hash key); the real
    # stratum survives with its full target_frac=1.0 rate
    assert all(r["source"] == "a" for r in out)
    assert len(out) == 20
