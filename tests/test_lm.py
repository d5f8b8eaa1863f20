"""Unigram surprisal scorer — integer-bit spec checks on a hand corpus."""

from pyspark.sql import functions as F

from crawler_spark.operators.lm import surprisal


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_surprisal_hand_computed(spark):
    # corpus: "the" x6, "rare" x1, "word" x2  -> T=9, ilog2(T)=3
    # ilog2: the -> 2, word -> 1, rare -> 0
    docs = _df(
        spark,
        [
            (1, "the the the word"),  # n=4 s=2+2+2+1=7 total=4*3-7=5
            (2, "the the the rare"),  # n=4 s=6   total=12-6=6
            (3, "word"),              # n=1 s=1   total=3-1=2
        ],
    )
    got = {r["doc_id"]: r for r in surprisal(docs).collect()}
    assert got[1]["total_bits"] == 5 and got[1]["avg_centibits"] == 125
    assert got[2]["total_bits"] == 6 and got[2]["avg_centibits"] == 150
    assert got[3]["total_bits"] == 2 and got[3]["avg_centibits"] == 200


def test_rare_heavy_doc_scores_higher(spark):
    common = " ".join(["alpha"] * 50)
    rare = "zeta yotta qoph vex jinx"
    docs = _df(spark, [(1, common), (2, common), (3, rare)])
    got = {r["doc_id"]: r["avg_centibits"] for r in surprisal(docs).collect()}
    assert got[3] > got[1] == got[2]


def test_tokenless_docs_omitted(spark):
    docs = _df(spark, [(1, "hello world"), (2, "1234 !!!"), (3, None)])
    got = surprisal(docs.where(F.col("text").isNotNull() | F.lit(True))).collect()
    assert {r["doc_id"] for r in got} == {1}


def test_hash_embed_feeds_embedding_operators(spark):
    """The hashing-trick vectors must plug straight into the embedding
    stack: cast to float, run the integer k-means, every tokenful doc gets
    a cluster and the clustering is non-degenerate."""
    from crawler_spark.operators.clustering import kmeans
    from crawler_spark.operators.lm import hash_embed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = hash_embed(docs, dim=16).select(
        "doc_id",
        F.transform("embedding", lambda x: x.cast("float")).alias("embedding"),
    )
    n = emb.count()
    assert n == docs.count()  # every sf0.001 doc has >= 1 token
    fit = kmeans(emb, k=4, n_iter=2, id_col="doc_id")
    rows = fit.collect()
    assert len(rows) == n
    assert len({r["cluster"] for r in rows}) > 1


def test_hash_embed_shape_and_sign(spark):
    from crawler_spark.operators.lm import hash_embed

    docs = _df(spark, [(1, "alpha alpha beta"), (2, "alpha")])
    got = {r["doc_id"]: r["embedding"] for r in hash_embed(docs, dim=8).collect()}
    assert all(len(v) == 8 for v in got.values())
    # linearity: doc1 = 2*doc2 + beta, so a1 - 2*a2 must be exactly the
    # signed unit vector of beta (holds even if alpha and beta collide on a
    # dimension)
    import numpy as np

    a1, a2 = np.array(got[1]), np.array(got[2])
    assert np.abs(a2).sum() == 1  # single occurrence of alpha
    assert np.abs(a1 - 2 * a2).sum() == 1  # exactly beta remains


def test_bpe_merges_known_vocab(spark):
    # classic BPE toy: {'hug':10,'pug':5,'pun':12,'bun':4,'hugs':5}
    # pair counts r1: 'u g' 10+5+5=20 ... 'u n' 12+4=16 -> merge 'u g'
    from crawler_spark.operators.lm import bpe_merges

    vocab = spark.createDataFrame(
        [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)],
        "word string, freq long",
    )
    got = [(r.rank, r.pair, r.pair_count) for r in
           sorted(bpe_merges(vocab, n_merges=3).collect())]
    assert got[0] == (1, "u g", 20)
    # after merging 'ug': pairs 'h ug' 15, 'p ug' 5, 'ug s' 5, 'u n' 16,
    # 'p u' 12, 'b u' 4 -> round 2 merges 'u n' (16)
    assert got[1] == (2, "u n", 16)
    # then 'h ug' (15)
    assert got[2] == (3, "h ug", 15)


def test_bpe_greedy_adjacent_overlap(spark):
    # 'aaa' must fuse left-to-right: one 'aa a' occurrence, not two.
    from crawler_spark.operators.lm import bpe_merges

    vocab = spark.createDataFrame([("aaa", 7)], "word string, freq long")
    got = [(r.rank, r.pair, r.pair_count) for r in
           sorted(bpe_merges(vocab, n_merges=2).collect())]
    assert got[0] == (1, "a a", 14)      # two 'a a' pairs weighted 7
    assert got[1] == (2, "aa a", 7)      # post-merge sequence is 'aa a'


def test_bpe_compression_matches_manual(spark):
    # 'abab' x 3: merges 'a b' then 'ab ab'; 12 chars -> 3 symbols.
    from crawler_spark.operators.lm import bpe_compression

    vocab = spark.createDataFrame([("abab", 3)], "word string, freq long")
    row = bpe_compression(vocab, n_merges=2).collect()[0]
    assert (row.n_merges, row.tokens_before, row.tokens_after, row.saved) == (2, 12, 3, 9)


def _bpe_reference(vocab: dict[str, int], n_merges: int):
    """Pure-python greedy BPE trainer (Sennrich et al. 2016 reference
    algorithm) used as the property-test oracle for operators/lm._bpe_run."""
    seqs = {tuple(w): f for w, f in vocab.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in seqs.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # max count, ties by lexicographic pair — the engine's tiebreak
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((" ".join(pair), counts[pair]))
        fused = "".join(pair)
        new = {}
        for sym, f in seqs.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        seqs = new
    return merges


def test_bpe_matches_reference_on_random_vocabs(spark):
    """Property: the dataflow BPE trainer equals the classic in-memory
    greedy algorithm — merges AND weighted pair counts — on adversarial
    little vocabularies (repeats, overlaps, back-to-back pairs)."""
    import random

    from crawler_spark.operators.lm import bpe_merges

    rng = random.Random(7)
    for trial in range(4):
        words = {
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 6))): rng.randint(1, 9)
            for _ in range(rng.randint(2, 8))
        }
        want = _bpe_reference(words, 4)
        vocab = spark.createDataFrame(list(words.items()), "word string, freq long")
        got = [
            (r.pair, r.pair_count)
            for r in sorted(bpe_merges(vocab, n_merges=4).collect())
        ]
        assert got == want, (trial, words, got, want)


def test_bpe_survives_full_merge(spark):
    # 'ab' fully merges in round 1; later rounds have no pairs left — the
    # rewrite must keep sequences intact (not silently empty the table)
    # and compression totals must stay non-NULL.
    from crawler_spark.operators.lm import bpe_compression, bpe_merges

    vocab = spark.createDataFrame([("ab", 3)], "word string, freq long")
    merges = sorted(bpe_merges(vocab, n_merges=3).collect())
    assert [(r.rank, r.pair, r.pair_count) for r in merges] == [(1, "a b", 3)]
    row = bpe_compression(vocab, n_merges=3).collect()[0]
    assert (row.tokens_before, row.tokens_after, row.saved) == (6, 3, 3)


def test_dsir_prefers_target_like_docs(spark):
    # Target docs speak "alpha beta"; source docs speak "gamma delta".
    # A candidate written in target language must outscore one written in
    # source language, and per-feature bits must follow the add-1 floor-log2
    # spec exactly.
    from crawler_spark.operators.lm import dsir_logratio

    rows = [
        (1, "alpha beta alpha beta alpha beta", True),
        (2, "alpha beta alpha beta", True),
        (3, "gamma delta gamma delta gamma delta", False),
        (4, "gamma delta gamma delta", False),
        (5, "alpha beta alpha", False),   # candidate: target-like
        (6, "gamma delta gamma", False),  # candidate: source-like
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r["doc_id"]: r["logratio_bits"]
        for r in dsir_logratio(docs, F.col("tgt"), buckets=4096).collect()
    }
    assert got[5] > got[6]
    assert got[1] > got[3]


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    from crawler_spark.operators.lm import dsir_logratio

    docs = spark.createDataFrame(
        [(1, "a b c", True), (2, "x", False), (3, "!!!", False)],
        "doc_id long, text string, tgt boolean",
    )
    got = {r["doc_id"]: r["n_feats"] for r in dsir_logratio(docs, F.col("tgt")).collect()}
    # doc 1: 3 unigrams + 2 bigrams; doc 2: 1 unigram; doc 3: omitted
    assert got == {1: 5, 2: 1}


def test_surprisal_bigram_stupid_backoff_hand_computed(spark):
    """Hand-derived Stupid-Backoff scores: train counts the=3 cat=2 others=1
    (N=9, ilog2=3), bigram (the,cat)=2 others=1. Scoring 'the cat sat on
    zzz': first 'the' = 3-1=2 bits; (the,cat) seen = ilog2(3)-ilog2(2) = 0;
    (cat,sat) = ilog2(2)-0 = 1; (sat,on) = 0-0 = 0; (on,zzz) unseen bigram,
    OOV word -> 3 - 0 + 2 = 5 backoff bits. Single-token doc scores as one
    unigram."""
    from crawler_spark.operators.lm import surprisal_bigram

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (2, "the cat ran")], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [(1, "the cat sat on zzz"), (3, "mat")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in surprisal_bigram(score, train).collect()}
    r1 = got[1]
    assert (r1["n_tokens"], r1["n_backoffs"], r1["total_bits"], r1["avg_centibits"]) == (
        5, 1, 8, 160,
    )
    r3 = got[3]
    assert (r3["n_tokens"], r3["n_backoffs"], r3["total_bits"], r3["avg_centibits"]) == (
        1, 0, 3, 300,
    )


def test_bpe_encode_hand_computed(spark):
    """vocab {aaab:2, cd:1}, 2 merges: round 1 fuses 'a a' (count 4, greedy
    left-to-right so 'a a a b' -> 'aa a b'), round 2 ties ('aa a' vs 'a b'
    both 2) and picks 'a b' lexicographically -> final sequences
    aaab = [aa, ab], cd = [c, d]. Per-doc symbol counts follow."""
    from crawler_spark.operators.lm import bpe_encode

    words = spark.createDataFrame(
        [(1, "aaab"), (1, "aaab"), (1, "cd"), (2, "aaab")], ["doc_id", "word"]
    )
    got = {r["doc_id"]: r for r in bpe_encode(words, n_merges=2).collect()}
    assert (got[1]["n_words"], got[1]["n_symbols"], got[1]["fertility_centitokens"]) == (
        3, 6, 200,
    )
    assert (got[2]["n_words"], got[2]["n_symbols"]) == (1, 2)


def test_zipf_slope_hand_computed(spark):
    """Counts a:8 b:2 c:1 d:1 -> ranks 1..4, x = ilog2(rank) = [0,1,1,2],
    y = ilog2(c) = [3,1,0,0]; exact LSQ slope = -12/8 -> neg_slope_milli
    1500. A single-word vocab has zero x-variance -> NULL slope."""
    from crawler_spark.operators.lm import zipf_slope

    rows = [(1, "a")] * 8 + [(1, "b")] * 2 + [(2, "c"), (2, "d")]
    words = spark.createDataFrame(rows, ["doc_id", "word"])
    r = zipf_slope(words).collect()[0]
    assert (r["n_vocab"], r["neg_slope_milli"]) == (4, 1500)
    one = spark.createDataFrame([(1, "solo"), (2, "solo")], ["doc_id", "word"])
    r1 = zipf_slope(one).collect()[0]
    assert (r1["n_vocab"], r1["neg_slope_milli"]) == (1, None)


def test_vocab_coverage_ppm_exact(spark):
    from crawler_spark.operators.lm import vocab_coverage

    rows = [(1, "aa bb aa", "A"), (2, "aa cc", "B")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        r["source"]: (r["total_tokens"], r["covered"], r["coverage_ppm"])
        for r in vocab_coverage(df, "text", "source", vocab_size=1).collect()
    }
    # global counts: aa=3, bb=1, cc=1 -> vocab {aa}
    assert got == {"A": (3, 2, 666_666), "B": (2, 1, 500_000)}
