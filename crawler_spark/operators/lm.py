"""Unigram language-model surprisal — the perplexity-style quality filter.

CCNet-class pipelines score every document against a language model and
drop the high-perplexity tail (boilerplate, gibberish, wrong-language
text). The real scorer is a trained LM; the deterministic stand-in here is
a unigram model estimated on the corpus itself, with all arithmetic in
integer BITS so the driver's DuckDB oracle can value-hash the result:

    surprisal(token) = ilog2(T) - ilog2(c(token))   [integer floor-log2]
    doc total_bits   = n_tokens * ilog2(T) - sum(ilog2(c))
    avg_centibits    = total_bits * 100 div n_tokens

where c(token) is the corpus count and T the total token count. Floor-log2
of a positive int64 is ``length(bin(x)) - 1`` — exact in both engines — so
no float log ever enters an aggregation and partial-agg order is
irrelevant. Rankings track true -log2 p within 1 bit per token, which is
what a keep/drop threshold consumes.

Scale design: the unigram count table is a word-keyed aggregate (map-side
partial combine); scoring joins the token stream to it on word (AQE
broadcasts it when the vocabulary is small — a few million rows after
[a-z]+ tokenization — else it's a plain shuffle join), then re-aggregates
on doc_id. Two shuffles total, both on high-cardinality keys; the 1-row
total-count frame is joined via broadcast so T stays in-plan (no driver
``.count()``, same rule as tf_idf). Tokens here are the RAW [a-z]+ stream
(stopwords and single letters kept): an LM must see function words — the
analyzer's stopword-filtered tokenizer (functions/text.tokens) is the
wrong feed for frequency modeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.hashing import hash60

_RAW_WORD = r"(?U)\b[a-z]+\b"


def token_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, w): the raw lowercase [a-z]+ token stream, multiplicity and
    order-free (one row per occurrence)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_RAW_WORD), F.lit(0))
        ).alias("w"),
    )


def _ilog2(c) -> F.Column:
    return (F.length(F.bin(c)) - 1).cast("long")


def hash_embed(docs: DataFrame, dim: int = 64, text_col: str = "text") -> DataFrame:
    """Feature-hashing document embeddings (the 'hashing trick',
    Weinberger et al. 2009 / sklearn HashingVectorizer): every token maps
    to dimension ``hash60(w) % dim`` with sign ``1 - 2*(hash60('s:'+w)%2)``
    (an independent hash bit), and the embedding is the signed occurrence
    count per dimension — the deterministic, training-free featurizer that
    bridges the documents table into the embedding operators (k-means,
    ANN blocking, cosine near-dup) with no model artifact to ship.

    All-integer (signed counts), so the vector is exactly reproducible in
    SQL. One shuffle on (doc, dim) plus the per-doc re-aggregation; the
    map is densified to a fixed-width array so downstream zip_with
    arithmetic never sees ragged vectors. Docs with no [a-z]+ token are
    omitted (same contract as :func:`surprisal`).
    """
    toks = token_stream(docs, text_col)
    h = hash60(F.col("w"))
    hs = hash60(F.concat(F.lit("s:"), F.col("w")))
    feats = toks.select(
        "doc_id",
        F.pmod(h, F.lit(dim)).alias("d"),
        (F.lit(1) - F.lit(2) * F.pmod(hs, F.lit(2))).alias("sgn"),
    )
    agg = feats.groupBy("doc_id", "d").agg(F.sum("sgn").alias("s"))
    m = agg.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("d", "s"))).alias("_m")
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.try_element_at(F.col("_m"), i.cast("long")), F.lit(0)),
    )
    return m.select("doc_id", emb.alias("embedding"))


def surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc unigram surprisal: (doc_id, n_tokens, total_bits,
    avg_centibits). Docs whose text yields no [a-z]+ token carry no
    probability mass and are omitted (the caller's quality gate already
    drops empty docs far earlier)."""
    toks = token_stream(docs, text_col).localCheckpoint(eager=False)
    cnt = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = cnt.groupBy().agg(_ilog2(F.sum("c")).alias("lt"))
    per = (
        toks.join(cnt, "w")
        .select("doc_id", _ilog2(F.col("c")).alias("lc"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("lc").alias("s"))
    )
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn("total_bits", F.col("n_tokens") * F.col("lt") - F.col("s"))
        .withColumn(
            "avg_centibits", F.expr("(total_bits * 100) div n_tokens")
        )
        .select("doc_id", "n_tokens", "total_bits", "avg_centibits")
    )


def surprisal_bigram(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    text_col: str = "text",
    alpha_bits: int = 2,
) -> DataFrame:
    """Per-doc bigram-LM surprisal with Stupid Backoff (Brants et al. 2007,
    *Large Language Models in Machine Translation*) — the bigram upgrade of
    :func:`surprisal` for perplexity-style quality filtering, scored
    against a model estimated on ``train_docs`` (the CCNet pattern: a
    clean reference corpus scores the raw crawl; defaults to ``docs``
    itself, in which case every bigram is trivially in-model and backoff
    never fires — pass a real training split for meaningful backoff).

    Token ``w_i`` after context ``w_{i-1}`` scores
    ``ilog2(c(w_{i-1})) - ilog2(c(w_{i-1} w_i))`` bits when the training
    corpus saw the bigram, else it BACKS OFF to the unigram score
    ``ilog2(N) - ilog2(c(w_i))`` plus ``alpha_bits`` penalty bits — the
    integer-log form of Brants' S(w|v) = c(vw)/c(v), backoff alpha *
    c(w)/N. The default penalty of exactly 2 bits is alpha = 0.25 (a
    power of two, so the whole score stays in exact integer arithmetic;
    Brants' 0.4 is within a factor 1.6). Out-of-vocabulary tokens count
    as c = 1 (ilog2 = 0). Each document's FIRST token scores as a plain
    unigram with no penalty.

    Returns (doc_id, n_tokens, n_backoffs, total_bits, avg_centibits);
    docs with no [a-z]+ token are omitted (same contract as
    :func:`surprisal`).

    Scale shape: each corpus is tokenized once (localCheckpoint); shuffles
    are the two training-count aggregates plus their equality join-backs
    onto the scored stream and one final groupBy(doc) — all linear in
    corpus token count, no windows over the corpus, no Python.
    """
    def _prep(d: DataFrame) -> DataFrame:
        return d.select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(_RAW_WORD), F.lit(0)
            ).alias("_t"),
        ).localCheckpoint(eager=False)

    def _pairs(base: DataFrame) -> DataFrame:
        return (
            base.where(F.size("_t") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("_t") - 1),
                        lambda i: F.struct(
                            F.get(F.col("_t"), i - 1).alias("prev"),
                            F.get(F.col("_t"), i).alias("w"),
                        ),
                    )
                ).alias("p"),
            )
            .select("doc_id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))
        )

    base = _prep(docs)
    tbase = _prep(train_docs) if train_docs is not None else base
    ttok = tbase.select("doc_id", F.explode("_t").alias("w"))
    cnt = ttok.groupBy("w").agg(F.count("*").alias("c"))
    total = cnt.groupBy().agg(_ilog2(F.sum("c")).alias("ln"))
    big = _pairs(tbase).groupBy("prev", "w").agg(F.count("*").alias("cb"))
    prev_cnt = cnt.select(F.col("w").alias("prev"), F.col("c").alias("cp"))

    lc = _ilog2(F.coalesce(F.col("c"), F.lit(1)))
    pair_bits = (
        _pairs(base)
        .join(big, ["prev", "w"], "left")
        .join(prev_cnt, "prev", "left")
        .join(cnt, "w", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.when(
                F.col("cb").isNotNull(), _ilog2(F.col("cp")) - _ilog2(F.col("cb"))
            )
            .otherwise(F.col("ln") - lc + F.lit(alpha_bits))
            .alias("bits"),
            F.col("cb").isNull().cast("long").alias("backoff"),
        )
    )
    first_bits = (
        base.where(F.size("_t") >= 1)
        .select("doc_id", F.get(F.col("_t"), 0).alias("w"))
        .join(cnt, "w", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.col("ln") - lc).alias("bits"),
            F.lit(0).cast("long").alias("backoff"),
        )
    )
    return (
        first_bits.unionByName(pair_bits)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("backoff").alias("n_backoffs"),
            F.sum("bits").alias("total_bits"),
        )
        .withColumn("avg_centibits", F.expr("(total_bits * 100) div n_tokens"))
    )


def zipf_slope(words: DataFrame) -> DataFrame:
    """Zipf-law fit of the corpus word-frequency distribution: the exact
    integer least-squares slope of ilog2(frequency) against ilog2(rank) —
    the one-number lexical-health check (natural text sits near -1; spam,
    boilerplate floods and template farms flatten or steepen it).

    ``words`` is the (doc_id, word) occurrence stream. Returns one row
    (n_vocab, neg_slope_milli) where neg_slope_milli is the NEGATED slope
    in exact integer milli-units (Zipf slopes are negative by construction;
    negating keeps the numerator positive so truncating and flooring
    integer division agree across engines).

    Scale shape: one vocabulary count, ranks via the two-phase global-seq
    primitive (range partition + per-partition offsets — NO single-partition
    window even at a 10^8-term vocabulary), then one scalar aggregate of
    the exact covariance sums.
    """
    from crawler_spark.operators.ordering import carry_seq_cache, with_global_seq

    vocab = words.groupBy("word").agg(F.count("*").alias("c"))
    ranked = with_global_seq(
        vocab, [F.desc("c"), F.asc("word")], seq_col="_rank0"
    )
    pts = ranked.select(
        _ilog2(F.col("_rank0") + 1).alias("x"), _ilog2(F.col("c")).alias("y")
    )
    s = pts.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    out = s.select(
        F.col("n").cast("long").alias("n_vocab"),
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0,
            F.expr("(1000 * (sx * sy - n * sxy)) div (n * sxx - sx * sx)"),
        ).alias("neg_slope_milli"),
    )
    # keep the seq-cache handle on the returned frame: without it
    # release_global_seq is a no-op and the persisted vocab leaks across
    # the 135 registry runs in check_oracle.py
    return carry_seq_cache(ranked, out)


def dsir_logratio(
    docs: DataFrame,
    is_target,
    buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed n-gram features are under a TARGET
    distribution than under the background SOURCE distribution — the
    standard way a web-scale pipeline selects raw-crawl documents that
    "look like" a curated corpus without training a classifier.

    ``is_target`` is a boolean Column marking the docs that define the
    target distribution (e.g. ``F.col("lang") == "en"`` for
    curated-English selection). Features are unigrams ∪ bigrams of the raw
    [a-z]+ token stream, hashed into ``buckets`` buckets (the paper's
    hashed bag-of-ngrams generative model). As with :func:`surprisal`, all
    arithmetic is integer floor-log2 bits so the score value-hashes
    against a DuckDB twin exactly:

        bits(b)       = ilog2(c_t(b)+1) - ilog2(c_s(b)+1)     [add-1 smooth]
        logratio_bits = sum over doc's feature occurrences of bits(b)
                        + n_feats * (ilog2(T_s+B) - ilog2(T_t+B))

    which is the floor-bit form of sum log2( p_t(f) / p_s(f) ) with
    Laplace smoothing. Rankings track the true log-ratio within ~1 bit
    per feature; selection takes the top of the ranking (the paper
    resamples with Gumbel noise — deterministic top-rank here, same
    contract as ``ccnet_buckets``'s deterministic ntile).

    Returns (doc_id, n_feats, logratio_bits); docs with no [a-z]+ token
    are omitted (no features, no mass — same contract as surprisal).

    Scale shape: one explode to (doc, bucket) feature rows
    (localCheckpointed — they feed both the count pass and the re-join),
    ONE groupBy(bucket) with two conditional sums (map-side combinable;
    the count table is at most ``buckets`` rows, broadcast back), one
    re-aggregation on doc_id. The bucket-count table is O(buckets) —
    independent of corpus size — so at 10^10 docs this is two shuffles
    over the token stream and nothing else.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_RAW_WORD), F.lit(0))
    base = docs.select("doc_id", is_target.alias("_tgt"), toks.alias("_t"))
    uni = F.col("_t")
    n_bi = F.size(uni) - 1
    bi = F.when(
        n_bi > 0,
        F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: F.concat(F.element_at(uni, i), F.lit(" "), F.element_at(uni, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = (
        base.select("doc_id", "_tgt", F.explode(F.concat(uni, bi)).alias("g"))
        .select("doc_id", "_tgt", F.pmod(hash60(F.col("g")), F.lit(buckets)).alias("b"))
        .localCheckpoint(eager=False)
    )
    cnt = feats.groupBy("b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(~F.col("_tgt"), 1).otherwise(0)).cast("long").alias("cs"),
    )
    tot = cnt.groupBy().agg(
        _ilog2(F.sum("ct") + buckets).alias("ltt"),
        _ilog2(F.sum("cs") + buckets).alias("lts"),
    )
    per = (
        feats.join(F.broadcast(cnt), "b")
        .select("doc_id", (_ilog2(F.col("ct") + 1) - _ilog2(F.col("cs") + 1)).alias("bits"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("bits").alias("s"))
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_feats",
        (F.col("s") + F.col("n_feats") * (F.col("lts") - F.col("ltt"))).alias("logratio_bits"),
    )


# ------------------------------------------------------------ BPE training

def _bpe_run(vocab: DataFrame, n_merges: int):
    """Shared BPE training loop (see :func:`bpe_merges` for the algorithm
    and scale story); returns (merge table, final symbol sequences).
    n_merges must be >= 1.

    This is Sennrich et al. 2016 tokenizer training as a dataflow: words
    become space-separated symbol sequences; each round counts adjacent
    symbol pairs weighted by word frequency, picks the most frequent pair
    (ties by lexicographic pair — deterministic), and rewrites every
    sequence with the pair fused. Symbols are separated by TWO spaces and
    the sequence is padded with one space each side, so the rewrite is a
    plain non-overlapping left-to-right string replace of
    ' x  y ' -> ' xy ': each match consumes one space from each 2-space
    separator, preserving the invariant for its neighbors — back-to-back
    occurrences ('a b a b' -> 'ab ab') and overlapping runs
    ('a a a' -> 'aa a', greedy) both come out exactly as real BPE
    application does (pinned in tests). Both engines' replace() scan
    identically, so the learned merge table value-hashes against a DuckDB
    twin that unrolls the same rounds.

    Scale shape per round: one pair-explode + groupBy(pair) sum (map-side
    combinable; the vocab table is orders of magnitude smaller than the
    corpus — BPE training never touches raw documents after the initial
    word count), one 1-row broadcast argmax, one map-only rewrite. Each
    round's sequence table feeds both the next count and the next rewrite,
    so it is lazily localCheckpointed (the HITS lesson: without lineage
    truncation the broadcast side re-evaluates the whole prefix per round).
    Real trainers run 30k+ merges with the same per-round plan, typically
    switching to an incremental pair-delta update once counts stabilize.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    # checkpointed at init too: round 1's pair count AND round 1's rewrite
    # both consume seq0 — without truncation each re-derives it from the
    # vocab (for a corpus-derived vocab that is a full re-tokenization)
    seqs = vocab.select(
        F.col("word"),
        F.col("freq").cast("long").alias("freq"),
        F.trim(F.regexp_replace(F.col("word"), "(.)", "$1  ")).alias("sym"),
    ).localCheckpoint(eager=False)
    out = None
    for rank in range(1, n_merges + 1):
        pairs = F.expr(
            "CASE WHEN size(split(sym, '  ')) > 1 THEN "
            "transform(sequence(1, size(split(sym, '  ')) - 1), "
            "j -> concat(element_at(split(sym, '  '), j), ' ', "
            "element_at(split(sym, '  '), j + 1))) "
            "ELSE CAST(array() AS ARRAY<STRING>) END"
        )
        pc = (
            seqs.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"))
        )
        m = pc.orderBy(F.desc("pair_count"), F.asc("pair")).limit(1)
        step = m.select(F.lit(rank).alias("rank"), "pair", "pair_count")
        out = step if out is None else out.unionByName(step)
        merged = F.regexp_replace(F.col("pair"), " ", "")
        # LEFT join on true, not crossJoin: when the vocabulary is fully
        # merged before n_merges rounds the argmax frame is EMPTY, and a
        # cross join would silently empty the sequence table (NULL
        # compression totals); with the left join the pair is NULL and the
        # rewrite keeps every sequence unchanged. The DuckDB twin's scalar
        # subquery goes NULL in the same case and its CASE guard matches.
        seqs = (
            seqs.join(F.broadcast(m.select("pair")), F.lit(True), "left")
            .select(
                "word",
                "freq",
                F.when(F.col("pair").isNull(), F.col("sym"))
                .otherwise(
                    F.trim(
                        F.replace(
                            F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                            F.concat(
                                F.lit(" "),
                                F.replace(F.col("pair"), F.lit(" "), F.lit("  ")),
                                F.lit(" "),
                            ),
                            F.concat(F.lit(" "), merged, F.lit(" ")),
                        )
                    )
                )
                .alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    return out, seqs


def bpe_merges(vocab: DataFrame, n_merges: int = 5) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a (word, freq)
    vocabulary; returns (rank, pair, pair_count) — see :func:`_bpe_run`."""
    out, _ = _bpe_run(vocab, n_merges)
    return out


def bpe_encode(words: DataFrame, n_merges: int = 5) -> DataFrame:
    """Apply the learned BPE merges back onto the corpus — the ENCODE half
    of the tokenizer loop (:func:`bpe_merges` is the training half): every
    document's words are replaced by their post-merge symbol sequences and
    counted, giving the per-document token budget a packing/pricing stage
    actually consumes, plus the fertility (symbols per word) in exact
    integer centitokens.

    ``words`` is the (doc_id, word) occurrence stream (one row per token).
    Returns (doc_id, n_words, n_symbols, fertility_centitokens); docs whose
    every token was filtered upstream are absent (same contract as the
    other word-store consumers).

    Scale shape: training runs on the VOCABULARY (orders of magnitude
    smaller than the corpus); application is one equality join of the
    word stream against the word -> symbol-count map — the exact shape of
    a production tokenizer-apply pass (broadcastable vocab at any corpus
    size) — plus one groupBy(doc). No Python, no windows.
    """
    vocab = words.groupBy("word").agg(F.count("*").alias("freq"))
    _, seqs = _bpe_run(vocab, n_merges)
    nsym = seqs.select("word", F.size(F.split(F.col("sym"), "  ")).alias("n_sym"))
    return (
        words.join(nsym, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_symbols"),
        )
        .withColumn(
            "fertility_centitokens", F.expr("(n_symbols * 100) div n_words")
        )
    )


def bpe_compression(vocab: DataFrame, n_merges: int = 5) -> DataFrame:
    """One row: (n_merges, tokens_before, tokens_after, saved) — the
    corpus-weighted sequence-length reduction the learned merges buy,
    i.e. the quantity a tokenizer team actually tunes vocabulary size by
    (fertility). tokens_before = sum(freq * chars); tokens_after =
    sum(freq * symbols after applying all merges greedily). Exact integers.
    """
    _, seqs = _bpe_run(vocab, n_merges)
    before = vocab.select(
        (F.col("freq") * F.length(F.col("word"))).alias("tb")
    ).agg(F.sum("tb").alias("tokens_before"))
    after = seqs.select(
        (F.col("freq") * F.size(F.split(F.col("sym"), "  "))).alias("ta")
    ).agg(F.sum("ta").alias("tokens_after"))
    return (
        before.crossJoin(F.broadcast(after))
        .select(
            F.lit(n_merges).cast("long").alias("n_merges"),
            "tokens_before",
            "tokens_after",
            (F.col("tokens_before") - F.col("tokens_after")).alias("saved"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    vocab_size: int = 100,
) -> DataFrame:
    """Per-group vocabulary coverage / OOV rate against the corpus's own
    top-``vocab_size`` vocabulary — the tokenizer-budget audit a training
    pipeline runs before fixing a vocab: what fraction of each source's
    token OCCURRENCES a closed vocabulary of the global head covers
    (the complement is the OOV/byte-fallback rate that inflates sequence
    lengths for that source).

    Returns (group, total_tokens, covered, coverage_ppm) — coverage in
    exact floor parts-per-million so the DuckDB twin value-hashes.

    Scale: token counts aggregate map-side per (word) — vocabulary-sized,
    not corpus-sized; the global top-V is a sort of the VOCABULARY table
    (bounded, never the token stream) and joins back to the stream as a
    broadcast membership flag; the final rollup is one groupBy(group).
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0))
        ).alias("word"),
    )
    vocab = (
        toks.groupBy("word")
        .agg(F.count("*").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("word"))
        .limit(vocab_size)
        .select("word", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count("*").alias("total_tokens"),
            F.sum(F.coalesce(F.col("_in_vocab"), F.lit(0))).cast("long").alias("covered"),
        )
        .select(
            group_col,
            "total_tokens",
            "covered",
            F.expr("CAST(covered * 1000000 DIV total_tokens AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy(group_col)
    )
