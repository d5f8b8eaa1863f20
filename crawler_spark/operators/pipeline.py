"""Composed training-data curation pipeline — the end-to-end keep/drop story.

A corpus pipeline chains the individual operators this package provides:
quality gate (F11) -> language gate -> exact dedup keeper -> near-dup
cluster representative. ``training_keepset`` composes them into one
annotated plan so a user gets the full curation decision per document in a
single DataFrame — and the whole composition is value-checked against a
DuckDB twin that recomputes every stage in SQL (crawler_spark.queries
``training_keepset``).

Contract: each gate is evaluated on the FULL corpus and the annotation is
the FIRST failing gate in precedence order (quality, lang, exact_dup,
near_dup) — a per-document annotation operator, not a sequential filter, so
the oracle composition stays closed-form. Representatives are min-id: the
exact keeper is min doc id per text hash, the near-dup representative is
the min doc id of the connected component (dedup.neardup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.hashing import hash60
from crawler_spark.operators import dedup, textstats


def training_keepset(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    neardup_threshold: float = 0.5,
) -> DataFrame:
    """(doc, status) per document; status = 'kept' or the first failing gate
    ('quality' | 'lang' | 'exact_dup' | 'near_dup')."""
    quality = textstats.quality_metrics(df, id_col, text_col).select(
        "doc", "is_valid"
    )
    lang_pred = textstats.with_lang_id(df, text_col).select(
        F.col(id_col).alias("doc"), "pred_lang"
    )
    # exact keeper: min doc id per text hash, joined back on the hash
    hashed = df.select(
        F.col(id_col).alias("doc"), hash60(F.col(text_col)).alias("text_hash")
    )
    keepers = hashed.groupBy("text_hash").agg(F.min("doc").alias("keep_id"))
    exact = hashed.join(keepers, "text_hash").select("doc", "keep_id")
    # near-dup representative: component min over the MinHash pair graph
    clusters = dedup.neardup_clusters(
        dedup.minhash_lsh_dedup(df, id_col, text_col, threshold=neardup_threshold)
    )
    annotated = (
        quality.join(lang_pred, "doc")
        .join(exact, "doc")
        .join(clusters, "doc", "left")
    )
    status = (
        F.when(~F.col("is_valid"), F.lit("quality"))
        .when(F.col("pred_lang") != lang, F.lit("lang"))
        .when(F.col("doc") != F.col("keep_id"), F.lit("exact_dup"))
        .when(
            F.col("cluster").isNotNull() & (F.col("doc") != F.col("cluster")),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
    )
    return annotated.select("doc", status.alias("status"))


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment — the reproducible-split
    recipe for training corpora: membership is a pure function of the doc
    id's portable hash (``hash60 % 100``), never an RNG, so re-runs,
    incremental arrivals, and different cluster sizes all produce the same
    split, and the assignment is re-derivable in any engine (the DuckDB
    twin recomputes it in SQL). Adds a ``split`` column.
    """
    assert val_pct + test_pct < 100
    b = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(100))
    train_hi = 100 - val_pct - test_pct
    split = (
        F.when(b < train_hi, F.lit("train"))
        .when(b < train_hi + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def split_by_cluster(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """Leakage-safe train/val/test split: the assignment hashes the
    near-dup CLUSTER representative, not the document id, so near-duplicate
    documents can never straddle splits (per-doc hashing leaks ~Jaccard-
    similar copies of training text into the eval split — the train/test
    contamination mode measured by Lee et al. 2022 §6.2 that n-gram
    decontamination misses because the copies are the *same* distribution,
    not a benchmark).

    ``clusters`` is (doc, cluster) from :func:`crawler_spark.operators.
    dedup.neardup_clusters` (either flavor); documents absent from it (no
    near-dup — the overwhelming majority) fall back to their own id, which
    is exactly :func:`split_assign`'s function, so the split distribution
    is unchanged and only clustered docs move. Same 98/1/1 hash buckets as
    split_assign.

    Scale: one left join keyed on the doc id — the clusters frame is the
    near-dup subset (tiny next to the corpus; AQE broadcasts it) — then a
    map-only hash. No new shuffle class beyond split_assign.
    """
    assert val_pct + test_pct < 100
    c = clusters.select(
        F.col("doc").alias(id_col), F.col("cluster").alias("_cluster")
    )
    rep = F.coalesce(F.col("_cluster"), F.col(id_col)).cast("string")
    b = F.pmod(hash60(rep), F.lit(100))
    train_hi = 100 - val_pct - test_pct
    split = (
        F.when(b < train_hi, F.lit("train"))
        .when(b < train_hi + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        df.join(c, id_col, "left")
        .withColumn("split", split)
        .withColumn("clustered", F.col("_cluster").isNotNull())
        .drop("_cluster")
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 5,
) -> DataFrame:
    """Benchmark-contamination check (the n-gram-overlap decontamination
    standard, e.g. GPT-3 appendix C / Dolma): a corpus doc is contaminated
    when it shares >= ``min_shared`` distinct word-``n``-grams with a
    benchmark doc. Returns (doc, bench_doc, n_shared), one row per
    contaminated (corpus, benchmark) pair.

    Plan shape: shingle both sides (distinct hashed n-grams), equality-join
    on the shingle hash — the benchmark side is tiny (eval sets), so
    Catalyst broadcasts it and the corpus is scanned once; no pairwise
    comparison ever materializes. At 10^10 docs this is the same
    single-broadcast-join pass.
    """
    c = dedup.doc_shingles(corpus, id_col, text_col, n)
    b = dedup.doc_shingles(benchmark, id_col, text_col, n).select(
        F.col("doc").alias("bench_doc"), "sh"
    )
    return (
        c.join(F.broadcast(b), "sh")
        .groupBy("doc", "bench_doc")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    cap: int = 15,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-domain document cap (the C4/RefinedWeb guard against any single
    site dominating the corpus): keep at most ``cap`` documents per domain,
    best ``quality_col`` first, id as the deterministic tiebreak.

    Reuses the frontier's salted two-phase top-k (operators/ordering.
    top_per_key) — the per-(domain, salt) prefilter splits a mega-domain
    across tasks before the exact per-domain rank, so one domain holding
    10^8 docs never funnels through a single window task. Output keeps all
    input columns plus ``rank_col`` (1-based within the domain).
    """
    from crawler_spark.operators.ordering import top_per_key

    order = [F.desc(quality_col), F.asc(id_col)]
    return top_per_key(
        df,
        key=domain_col,
        order_exprs=order,
        limit_col=F.lit(cap),
        salt_on=id_col,
        salt_buckets=8,
        rank_col=rank_col,
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str = "doc_id",
    k: int = 5,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic stratified sample: ``k`` documents per stratum (the
    grouping of ``strata_cols``), chosen by ascending ``hash60(id)`` with
    the id itself as the final tiebreak — i.e. a uniform-without-replacement
    sample that is reproducible across runs, engines and partitionings
    (the property `df.sample()` cannot give, since its Bernoulli draw
    depends on partition layout). This is the corpus-ablation /
    eval-set-carving primitive: every (lang, source) cell contributes the
    same k docs no matter how the data is laid out.

    Plan: one synthetic stratum key + the frontier's salted two-phase
    top-k (operators/ordering.top_per_key), so a mega-stratum never
    funnels through a single window task. Output keeps all input columns
    plus ``rank_col`` (1-based within the stratum).
    """
    from crawler_spark.operators.ordering import top_per_key

    key = F.concat_ws("", *[F.col(c) for c in strata_cols])
    tagged = df.withColumn("_stratum", key).withColumn(
        "_draw", hash60(F.col(id_col).cast("string"))
    )
    out = top_per_key(
        tagged,
        key="_stratum",
        order_exprs=[F.asc("_draw"), F.asc(id_col)],
        limit_col=F.lit(k),
        salt_on=id_col,
        salt_buckets=8,
        rank_col=rank_col,
    )
    return out.drop("_stratum", "_draw")


def corpus_mix(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified subsampling — the data-mixing step of a
    training run (per-source sampling weights, e.g. upweight curated
    sources, downweight raw crawl). Membership is a pure function of
    ``hash60(id ':' stratum) % 10000`` compared against the stratum's rate:
    no RNG, so re-runs, incremental arrivals, and any cluster size keep the
    exact same documents, and the oracle re-derives every decision in SQL.

    A map-only filter at any scale (no shuffle, no sampling state).
    """
    key = F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(strata_col))
    b = F.pmod(hash60(key), F.lit(10000))
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.where(b < (rate * 10000).cast("long"))


def temperature_rates(
    counts: dict[str, int],
    alpha: float = 0.5,
    target_frac: float = 0.5,
    q_bits: int = 20,
) -> dict[str, int]:
    """Per-stratum sampling rates (integer basis points, 0..10000) for
    temperature-weighted mixing: stratum s gets an expected share
    proportional to ``n_s**alpha`` (the multilingual sampling rule of
    mC4 / XLM-R: alpha < 1 flattens the head, upweighting small strata),
    with the total expected keep ~= ``target_frac`` of the corpus and each
    stratum's rate capped at 1.

    All arithmetic is EXACT: ``n**alpha`` is quantized to an integer at
    ``q_bits`` fractional bits (for alpha=0.5 via math.sqrt, which IEEE 754
    requires to be correctly rounded, so any engine reproduces the same
    integer), and the rate formula is evaluated in arbitrary-precision
    Python ints — no float summation-order hazards, so a DuckDB oracle
    recomputing the same formula in HUGEINT gets bit-identical basis points
    even at 10^10-row stratum counts.
    """
    import math

    scale = 1 << q_bits
    if alpha == 0.5:
        q = {s: math.floor(math.sqrt(n) * scale) for s, n in counts.items()}
    else:
        q = {s: math.floor(n**alpha * scale) for s, n in counts.items()}
    tot_n = sum(counts.values())
    tot_q = sum(q.values())
    frac_bp = round(target_frac * 10000)
    return {
        s: min(10000, (frac_bp * tot_n * q[s]) // (tot_q * counts[s]))
        for s, n in counts.items()
        if counts[s] > 0
    }


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted data mixing: derive per-stratum sampling rates
    from the observed stratum sizes (share ∝ n**alpha — the published
    multilingual/source-balancing rule of mC4 and XLM-R) and apply them as
    the same deterministic hash-membership filter as :func:`corpus_mix`.

    Plan shape at scale: one map-side-combined count per stratum (rows =
    number of strata, collected to the driver as a bounded aggregate — the
    stratum universe is sources/languages, not documents), exact integer
    rate math driver-side, then a broadcast-free map-only filter (the rate
    table is inlined as a CASE chain). No shuffle of the corpus itself.
    """
    # a NULL stratum gets no rate and its rows are dropped (the hash key
    # below is NULL for them anyway, so the filter predicate is never true);
    # excluding it here keeps the driver-side sort from comparing None<str
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("_n")).collect()
        if r[0] is not None
    }
    bp = temperature_rates(counts, alpha=alpha, target_frac=target_frac)
    key = F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(strata_col))
    b = F.pmod(hash60(key), F.lit(10000))
    thresh = F.lit(0)
    for stratum, v in sorted(bp.items()):
        thresh = F.when(F.col(strata_col) == stratum, F.lit(int(v))).otherwise(thresh)
    return df.where(b < thresh)


def corpus_shuffle(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order shuffle: a contiguous 0-based
    ``seq`` over the pseudo-random permutation ``hash60(id)`` (id as the
    collision tiebreak). Uses the distributed rank primitive
    (ordering.with_global_seq) — range-partition on the hash, per-partition
    offsets — so a 10^10-doc corpus never funnels through one window task,
    yet the order is reproducible anywhere (the oracle recomputes it as a
    plain row_number).

    Cache contract: release with ordering.release_global_seq after
    materializing (registry usage collects immediately).
    """
    from crawler_spark.operators.ordering import carry_seq_cache, with_global_seq

    keyed = df.withColumn("_shuf", hash60(F.col(id_col).cast("string")))
    order = [F.asc("_shuf"), F.asc(id_col)]
    seq = with_global_seq(keyed, order, seq_col="seq")
    # re-attach the cache handle the .drop() projection would discard —
    # without it release_global_seq is a silent no-op and the persisted
    # intermediate leaks across the 90+ registry runs (ADVICE r3)
    return carry_seq_cache(seq, seq.drop("_shuf"))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining batches):
    documents are laid out in the deterministic shuffle order
    (hash60(id), id), token counts are prefix-summed, and each document
    maps to the fixed-size token chunks [start_chunk, end_chunk] it
    occupies in the concatenated stream. Straddling a boundary is allowed —
    that IS concat-and-chunk semantics; n_chunks tells how many pieces the
    doc is split into.

    The prefix sum is the distributed two-phase cumsum
    (ordering.with_global_cumsum), never a single-task global window.
    Returns (doc, n_tok, cum_before, start_chunk, end_chunk).
    """
    from crawler_spark.operators.ordering import carry_seq_cache, with_global_cumsum

    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z]+"), F.lit(0))
    d = df.select(
        F.col(id_col).alias("doc"),
        F.size(toks).cast("long").alias("n_tok"),
        hash60(F.col(id_col).cast("string")).alias("_shuf"),
    )
    order = [F.asc("_shuf"), F.asc("doc")]
    c = with_global_cumsum(d, order, "n_tok", out_col="cum_before")
    # integer `div`, not floor(a/b): double division loses exactness once
    # cumulative token counts pass 2^53 — real at the 10^10-doc design point
    bi = int(budget)
    out = c.select(
        "doc",
        "n_tok",
        "cum_before",
        F.expr(f"cum_before div {bi}").cast("long").alias("start_chunk"),
        F.expr(f"(cum_before + greatest(n_tok, 1L) - 1) div {bi}")
        .cast("long")
        .alias("end_chunk"),
    )
    return carry_seq_cache(c, out)


def token_budget_select(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-ordered token-budget selection — "fill N training tokens
    with the best documents" (the data-constrained-scaling recipe: rank by
    an LM-quality score, take the prefix that fits the budget).

    Score = unigram surprisal avg_centibits (operators/lm.surprisal, lower
    = more LM-typical text), ascending, doc id as the deterministic
    tiebreak; a document is kept iff it fits ENTIRELY within the remaining
    budget in that order (no straddling — unlike pack_sequences, selection
    must not truncate documents; later smaller docs do NOT backfill the
    gap, prefix semantics are the reproducibility contract).

    The prefix sum is the distributed two-phase cumsum
    (ordering.with_global_cumsum) over the score order — never a
    single-task global window — and all quantities are exact integers, so
    the oracle re-derives every decision. Returns
    (doc_id, avg_centibits, n_tokens, cum_tokens) for the kept prefix.
    """
    from crawler_spark.operators.lm import surprisal
    from crawler_spark.operators.ordering import carry_seq_cache, with_global_cumsum

    scored = surprisal(df, text_col).select(
        F.col("doc_id"), "avg_centibits", "n_tokens"
    )
    order = [F.asc("avg_centibits"), F.asc("doc_id")]
    c = with_global_cumsum(scored, order, "n_tokens", out_col="_cum_before")
    out = (
        c.where(F.col("_cum_before") + F.col("n_tokens") <= F.lit(int(budget)))
        .select(
            "doc_id",
            "avg_centibits",
            "n_tokens",
            (F.col("_cum_before") + F.col("n_tokens")).alias("cum_tokens"),
        )
    )
    return carry_seq_cache(c, out)


def source_reputation(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-source curation scorecard — the host-reputation signal a crawl
    scheduler and a corpus curator both consume (analog of the reference's
    per-domain rollups, but over curation outcomes).

    Joins every document's :func:`training_keepset` status back to its
    source and aggregates one row per source: how many documents it
    contributed, how many survived curation, and where the rest died
    (quality / language / exact-dup / near-dup), plus total characters.
    All outputs are exact integers (counts and sums — ratios are left to
    the consumer) so the cross-engine value hash is exact.

    Scale: one extra shuffle over the keepset output, keyed on source —
    sources are ~hosts, far fewer than docs, and the count aggregation is
    map-side combinable. Feeding the result back into frontier priorities
    (boost high-keep-rate hosts) is a broadcast join against the frontier.
    """
    ks = training_keepset(df, id_col, text_col)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(source_col).alias("source"),
        F.col(chars_col).cast("long").alias("_chars"),
    )

    def n(status: str, alias: str):
        return F.sum(
            F.when(F.col("status") == status, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias(alias)

    return (
        base.join(ks, "doc")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            n("kept", "n_kept"),
            n("quality", "n_quality_fail"),
            n("lang", "n_lang_fail"),
            n("exact_dup", "n_exact_dup"),
            n("near_dup", "n_near_dup"),
            F.sum("_chars").alias("sum_chars"),
        )
    )


def source_gini(
    df: DataFrame, strat_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Gini coefficient of the per-stratum document share — the one-number
    balance audit of a corpus mix (0 bp = perfectly even strata, ~10000 bp
    = one stratum holds everything). The standard fairness check before and
    after domain_cap / temperature_mix, and the skew report for per-host
    crawl budgets.

    Exact integer basis points: with stratum sizes x_1 <= ... <= x_n
    (ties broken by stratum name so the rank is deterministic) and
    S = sum(x),  G_bp = ((2 * sum(i * x_i) - (n + 1) * S) * 10000) div
    (n * S) — the classic mean-difference identity, no floats anywhere.

    Returns a single row (n_strata, n_docs, gini_bp). One count aggregate
    over the corpus plus a window over the STRATUM table only (bounded by
    stratum cardinality — hosts/sources, never documents), then a one-row
    total: safe at any corpus size.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(strat_col).alias("stratum")).agg(
        F.count(id_col).alias("x")
    )
    w = Window.orderBy(F.asc("x"), F.asc("stratum"))
    ranked = counts.select("stratum", "x", F.row_number().over(w).alias("i"))
    return ranked.groupBy().agg(
        F.count("*").alias("n_strata"),
        F.sum("x").alias("n_docs"),
        # decimal(38,0) summand: sum(i*x) reaches n_strata*n_docs, and the
        # *10000 numerator exceeds int64 for ~10^7 hosts over 10^9+ docs —
        # the per-host audit this exists for. DuckDB already sums HUGEINT.
        F.expr(
            "CAST(((2 * sum(CAST(i * x AS DECIMAL(38,0)))"
            " - (count(*) + 1) * sum(CAST(x AS DECIMAL(38,0)))) * 10000)"
            " div (count(*) * sum(CAST(x AS DECIMAL(38,0)))) AS BIGINT)"
        ).alias("gini_bp"),
    )


def curate_crawl(
    spark,
    workdir: str,
    out_dir: str,
    n_shards: int = 8,
    lang: str = "en",
) -> dict:
    """End-to-end curation of a finished crawl: pages sink -> keepset ->
    size-balanced training shards on disk + a scorecard dict.

    The composition a training-data team actually runs: successful fetches
    (one row per page, latest fetch attempt wins by seq) go through the
    quality -> language -> exact-dup -> near-dup keepset
    (:func:`training_keepset`), survivors are ranked by text length with
    the two-phase global-sequence primitive and dealt round-robin into
    ``n_shards`` size-balanced parquet shards (the shard_assignment
    balancer), written under ``out_dir/shards/shard=N/``. Returns the
    scorecard: per-status drop counts and per-shard doc/char totals —
    the dict the report layer and the CLI serialize.

    Scale shape: keepset cost is the MinHash near-dup pass (single
    banded shuffle); the shard rank is the same range-partition +
    per-partition-offset plan as corpus_shuffle; the write is one pass
    partitioned by shard.
    """
    from pyspark.sql import functions as F

    from crawler_spark.operators.ordering import release_global_seq, with_global_seq
    from crawler_spark.tables import SnapshotCatalog

    from pyspark.sql import Window

    pages = SnapshotCatalog(workdir).read(spark, "pages")
    if pages is None:
        return {"kept": 0, "dropped": {}, "shards": []}
    # one row per page: the LATEST successful fetch wins (seq restarts
    # every round, so order by (round, seq)); the numeric doc id the
    # keepset needs is the canonical-URL hash
    w = Window.partitionBy("canonical").orderBy(F.desc("round"), F.desc("seq"))
    docs = (
        pages.where(F.col("success") & F.col("text").isNotNull())
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            hash60(F.col("canonical")).alias("doc_id"), "canonical", "text"
        )
        .localCheckpoint(eager=False)
    )
    ks = training_keepset(docs, "doc_id", "text", lang=lang)
    status_counts = {
        r["status"]: r["n"]
        for r in ks.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    kept = docs.join(
        ks.where(F.col("status") == "kept").select(F.col("doc").alias("doc_id")),
        "doc_id",
    ).withColumn("n_chars", F.length("text"))
    seq = with_global_seq(
        kept, [F.desc("n_chars"), F.asc("doc_id")], seq_col="_rank"
    )
    sharded = seq.withColumn(
        "shard", F.pmod(F.col("_rank"), F.lit(n_shards)).cast("int")
    ).drop("_rank")
    out_path = f"{out_dir}/shards"
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_path)
    release_global_seq(seq)
    shard_stats = [
        {"shard": r["shard"], "n_docs": r["n"], "total_chars": r["chars"]}
        for r in (
            spark.read.parquet(out_path)
            .groupBy("shard")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
            .orderBy("shard")
            .collect()
        )
    ]
    return {
        "kept": status_counts.get("kept", 0),
        "dropped": {k: v for k, v in status_counts.items() if k != "kept"},
        "n_shards": n_shards,
        "out": out_path,
        "shards": shard_stats,
    }


def exact_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` as a ranker for binary ``label_col``,
    via the Mann-Whitney rank-sum identity, in exact integer arithmetic.

    The curation pipeline's quality scores (doc_quality, url_quality,
    source_reputation, lm surprisal) all become keep/drop classifiers at
    some threshold; AUC is the threshold-free calibration number a
    data-quality team tracks per snapshot. Computed exactly — not sampled,
    not sketched — with the tie-correct midrank convention:

        AUC = (R_pos - n_pos*(n_pos+1)/2) / (n_pos * n_neg)

    where R_pos is the sum of positives' midranks under ascending score.
    To stay in integers: per distinct score, the doubled midrank-sum
    contribution is  p * (2*cum_before + c + 1)  (c rows tie at this score,
    p of them positive, cum_before rows strictly below), and

        auc_ppm = (R2 - n_pos*(n_pos+1)) * 1_000_000
                  DIV (2 * n_pos * n_neg),        R2 = sum of contributions

    — floor(AUC in parts-per-million), bit-identical across engines and
    partitionings (the DuckDB oracle runs the same closed form).

    Scale: one groupBy(score) shuffle (map-side combinable; output
    cardinality = distinct scores, e.g. <= max doc length for integer
    length scores), then the two-phase distributed prefix sum
    (with_global_cumsum — range-partitioned, one row per partition to the
    driver, never a single-task global window), then a 1-row aggregate.
    Returns (n_pos, n_neg, auc_ppm); carries the cumsum cache handle —
    callers release via release_global_seq after materializing.
    """
    from crawler_spark.operators.ordering import carry_seq_cache, with_global_cumsum

    g = df.groupBy(F.col(score_col).alias("score")).agg(
        F.count("*").alias("c"),
        F.sum(F.col(label_col).cast("long")).alias("p"),
    )
    o = with_global_cumsum(g, [F.asc("score")], "c", out_col="cb")
    # decimal(38,0) intermediates: r2 ~ 2*n^2 and the ppm numerator ~ 2e6*n^2
    # exceed int64 past ~2e6 rows; 38 digits carry the closed form exactly to
    # n ~ 10^15 (DuckDB's HUGEINT sums match), result always fits BIGINT
    out = o.agg(
        # cast the SUMMAND, not the finished sum: Spark would otherwise
        # accumulate in int64 and overflow (ANSI throw / silent wrap)
        # before the cast ever runs — exactly the > 2e6-row regime the
        # decimal is for
        F.sum((F.col("p") * (2 * F.col("cb") + F.col("c") + 1)).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("r2"),
        F.sum("p").cast("decimal(38,0)").alias("np"),
        (F.sum("c") - F.sum("p")).cast("decimal(38,0)").alias("nn"),
    ).select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.expr(
            "CAST((r2 - np * (np + 1)) * 1000000 DIV (2 * np * nn) AS BIGINT)"
        ).alias("auc_ppm"),
    )
    return carry_seq_cache(o, out)
