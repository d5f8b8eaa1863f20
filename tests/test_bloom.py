"""Partitioned Bloom: no false negatives, bounded false positives,
incremental build equivalence."""

from pyspark.sql import functions as F

from crawler_spark.operators.bloom import bloom_build, bloom_positions, bloom_prune

M, K = 4096, 4


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("http://h"), (F.col("id") % 16).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url_key"),
        (F.col("id") % 16).alias("bucket"),
        F.col("id").alias("id"),
    )


def test_no_false_negatives(spark):
    seen = _keys(spark, 0, 2000)
    bl = bloom_build(seen, "url_key", "bucket", m=M, k=K)
    survivors = bloom_prune(seen, bl, "url_key", "bucket", m=M, k=K)
    assert survivors.count() == 2000  # every inserted key must hit


def test_false_positive_rate_bounded(spark):
    seen = _keys(spark, 0, 2000)
    fresh = _keys(spark, 2000, 4000)
    bl = bloom_build(seen, "url_key", "bucket", m=M, k=K)
    fp = bloom_prune(fresh, bl, "url_key", "bucket", m=M, k=K).count()
    # ~125 keys per 4096-bit bucket, k=4 -> theoretical fp ~ (1-e^-kn/m)^k
    # ~ 1.3e-4; 2000 probes expect ~0.3. Allow an order of magnitude.
    assert fp <= 10


def test_incremental_build_equals_full(spark):
    """Blooms OR-combine: building on the union equals bit_or of per-batch
    blooms — the property that lets a round update only dirty buckets."""
    a, b = _keys(spark, 0, 1000), _keys(spark, 1000, 2000)
    full = bloom_build(a.unionByName(b), "url_key", "bucket", m=M, k=K)
    merged = (
        bloom_build(a, "url_key", "bucket", m=M, k=K)
        .unionByName(bloom_build(b, "url_key", "bucket", m=M, k=K))
        .groupBy("bucket", "word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    f = {(r["bucket"], r["word"]): r["bits"] for r in full.collect()}
    m_ = {(r["bucket"], r["word"]): r["bits"] for r in merged.collect()}
    assert f == m_ and len(f) > 0


def test_positions_in_range_and_word_bit_63_clear(spark):
    rows = (
        spark.range(500)
        .select(F.explode(bloom_positions(F.col("id").cast("string"), M, K)).alias("p"))
        .select(
            F.min("p").alias("lo"), F.max("p").alias("hi"),
        )
        .collect()[0]
    )
    assert 0 <= rows["lo"] and rows["hi"] < M
    bl = bloom_build(_keys(spark, 0, 3000), "url_key", "bucket", m=M, k=K)
    assert bl.where(F.col("bits") < 0).count() == 0  # 63-bit words stay nonneg
