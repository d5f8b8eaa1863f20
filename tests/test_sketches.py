"""Sketch invariants: HLL accuracy + mergeability, CMS never-underestimate
+ mergeability, cuckoo filter no-false-negatives + determinism + relocation
round sufficiency at the documented load factor."""

from pyspark.sql import functions as F

from crawler_spark.operators.sketches import (
    CUCKOO_SLOTS,
    HLL_M,
    cms_build,
    cms_estimate,
    cuckoo_build,
    cuckoo_prune,
    hll_registers,
    hll_summary,
)


def _keys(spark, lo, hi, card):
    """hi-lo rows over ``card`` distinct key values (duplicates included)."""
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), (F.col("id") % card).cast("string")).alias("key")
    )


# ------------------------------------------------------------------ HLL

def test_hll_estimate_within_3_sigma(spark):
    # m=64 -> relative std error 1.04/sqrt(64) ~= 13%; allow 3 sigma.
    true = 3000
    df = _keys(spark, 0, 6000, true)
    row = hll_summary(df, "key").collect()[0]
    assert row.m == HLL_M
    assert abs(row.est_hll - true) / true < 0.39, row


def test_hll_registers_merge_by_max(spark):
    a = _keys(spark, 0, 2000, 5000)
    b = _keys(spark, 2000, 6000, 5000)
    both = a.unionByName(b)
    merged = (
        hll_registers(a, "key")
        .unionByName(hll_registers(b, "key"))
        .groupBy("register")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    full = hll_registers(both, "key")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_hll_insensitive_to_duplicates(spark):
    once = _keys(spark, 0, 1000, 1000)
    thrice = _keys(spark, 0, 3000, 1000)
    assert (
        hll_summary(once, "key").collect() == hll_summary(thrice, "key").collect()
    )


# ------------------------------------------------------------------ CMS

def test_cms_never_underestimates(spark):
    occ = _keys(spark, 0, 5000, 300)
    sketch = cms_build(occ, "key")
    truth = occ.groupBy("key").agg(F.count("*").alias("true_count"))
    est = cms_estimate(truth, sketch, "key")
    bad = est.where(F.col("cms_est") < F.col("true_count")).count()
    assert bad == 0


def test_cms_merges_by_sum(spark):
    a = _keys(spark, 0, 2000, 400)
    b = _keys(spark, 2000, 5000, 400)
    merged = (
        cms_build(a, "key")
        .unionByName(cms_build(b, "key"))
        .groupBy("row", "col")
        .agg(F.sum("c").alias("c"))
    )
    full = cms_build(a.unionByName(b), "key")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


# ------------------------------------------------------------------ cuckoo

def test_cuckoo_no_false_negatives(spark):
    seen = _keys(spark, 0, 2000, 2000).distinct()
    table = cuckoo_build(seen, "key")
    assert cuckoo_prune(seen, table, "key").count() == 2000


def test_cuckoo_false_positive_rate_bounded(spark):
    seen = _keys(spark, 0, 2000, 2000).distinct()
    fresh = spark.range(0, 2000).select(
        F.concat(F.lit("other"), F.col("id").cast("string")).alias("key")
    )
    table = cuckoo_build(seen, "key")
    fp = cuckoo_prune(fresh, table, "key").count()
    # 8-bit fingerprints, 2 buckets of 4 slots probed -> fp rate ~ 2*4/255 ~ 3%
    assert fp / 2000 < 0.10, fp


def test_cuckoo_relocation_round_bounds_overflow(spark):
    # one relocation round at load factor 2000 / (1024*4) ~ 0.49: every
    # overfull PRIMARY bucket is emptied; residual overflow (alt landings on
    # busy buckets) stays under 2% of buckets and never exceeds SLOTS + 1
    seen = _keys(spark, 0, 2000, 2000).distinct()
    table = cuckoo_build(seen, "key")
    loads = table.groupBy("bucket").count()
    overfull = loads.where(F.col("count") > CUCKOO_SLOTS).count()
    assert overfull <= 0.02 * 1024, overfull
    assert loads.agg(F.max("count")).collect()[0][0] <= CUCKOO_SLOTS + 1

    # without relocation the primary table is strictly worse
    key = F.col("key").cast("string")
    from crawler_spark.operators.sketches import _fp, _i1

    prim = seen.select(_i1(key).alias("bucket"), _fp(key).alias("fp")).distinct()
    naive = (
        prim.groupBy("bucket").count().where(F.col("count") > CUCKOO_SLOTS).count()
    )
    assert naive > overfull


def test_cuckoo_build_deterministic(spark):
    seen = _keys(spark, 0, 1500, 1500).distinct()
    t1 = sorted(map(tuple, cuckoo_build(seen, "key").collect()))
    t2 = sorted(map(tuple, cuckoo_build(seen.repartition(7), "key").collect()))
    assert t1 == t2


def test_hll_by_group_matches_per_group_summary(spark):
    from crawler_spark.operators.sketches import hll_summary, hll_summary_by

    df = spark.range(0, 6000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("k"), (F.col("id") % 2000).cast("string")).alias("key"),
    )
    by = {r.by: (r.n_zero_registers, r.z30, r.est_hll)
          for r in hll_summary_by(df, "key", "grp").collect()}
    for g in ("0", "1", "2"):
        solo = hll_summary(df.where(F.col("grp") == g), "key").collect()[0]
        assert by[g] == (solo.n_zero_registers, solo.z30, solo.est_hll), g


# ------------------------------------------------------------------ KMV

def test_kmv_merge_law(spark):
    # k smallest of (A u B) is exactly computable from the two k-row
    # sketches when each input has >= k distinct keys — the cluster
    # sketch-union property.
    from crawler_spark.operators.sketches import kmv_merge, kmv_sketch

    a = _keys(spark, 0, 2000, 5000)
    b = _keys(spark, 1500, 5000, 5000)
    merged = sorted(r.h for r in kmv_merge(kmv_sketch(a, "key"), kmv_sketch(b, "key")).collect())
    full = sorted(r.h for r in kmv_sketch(a.unionByName(b), "key").collect())
    assert merged == full


def test_kmv_estimates_within_3_sigma(spark):
    # k=64 -> relative std error ~1/sqrt(k-2) ~= 12.7%; allow 3 sigma.
    from crawler_spark.operators.sketches import kmv_overlap_summary

    a = _keys(spark, 0, 3000, 10**6)       # 3000 distinct
    b = _keys(spark, 2000, 6000, 10**6)    # 4000 distinct, 1000 shared
    row = kmv_overlap_summary(a, b, "key").collect()[0]
    assert abs(row.est_a - 3000) / 3000 < 0.39, row
    assert abs(row.est_b - 4000) / 4000 < 0.39, row
    assert abs(row.est_union - 6000) / 6000 < 0.39, row
    # intersection compounds union + Jaccard error; allow a looser band
    assert abs(row.est_intersection - 1000) / 1000 < 0.6, row


def test_kmv_insensitive_to_duplicates(spark):
    from crawler_spark.operators.sketches import kmv_sketch

    once = _keys(spark, 0, 1000, 1000)
    thrice = _keys(spark, 0, 3000, 1000)
    assert (
        sorted(r.h for r in kmv_sketch(once, "key").collect())
        == sorted(r.h for r in kmv_sketch(thrice, "key").collect())
    )


# ------------------------------------------------------- heavy hitters

def test_cms_prune_is_lossless(spark):
    # CMS never underestimates, so the candidate stage of
    # cms_heavy_hitters can never drop a true heavy hitter: the pruned
    # result must EQUAL the naive exact computation on a skewed stream
    # whose cold tail is large enough to make CMS collisions certain.
    from crawler_spark.operators.sketches import cms_heavy_hitters

    df = spark.range(5000).select(
        F.when(F.col("id") % 5 < 2, F.concat(F.lit("hot"), (F.col("id") % 4).cast("string")))
        .otherwise(F.concat(F.lit("cold"), F.col("id").cast("string")))
        .alias("key")
    )
    phi = 100
    pruned = sorted(map(tuple, cms_heavy_hitters(df, "key", phi).collect()))
    n = df.count()
    naive = sorted(
        map(
            tuple,
            df.groupBy("key")
            .agg(F.count("*").alias("freq"))
            .where(F.col("freq") * phi > n)
            .collect(),
        )
    )
    assert pruned == naive and len(pruned) == 4
