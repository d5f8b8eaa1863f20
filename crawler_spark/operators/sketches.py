"""Cardinality / frequency / membership sketches as exact integer plans.

The north rule's frontier design point is 10^10 URLs: at that scale the
questions a scheduler asks every round — "how many distinct URLs has this
crawl seen", "which hosts are hot", "is this URL possibly already seen" —
are answered by sketches, not exact scans. The reference keeps only the
exact structures (an MD5-keyed visited set and a Bloom filter,
/root/reference/src/crawler/url_management/queue.py:35-77); this module
adds the three classic sketch families the scaled-up design needs, each
expressed as ordinary DataFrame integer arithmetic so the full sketch
state — including its approximation error — is bit-reproducible in the
DuckDB oracle and sits under the driver's value-hash gate:

- **HyperLogLog** (Flajolet et al. 2007): m=2^p registers, register j
  holds max over keys of the geometric bit statistic rho. Registers are
  built with one map-side-combinable groupBy().max() — the sketch state is
  mergeable by elementwise max, which is exactly how a 1000-executor
  cluster would union per-partition sketches (pinned by a unit test).
  rho uses the trailing-zero convention (1 + count of trailing zeros of
  the non-register hash bits), computed portably as
  ``length(bin(rest & -rest))`` — both engines print minimal binary.
  The estimate is the raw HLL harmonic mean evaluated in fixed-point
  integer arithmetic (terms 2^(30-M_j), truncated to 0 for M_j > 30 —
  identical truncation in both engines), so even the estimate
  value-hashes. Production would add linear-counting small-range
  correction (needs ln); the registers and zero-count columns carry
  everything that correction needs.

- **Count-min sketch** (Cormode & Muthukrishnan 2005): d hash rows of w
  counters; counter (i, j) = sum of occurrences with hash_i(key) = j.
  Pure sums → order-independent, map-side combinable, mergeable by
  elementwise +. Point estimate = min over rows — never an underestimate
  (pinned by a test). Sized d x w = 4 x 256 here so collisions are
  visible at test scale; a production hot-host sketch would run 4 x 2^20
  (~32 MB, broadcastable) with the identical plan.

- **Cuckoo-style fingerprint filter** (Fan et al. 2014): each key has a
  fingerprint fp in [1, 255] and two candidate buckets i1 = h(key) mod m
  and i2 = i1 XOR g(fp) (m a power of two keeps the XOR in range; the
  pairing is an involution, so i2's alternate is i1). The build stores
  (bucket, fp) set-wise in the primary bucket, then runs ONE deterministic
  relocation round: buckets holding more than SLOTS fingerprints keep the
  SLOTS smallest (rank by fp value — order-independent) and relocate the
  rest to their alternate bucket. Real filters loop evictions until every
  bucket fits; this set-semantics realization runs exactly one round —
  which empties every overfull primary bucket but can leave ~1% of
  alternate buckets one fingerprint over at load factor 0.5 (a soft
  capacity: the table is (bucket, fp) rows, not fixed slots; the bound is
  pinned in tests). The probe path — check fp in bucket i1 OR i2 — is the
  full cuckoo membership test either way, so an eviction-looping build
  would change only where fingerprints sit, not the probe plan. Unlike the Bloom filter
  (operators/bloom.py) a cuckoo filter supports deletion and counts, which
  is why the north rule names both; like the Bloom, no false negatives
  for inserted keys (pinned by a test), false positives possible and
  bit-reproduced by the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from crawler_spark.functions.hashing import hash60

# ---------------------------------------------------------------- HyperLogLog

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
# rest = hash60 div m has 60 - HLL_P = 54 usable bits; rho = 55 when rest == 0
HLL_RHO_MAX = 60 - HLL_P + 1
# fixed-point harmonic terms: 2^(30 - M_j), truncated to 0 beyond 30
HLL_FP_SHIFT = 30
# alpha_64 = 0.709 in millionths; NUM = alpha_micro * m^2 * 2^30 (one literal
# so neither engine multiplies 32-bit intermediates)
HLL_ALPHA_MICRO = 709_000
HLL_EST_NUM = HLL_ALPHA_MICRO * HLL_M * HLL_M * (1 << HLL_FP_SHIFT)


def hll_rho(rest: Column) -> Column:
    """1 + trailing zero count of ``rest`` (rho statistic), RHO_MAX for 0."""
    return F.when(rest == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.length(F.bin(rest.bitwiseAND(-rest)))
    )


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(register, rho_max): the mergeable HLL state over df[key_col].

    Empty registers are absent (merge with a 0..m-1 grid to densify).
    One shuffle: groupBy(register).max — partial max runs map-side, which
    is precisely the per-executor sketch merge a cluster performs.
    """
    h = hash60(F.col(key_col).cast("string"))
    reg = F.pmod(h, F.lit(HLL_M)).alias("register")
    rest = F.expr(f"{_h_sql(key_col)} div {HLL_M}")
    return (
        df.select(reg, hll_rho(rest).alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("rho_max"))
    )


def _h_sql(key_col: str) -> str:
    return f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"


def hll_summary(df: DataFrame, key_col: str) -> DataFrame:
    """One row: (m, n_zero_registers, z30, est_hll) — all exact integers.

    z30 = sum over ALL m registers of 2^(30 - M_j) with M_j = 0 for empty
    registers; est_hll = HLL_EST_NUM // z30 // 10^6 (raw HLL estimate in
    fixed point, no small-range correction — see module doc).
    """
    regs = hll_registers(df, key_col)
    grid = df.sparkSession.range(HLL_M).select(F.col("id").alias("register"))
    dense = grid.join(F.broadcast(regs), "register", "left").select(
        F.coalesce(F.col("rho_max"), F.lit(0)).alias("m_j")
    )
    term = F.when(
        F.col("m_j") <= HLL_FP_SHIFT,
        F.expr(f"shiftleft(1L, CAST({HLL_FP_SHIFT} - m_j AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    return dense.agg(
        F.lit(HLL_M).alias("m"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).alias("n_zero_registers"),
        F.sum(term).alias("z30"),
    ).select(
        "m",
        "n_zero_registers",
        "z30",
        F.expr(f"CAST({HLL_EST_NUM} AS BIGINT) div z30 div 1000000").alias("est_hll"),
    )


# ----------------------------------------------------------- count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_col(i: int, key: Column) -> Column:
    return F.pmod(hash60(F.concat_ws(":", F.lit(f"cms{i}"), key)), F.lit(CMS_WIDTH))


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """(row, col, c): depth x width counter matrix over key occurrences.

    Sums are order-independent and map-side combinable; two sketches merge
    by adding counters elementwise (pinned by a test).
    """
    key = F.col(key_col).cast("string")
    rows = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("row"), _cms_col(i, key).alias("col"))
            for i in range(CMS_DEPTH)
        ])
    ).alias("rc")
    return (
        df.select(rows)
        .select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_estimate(queries: DataFrame, sketch: DataFrame, key_col: str) -> DataFrame:
    """queries + (cms_est): min over depth rows of the addressed counters.

    The sketch side is tiny (<= depth*width rows) and broadcast; per query
    key the plan probes depth counters — no shuffle of the query side.
    """
    key = F.col(key_col).cast("string")
    probes = queries.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("row"), _cms_col(i, key).alias("col"))
                for i in range(CMS_DEPTH)
            ])
        ).alias("rc"),
    ).select(key_col, "rc.row", "rc.col")
    est = (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
    return queries.join(est, key_col, "left")


# ------------------------------------------------- cuckoo fingerprint filter

CUCKOO_M = 1 << 10  # buckets; power of two so i1 XOR g(fp) stays in range
CUCKOO_SLOTS = 4


def _fp(key: Column) -> Column:
    return F.lit(1) + F.pmod(hash60(F.concat(F.lit("fp:"), key)), F.lit(255))


def _i1(key: Column) -> Column:
    return F.pmod(hash60(F.concat(F.lit("cb:"), key)), F.lit(CUCKOO_M))


def _alt(bucket: Column, fp: Column) -> Column:
    return bucket.bitwiseXOR(
        F.pmod(hash60(F.concat(F.lit("fa:"), fp.cast("string"))), F.lit(CUCKOO_M))
    )


def cuckoo_build(df: DataFrame, key_col: str) -> DataFrame:
    """(bucket, fp) occupancy set after one deterministic relocation round.

    Distinct (i1, fp) pairs land in the primary bucket; buckets above
    CUCKOO_SLOTS keep the SLOTS smallest fingerprints (rank by fp —
    order-independent) and push the rest to the alternate bucket. See the
    module doc for why one round suffices at these load factors.
    """
    key = F.col(key_col).cast("string")
    prim = df.select(_i1(key).alias("bucket"), _fp(key).alias("fp")).distinct()
    rk = F.row_number().over(Window.partitionBy("bucket").orderBy("fp"))
    ranked = prim.withColumn("_rk", rk)
    stay = ranked.where(F.col("_rk") <= CUCKOO_SLOTS).select("bucket", "fp")
    moved = ranked.where(F.col("_rk") > CUCKOO_SLOTS).select(
        _alt(F.col("bucket"), F.col("fp")).alias("bucket"), "fp"
    )
    return stay.unionByName(moved).distinct()


def cuckoo_prune(candidates: DataFrame, table: DataFrame, key_col: str) -> DataFrame:
    """Candidate rows the filter reports POSSIBLY SEEN (fp in i1 or i2).

    Like bloom_prune: returned rows still need the exact check; rows NOT
    returned are guaranteed fresh (no false negatives for inserted keys).
    The occupancy table is fingerprint-sized (12 bits/key here) and
    broadcast; the probe explodes two buckets per candidate — candidate-
    sized work, the seen set never reshuffles.
    """
    key = F.col(key_col).cast("string")
    i1 = _i1(key)
    fp = _fp(key)
    probes = candidates.select(
        F.col(key_col),
        F.explode(F.array(i1, _alt(i1, fp))).alias("bucket"),
        fp.alias("fp"),
    )
    hits = (
        probes.join(F.broadcast(table), ["bucket", "fp"], "left_semi")
        .select(key_col)
        .distinct()
    )
    return candidates.join(hits, key_col, "left_semi")


def hll_summary_by(df: DataFrame, key_col: str, by_col: str) -> DataFrame:
    """Per-group HLL: (by, m, n_zero_registers, z30, est_hll) — the
    PARTITIONED form of hll_summary (distinct URLs per host, distinct
    words per source). Registers live per (group, register); densification
    joins each group against the 0..m-1 grid, so groups with few keys
    still cost exactly m rows of state. Same fixed-point estimate, same
    mergeability: per-partition sketches of the same group union by max.
    """
    h = hash60(F.col(key_col).cast("string"))
    rest = F.expr(f"{_h_sql(key_col)} div {HLL_M}")
    regs = (
        df.select(
            F.col(by_col).alias("by"),
            F.pmod(h, F.lit(HLL_M)).alias("register"),
            hll_rho(rest).alias("rho"),
        )
        .groupBy("by", "register")
        .agg(F.max("rho").alias("rho_max"))
    )
    groups = df.select(F.col(by_col).alias("by")).distinct()
    grid = groups.crossJoin(
        df.sparkSession.range(HLL_M).select(F.col("id").alias("register"))
    )
    dense = grid.join(regs, ["by", "register"], "left").select(
        "by", F.coalesce(F.col("rho_max"), F.lit(0)).alias("m_j")
    )
    term = F.when(
        F.col("m_j") <= HLL_FP_SHIFT,
        F.expr(f"shiftleft(1L, CAST({HLL_FP_SHIFT} - m_j AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        dense.groupBy("by")
        .agg(
            F.lit(HLL_M).alias("m"),
            F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).alias("n_zero_registers"),
            F.sum(term).alias("z30"),
        )
        .select(
            "by",
            "m",
            "n_zero_registers",
            "z30",
            F.expr(f"CAST({HLL_EST_NUM} AS BIGINT) div z30 div 1000000").alias("est_hll"),
        )
    )


# ------------------------------------------------ k-minimum-values sketch

# KMV (Bar-Yossef et al. 2002; Beyer et al. 2007 "distinct sampling") keeps
# the k smallest distinct hash values of a key set. Unlike HLL it supports
# SET OPERATIONS: the k smallest of (A union B) is computable from the two
# k-row sketches alone, and the fraction of that union sketch present in
# BOTH input sketches estimates Jaccard — giving union / intersection
# cardinality estimates between two crawls' URL-seen sets without ever
# co-scanning them (the cross-snapshot overlap question the reference's
# per-session visited sets, queue.py:35-77, cannot answer without a full
# join). Everything is int64: hashes are hash60, the estimator
# (HMAX div kth_min) * (k-1) and (n_both * est_union) div k are integer
# ops with identical semantics in Spark (`div`) and DuckDB (`//`), so the
# whole summary sits under the driver's value-hash gate.

KMV_K = 64
KMV_HMAX = 1 << 60  # hash60 values are uniform in [0, 2^60)


def kmv_sketch(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """k-row sketch: the k smallest distinct hash60 values of df[key_col].

    Plan: project to the hash, map-side-combinable distinct, then a
    sort-limit (per-partition top-k, single tiny merge) — the only full
    shuffle is the distinct on the 8-byte hash; text never travels. A
    production build at 10^10 keys would fold the distinct into the
    per-partition top-k with a bounded-heap Aggregator (state = k longs);
    the declarative form here has the same output and the same single
    shuffle, and duplicates cannot displace minima because the distinct
    runs first.
    """
    h = hash60(F.col(key_col).cast("string"))
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_merge(sk_a: DataFrame, sk_b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union sketch from two k-row sketches: k smallest of their union.

    Exact for the union set whenever each input sketch saw >= k distinct
    keys (the k smallest of A union B are all within the k smallest of A
    or of B) — the mergeability law a 1000-executor cluster relies on,
    pinned in tests/test_sketches.py.
    """
    return sk_a.unionByName(sk_b).distinct().orderBy("h").limit(k)


def kmv_estimate_expr(kth_col: str, k: int) -> Column:
    """est_distinct = (2^60 div kth_min) * (k-1), all int64 (module doc)."""
    return F.expr(f"(CAST({KMV_HMAX} AS BIGINT) div {kth_col}) * {k - 1}")


def kmv_overlap_summary(df_a: DataFrame, df_b: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """One row of exact integers estimating |A|, |B|, |A u B|, |A n B|.

    Columns: k, kth_a, est_a, kth_b, est_b, union_kth, est_union, n_both,
    est_intersection. n_both = how many of the union sketch's k values
    appear in BOTH input sketches; est_intersection = n_both * est_union
    div k (the KMV Jaccard estimator). All joins are on <= k-row frames —
    after the two sketch builds, cost is independent of input size.
    """
    sa = kmv_sketch(df_a, key_col, k)
    sb = kmv_sketch(df_b, key_col, k)
    su = kmv_merge(sa, sb, k)
    one = (
        su.join(F.broadcast(sa), "h", "semi")
        .join(F.broadcast(sb), "h", "semi")
        .agg(F.count("*").alias("n_both"))
    )
    agg_a = sa.agg(F.max("h").alias("kth_a"))
    agg_b = sb.agg(F.max("h").alias("kth_b"))
    agg_u = su.agg(F.max("h").alias("union_kth"))
    return (
        agg_u.crossJoin(F.broadcast(agg_a))
        .crossJoin(F.broadcast(agg_b))
        .crossJoin(F.broadcast(one))
        .select(
            F.lit(k).cast("long").alias("k"),
            "kth_a",
            kmv_estimate_expr("kth_a", k).alias("est_a"),
            "kth_b",
            kmv_estimate_expr("kth_b", k).alias("est_b"),
            "union_kth",
            kmv_estimate_expr("union_kth", k).alias("est_union"),
            "n_both",
            F.expr(
                f"(n_both * ((CAST({KMV_HMAX} AS BIGINT) div union_kth) * {k - 1})) div {k}"
            ).alias("est_intersection"),
        )
    )


# ------------------------------------------- sketch-pruned heavy hitters

def cms_heavy_hitters(df: DataFrame, key_col: str, phi_denom: int) -> DataFrame:
    """EXACT phi-heavy-hitters (count * phi_denom > n) via a CMS prune.

    The 10^10-frontier question "which hosts dominate the pending queue"
    cannot afford an exact count of every host: this is the classic
    two-pass sketch plan instead. Pass 1 builds the bounded count-min
    state (depth x width counters, map-side combinable — a full-stream
    aggregation with 1024 groups, not |keys|). Pass 2 probes the sketch
    PER ROW, MAP-SIDE: the depth counter rows are each broadcast and
    joined on the row's computed column index, the estimate is the least
    of the probed counters, and rows whose estimate clears the threshold
    are the only ones that ever reach the exact groupBy — the sole
    key-cardinality shuffle in the whole plan carries candidate
    occurrences only (no distinct over the key universe anywhere). CMS
    never underestimates, so cms_est * phi >= count * phi > n — the prune
    provably cannot drop a true heavy hitter (pinned in
    tests/test_sketches.py), which is why the final output is EXACT and
    sits under the value-hash oracle.
    """
    total = df.agg(F.count("*").alias("_n"))
    sketch = cms_build(df, key_col)
    key = F.col(key_col).cast("string")
    probed = df.select(F.col(key_col))
    est = None
    for i in range(CMS_DEPTH):
        si = sketch.where(F.col("row") == i).select(
            F.col("col").alias(f"_col{i}"), F.col("c").alias(f"_c{i}")
        )
        probed = probed.join(
            F.broadcast(si), _cms_col(i, key) == F.col(f"_col{i}"), "left"
        )
        ci = F.coalesce(F.col(f"_c{i}"), F.lit(0).cast("long"))
        est = ci if est is None else F.least(est, ci)
    return (
        probed.crossJoin(F.broadcast(total))
        .where(est * phi_denom > F.col("_n"))
        .groupBy(key_col)
        .agg(F.count("*").alias("freq"), F.max("_n").alias("_n"))
        .where(F.col("freq") * phi_denom > F.col("_n"))
        .select(key_col, "freq")
    )


# ------------------------------------------- bottom-k sample quantiles

BOTTOMK_K = 256


def bottomk_sample(df: DataFrame, key_col: str, value_col: str, k: int = BOTTOMK_K) -> DataFrame:
    """Uniform k-row sample: the rows whose hash60(key) ranks lowest
    (bottom-k sampling, Cohen & Kaplan PODC'07 — KMV's row-carrying
    sibling). Deterministic, coordinated across runs and engines, and
    MERGEABLE: the bottom-k of a union is within the union of each part's
    bottom-k, so per-partition top-k heaps compose exactly like KMV
    sketches. Plan: one narrow projection then sort-limit —
    TakeOrderedAndProject, i.e. a per-partition bounded heap and a single
    k*parts-row driver merge; no global sort, no full shuffle.

    Returns (hk, v): the sample's hash ranks and carried values.
    """
    return (
        df.select(
            hash60(F.col(key_col).cast("string")).alias("hk"),
            F.col(value_col).alias("v"),
        )
        # tie-break on the carried value: duplicate keys share one hk, and
        # which duplicate crosses the k-th boundary would otherwise be
        # engine- and run-dependent (the determinism contract above)
        .orderBy("hk", "v")
        .limit(k)
    )


def sample_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    percents: tuple[int, ...] = (25, 50, 75, 90),
    k: int = BOTTOMK_K,
) -> DataFrame:
    """Nearest-rank quantile estimates of ``value_col`` from a bottom-k
    uniform sample — the one-pass, mergeable scale path for the percentile
    questions the exact session_stats answers with a global sort (the
    reference computes session percentiles in memory,
    analytics/statistics.py; at a 10^10-row frontier only a sketch or a
    sample survives). Spark's own percentile_approx is a KLL variant whose
    internals no second engine reproduces; the bottom-k sample gives the
    same one-pass economics with a state that is bit-identical in DuckDB,
    so the ESTIMATE — sampling error included — sits under the driver's
    value-hash gate.

    For each p in ``percents``: est = sample value at rank
    ceil(p*m/100) (1-indexed nearest-rank, m = sample size, ties broken by
    hash rank so both engines pick the same row). Returns (pct, est_v),
    one row per requested percentile; all int64. Everything after the
    k-row sample is O(k) work on a broadcast-sized frame.
    """
    s = bottomk_sample(df, key_col, value_col, k)
    w = Window.orderBy("v", "hk")  # k rows at most: a single tiny partition
    ranked = s.select(
        "v",
        F.row_number().over(w).alias("r"),
        F.count("*").over(Window.partitionBy(F.lit(1))).alias("m"),
    )
    spark = df.sparkSession
    pcts = spark.createDataFrame([(int(p),) for p in percents], "pct long")
    return (
        ranked.join(
            F.broadcast(pcts),
            F.col("r") == F.expr("(pct * m + 99) div 100"),
        )
        .select("pct", F.col("v").cast("long").alias("est_v"))
        .orderBy("pct")
    )
