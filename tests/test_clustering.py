"""Exact quantized k-means: equality vs an independent integer numpy twin.

The registry's DuckDB oracle unrolls exactly n_iter=2; this suite pins the
general loop (any n_iter / k) against a from-scratch numpy implementation
of the same integer algorithm, so the Spark operator can't drift from the
spec the oracle encodes.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from crawler_spark.operators.clustering import (
    KMEANS_OFFSET,
    KMEANS_SCALE,
    cluster_sizes,
    kmeans,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, vecs, k, n_iter):
    """The same algorithm in pure numpy int64: floor-quantize, Lloyd with
    integer squared distance (tie -> smaller ordinal), truncating-division
    centroid means. Written independently of the Spark code."""
    q = np.floor(vecs.astype(np.float64) * KMEANS_SCALE).astype(np.int64) + KMEANS_OFFSET
    order = np.argsort(ids)
    cent = {c: q[order[c]].copy() for c in range(k)}  # ordinal -> centroid
    for it in range(n_iter + 1):
        ordinals = sorted(cent)  # empty ordinals vanish, like the Spark update
        mat = np.stack([cent[c] for c in ordinals])
        d2 = ((q[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
        # argmin takes the first index on ties == smallest remaining ordinal
        assign = np.array(ordinals)[d2.argmin(axis=1)]
        if it == n_iter:
            break
        cent = {
            c: q[assign == c].sum(axis=0) // int((assign == c).sum())
            for c in ordinals
            if (assign == c).any()
        }
    return dict(zip(ids.tolist(), assign.tolist()))


@pytest.fixture(scope="module")
def emb_table():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    return ids, vecs


@pytest.mark.parametrize("k,n_iter", [(4, 3), (8, 1), (6, 5)])
def test_kmeans_matches_numpy_reference(spark, emb_table, k, n_iter):
    ids, vecs = emb_table
    expected = _numpy_kmeans(ids, vecs, k, n_iter)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), k=k, n_iter=n_iter
        ).collect()
    }
    assert got == expected


def test_kmeans_total_and_sizes(spark, emb_table):
    ids, _ = emb_table
    fit = kmeans(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), k=8, n_iter=2)
    rows = fit.collect()
    assert len(rows) == len(ids) and len({r["vec_id"] for r in rows}) == len(ids)
    assert all(0 <= r["cluster"] < 8 for r in rows)
    sizes = {r["cluster"]: r["n_members"] for r in cluster_sizes(fit).collect()}
    assert sum(sizes.values()) == len(ids)
    # numpy twin guarantees non-degenerate clustering on this corpus; a
    # single giant cluster would mean the quantized distances collapsed
    assert len(sizes) > 1


def test_empty_cluster_drops_deterministically(spark):
    """A k larger than the distinct-point count must still terminate and
    cover every vector (empty ordinals vanish, per the docstring)."""
    import pyspark.sql.functions as F

    base = spark.range(6).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 2).cast("float"), F.lit(0.0).cast("float")
        ).alias("embedding"),
    )
    out = kmeans(base, k=4, n_iter=2).collect()
    assert len(out) == 6
    assert len({r["cluster"] for r in out}) <= 2


def test_quantized_topk_zero_vector_ranks_last(spark):
    # A vector that quantizes to all zeros must never become anyone's
    # nearest neighbor (0/0 would be NaN, which Spark sorts ABOVE real
    # cosines in a descending window).
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import quantized_cosine_topk

    rows = [
        (0, [1000.0, 0.0, 0.0, 0.0]),       # sets the global amax
        (1, [900.0, 10.0, 0.0, 0.0]),
        (2, [800.0, -20.0, 0.0, 0.0]),
        (3, [1.0, 1.0, 1.0, 1.0]),           # quantizes to all zeros
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = quantized_cosine_topk(emb, lambda c: c < 3, k=2)
    got = {(r.query_id, r.rank): r.neighbor_id for r in top.collect()}
    # vector 3 must be everyone's LAST candidate, never rank 1
    assert all(got[(q, 1)] != 3 for q in (0, 1, 2)), got


def test_semdedup_keepset_consistent_with_pair_view(spark):
    """semdedup_keepset must equal the pair view: a vector is dropped
    exactly when it appears as the HIGHER id of a semantic_neardup pair
    (same fit, same threshold); the lowest id of every cluster is always
    kept, and keepset covers every input vector exactly once."""
    from crawler_spark.operators.clustering import semantic_neardup, semdedup_keepset

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    keep = semdedup_keepset(emb, threshold=0.4, k=8, n_iter=2).collect()
    pairs = semantic_neardup(emb, threshold=0.4, k=8, n_iter=2).collect()
    dropped_expected = {r["vec_b"] for r in pairs}
    got_dropped = {r["vec_id"] for r in keep if not r["keep"]}
    assert got_dropped == dropped_expected
    assert len(keep) == emb.count()
    by_cluster = {}
    for r in keep:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r["vec_id"])
        assert lowest["keep"]


def test_cosine_zero_vector_never_ranks_first(spark):
    """A zero-norm vector must yield NULL cosine (sorted last, fails any
    threshold) — NOT NaN, which Spark ranks ABOVE every real value in a
    descending window."""
    from crawler_spark.operators.similarity import cosine_topk, embedding_neardup

    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
        (3, [0.0, 0.0]),  # the zero vector
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = cosine_topk(df, df.where("vec_id = 0"), k=1)
    assert [(r["neighbor_id"]) for r in top.collect()] == [1]  # not 3
    pairs = {(r["vec_a"], r["vec_b"]) for r in
             embedding_neardup(df, threshold=0.5).collect()}
    assert all(3 not in p for p in pairs)  # NULL fails >= threshold


def test_ivf_handles_offset_ids_and_external_queries(spark):
    """Centroids are the n smallest ids (not ids < n), and queries are
    scored by their OWN vectors — offset id spaces and out-of-corpus
    queries both work instead of silently returning empty."""
    from crawler_spark.operators.similarity import ivf_assign, ivf_topk

    rows = [(1000 + i, [float(i % 4 == 0), float(i % 4 == 1),
                        float(i % 4 == 2), float(i % 4 == 3)])
            for i in range(16)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned = ivf_assign(df, n_centroids=4)
    assert assigned.count() == 16  # old `id < 4` selected no centroids
    # out-of-corpus query id/vector: still gets neighbors from its cell
    q = spark.createDataFrame([(9999, [1.0, 0.0, 0.0, 0.0])],
                              ["vec_id", "embedding"])
    got = ivf_topk(df, q, n_centroids=4, k=3).collect()
    assert len(got) == 3
    assert all(r["query_id"] == 9999 for r in got)


def test_srp_neardup_rejects_wrong_dim(spark):
    """A vector dim that disagrees with the dim parameter must raise, not
    silently degenerate the LSH to a quadratic self-join (every dot NULL ->
    every signature identical)."""
    import pytest

    from crawler_spark.operators.similarity import srp_neardup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], ["vec_id", "embedding"]
    )
    # surfaces as Py4JJavaError from the JVM raise_error; match the message
    with pytest.raises(Exception, match="srp_neardup"):
        srp_neardup(df, dim=64).collect()
