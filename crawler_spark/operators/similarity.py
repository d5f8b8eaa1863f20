"""Embedding similarity search — brute-force cosine top-k and IVF-bucketed ANN.

Operates on a table shaped like the driver's ``embeddings`` parquet:
(vec_id:long, embedding:array<float>, label:int). All arithmetic is JVM-side
higher-order array expressions in DOUBLE precision (zip_with + aggregate),
summing left-to-right so the DuckDB oracle (list_transform + list_sum)
produces bit-identical sums; outputs expose only ids and ranks, never raw
floats, so value-hash comparison is float-safe.

Scale design:
- brute force is O(Q * N): fine when the query side is small (the corpus side
  streams; Catalyst broadcasts the query side). This is the baseline and the
  verification oracle.
- ``ivf_topk`` is the scale path: a coarse quantizer assigns every vector to
  its nearest centroid (small centroid table, broadcast), and search touches
  only the query's own cell — the cross join shrinks from N^2 to
  sum over cells of |cell|^2 / ~C. Centroids here are taken deterministically
  from the corpus (first ``n_centroids`` ids) instead of k-means so the
  oracle SQL can reproduce them exactly; on a real cluster the centroid table
  would come from a k-means job and the plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float-array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query row, the k nearest corpus rows.

    Returns (query_id, neighbor_id, rank), rank 1-based, self-matches
    excluded, ties broken by neighbor_id (deterministic).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest deterministic centroid (IVF cells).

    Centroids = the ``n_centroids`` smallest ids. Returns
    (vec_id, embedding, cell) where cell is the centroid id; argmin by cosine,
    ties to the smaller centroid id.
    """
    cent = vectors.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("_cent")
    )
    scored = vectors.crossJoin(F.broadcast(cent)).withColumn(
        "_sim", cosine(F.col(vec_col), F.col("_cent"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(id_col, vec_col, "cell")
    )


def embedding_neardup(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_blocked: bool = False,
    n_centroids: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: (vec_a, vec_b), a < b.

    Exact mode compares all pairs — the verification baseline, quadratic.
    ``cell_blocked=True`` is the scale path: candidates are limited to pairs
    sharing an IVF cell (ivf_assign), turning N^2 into sum-of-cell^2 at the
    cost of missing cross-cell pairs — the embedding analog of LSH banding.
    Output carries no float column so oracle value-hashing is exact.
    """
    if cell_blocked:
        assigned = ivf_assign(vectors, n_centroids, id_col, vec_col).localCheckpoint(
            eager=False
        )
        a = assigned.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"), "cell")
        b = assigned.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"), "cell")
        pairs = a.join(b, "cell").where(F.col("vec_a") < F.col("vec_b"))
    else:
        a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"))
        b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"))
        pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.where(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .select("vec_a", "vec_b")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: top-k within the query's own centroid cell.

    Returns (query_id, neighbor_id, rank). Approximate: recall vs brute force
    depends on the quantizer (nprobe=1 here); the join is cell-co-partitioned.
    """
    # materialized once: the assignment feeds both the query and corpus side
    assigned = ivf_assign(vectors, n_centroids, id_col, vec_col).localCheckpoint(eager=False)
    q = queries.select(F.col(id_col).alias("query_id")).join(
        assigned.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "cell"),
        "query_id",
    )
    c = assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "cell")
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
