"""Similarity search over embedding columns (`array<float>`).

Beyond-reference surface (BASELINE.json): brute-force cosine top-k as
the correctness baseline, plus a bucketed (IVF-style) variant as the
scale path.

Scale design (100 TB):
  * Brute force is O(Q x N) — correct baseline, only viable when the
    query set is small: queries are BROADCAST, the corpus streams
    through a map-only stage, and top-k is a per-query window (shuffle
    of Q x N candidate rows; at scale, pre-reduce with a per-partition
    top-k before the window).
  * IVF: restrict the join to a coarse partition (here: the stored
    `label` as the cluster id; in production, a trained k-means
    assignment column written at ingest). The candidate set shrinks by
    the number of clusters, and the join becomes an equi-join on the
    cluster key — skew handled by AQE.

The dot product folds LEFT-TO-RIGHT (`aggregate` over `zip_with`) so
the float result is bit-reproducible against the DuckDB oracle's
equivalent sequential fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def knn_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Queries (small) are broadcast; corpus side never shuffles until
    the final per-query top-k window.
    """
    from pyspark.sql import Window as W

    # Self-norms are computed ONCE per row (N x D work), not once per
    # pair (Q x N x D) — same sequential fold, so the doubles are
    # bit-identical to folding inside the pair stage.
    vecs = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nv", dot(F.col("vec"), F.col("vec")))
    queries = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nv").alias("nq"),
    )
    cand = (
        vecs.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot(F.col("qvec"), F.col("vec"))
                / (F.sqrt(F.col("nq")) * F.sqrt(F.col("nv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    # One shuffle: the per-query top-k window moves Q x N scored rows
    # of 3 columns. NB a two-stage "local top-k" via a second window
    # keyed on (query, partition_id) does NOT help — window functions
    # hash-partition their input, so it would ADD a full shuffle, not
    # remove one. True map-side truncation needs RDD aggregateByKey
    # with a bounded heap; reach for it only when Q x N x 24 bytes
    # exceeds comfortable shuffle volume.
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def knn_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: probe only the query's own coarse cluster.

    The equi-join on the cluster key replaces the cross join — this is
    the 100 TB path (candidates shrink by ~n_clusters; the cluster
    assignment is computed once at ingest)."""
    from pyspark.sql import Window as W

    vecs = embeddings.select(
        F.col(id_col),
        F.col(cluster_col).alias("cluster"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nv", dot(F.col("vec"), F.col("vec")))
    queries = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("cluster").alias("qcluster"),
        F.col("vec").alias("qvec"),
        F.col("nv").alias("nq"),
    )
    cand = (
        vecs.join(
            F.broadcast(queries),
            (F.col("cluster") == F.col("qcluster"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot(F.col("qvec"), F.col("vec"))
                / (F.sqrt(F.col("nq")) * F.sqrt(F.col("nv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
