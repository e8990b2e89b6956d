"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k baseline + LSH-bucketed scale path.

Scale shape: brute-force is queries × corpus — fine when the query set
broadcasts (small side) and the corpus streams; the LSH path replaces
the cross product with a bucket equi-join (random-hyperplane signs),
trading recall for a shuffle-free candidate set.  Dot products run as
built-in ``zip_with``/``aggregate`` folds — JVM, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (vx, vy) -> cast(vx as double) * cast(vy as double)), 0D, (acc, vz) -> acc + vz)"
_NORM = "sqrt(aggregate({a}, 0D, (acc, vn) -> acc + cast(vn as double) * cast(vn as double)))"


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 3
) -> DataFrame:
    """Brute-force top-k cosine neighbors for each query vector.

    (query_id, neighbor_id, rank, cos rounded 6dp); self-matches
    excluded; ties broken by neighbor_id ascending.
    """
    from pyspark.sql.window import Window

    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="qe", b="ce"))
            / (F.expr(_NORM.format(a="qe")) * F.expr(_NORM.format(a="ce"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def lsh_buckets(embeddings: DataFrame, n_planes: int = 4) -> DataFrame:
    """Random-hyperplane LSH with DETERMINISTIC integer pseudo-planes
    (w[p,j] = ((p·64 + j)·2654435761) % 97 − 48) so the SQL oracle can
    reproduce the signs exactly.  (vec_id, bucket 0..2^p−1)."""
    bucket = F.expr(
        f"""
        aggregate(
          transform(sequence(0, {n_planes - 1}), lp ->
            if(aggregate(zip_with(embedding, sequence(lp * 64, lp * 64 + 63),
                 (le, lj) -> cast(le as double) * cast((lj * 2654435761) % 97 - 48 as double)),
                 0D, (acc, lx) -> acc + lx) > 0D, shiftleft(1, lp), 0)),
          0, (acc2, lb) -> acc2 + lb)
        """
    )
    return embeddings.select("vec_id", bucket.alias("bucket"))


def lsh_neighbor_pairs(embeddings: DataFrame, n_planes: int = 4, threshold: float = 0.2) -> DataFrame:
    """Bucket-join candidate pairs verified by exact cosine ≥ threshold."""
    b = lsh_buckets(embeddings, n_planes)
    withb = embeddings.join(b, "vec_id")
    a = withb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), "bucket")
    c = withb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
                     F.col("bucket").alias("bucket2"))
    return (
        a.join(c, on=[a["bucket"] == c["bucket2"], a["id_a"] < c["id_b"]])
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="ea", b="eb"))
            / (F.expr(_NORM.format(a="ea")) * F.expr(_NORM.format(a="eb"))),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed by label to bound
    the quadratic term (the dedup-stack entry; same shape as LSH verify)."""
    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
                          F.col("label").alias("la"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
                          F.col("label").alias("lb"))
    return (
        a.join(b, on=[a["la"] == b["lb"], a["id_a"] < b["id_b"]])
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="ea", b="eb"))
            / (F.expr(_NORM.format(a="ea")) * F.expr(_NORM.format(a="eb"))),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
