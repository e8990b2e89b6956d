"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k baseline + amplified LSH scale path.

Scale shape: brute-force is queries × corpus — fine when the query set
broadcasts (small side) and the corpus streams; the LSH path replaces
the cross product with a bucket equi-join.  Amplification is the
standard AND-OR construction: each of ``n_tables`` tables ANDs
``n_planes`` random-hyperplane sign bits into one bucket key (2^p
buckets per table), and candidates are pairs colliding in ANY table —
recall is tuned by n_tables, bucket width (and so the pair-join cost)
by n_planes.  At corpus scale, grow n_planes ≈ log2(n / target_bucket)
so expected bucket width stays constant; a single 4-plane table
(16 buckets total) would make the pair join O(n²/16), which is why the
defaults here are 8 planes × 2 tables and both are explicit knobs.

Planes are DETERMINISTIC integer pseudo-planes derived from the
embedding's own dimensionality — w[g, j] = ((g·D + j)·2654435761) %
97 − 48 with D = size(embedding), g the global plane index — so any
dim works (nothing hard-wires 64) and the SQL oracle reproduces the
signs exactly.  Dot products run as built-in ``zip_with``/``aggregate``
folds — JVM, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (vx, vy) -> cast(vx as double) * cast(vy as double)), 0D, (acc, vz) -> acc + vz)"
_NORM = "sqrt(aggregate({a}, 0D, (acc, vn) -> acc + cast(vn as double) * cast(vn as double)))"

N_PLANES = 8
N_TABLES = 2


def auto_n_planes(
    corpus_size: int, target_bucket: int = 64, min_planes: int = 4, max_planes: int = 24
) -> int:
    """The growth rule, automated: n_planes ≈ log2(n / target_bucket) so
    EXPECTED bucket width n / 2^p stays ≈ ``target_bucket`` as the
    corpus grows — 100× more vectors costs log2(100) ≈ 7 more planes,
    no manual retuning, and the per-table pair-join cost stays
    O(n · target_bucket) instead of drifting quadratic.  Clamped to
    [min_planes, max_planes] (beyond ~24 sign bits per table, recall
    for mid-similarity pairs needs more tables, not more planes).

    Pass the result to ``lsh_buckets``/``lsh_neighbor_pairs``; the
    driver-side ``corpus_size`` count is one cheap metadata-only action.
    """
    import math

    if corpus_size <= 0:
        return min_planes
    p = math.ceil(math.log2(max(corpus_size / max(target_bucket, 1), 1.0)))
    return max(min_planes, min(max_planes, p))


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


def lsh_buckets(
    embeddings: DataFrame, n_planes: int = N_PLANES, n_tables: int = N_TABLES
) -> DataFrame:
    """(vec_id, table_id, bucket): per AND-OR table, the bucket is the
    ``n_planes``-bit sign pattern of the deterministic pseudo-planes.
    Plane indices derive from ``size(embedding)`` — dim-agnostic; any
    dimension produces a full, valid bucketing (no silent null-padding).
    """
    bucket = F.expr(
        f"""
        transform(sequence(0, {n_tables - 1}), tt ->
          aggregate(
            transform(sequence(0, {n_planes - 1}), lp ->
              if(aggregate(zip_with(embedding,
                   sequence((tt * {n_planes} + lp) * size(embedding),
                            (tt * {n_planes} + lp) * size(embedding) + size(embedding) - 1),
                   (le, lj) -> cast(le as double) * cast((lj * 2654435761) % 97 - 48 as double)),
                   0D, (acc, lx) -> acc + lx) > 0D, shiftleft(1, lp), 0)),
            0, (acc2, lb) -> acc2 + lb))
        """
    )
    return (
        embeddings.select("vec_id", F.posexplode(bucket).alias("table_id", "bucket"))
        .select("vec_id", F.col("table_id").cast("int").alias("table_id"), "bucket")
    )


def lsh_neighbor_pairs(
    embeddings: DataFrame,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
    threshold: float = 0.2,
) -> DataFrame:
    """Candidate pairs collide in (table_id, bucket) for ANY table
    (OR over AND-ed sign bits), then exact cosine ≥ threshold verifies.
    One shuffle on the composite bucket key; no cross product."""
    b = lsh_buckets(embeddings, n_planes, n_tables)
    e = embeddings.select("vec_id", "embedding")
    a = b.select(F.col("vec_id").alias("id_a"), "table_id", "bucket")
    c = b.select(
        F.col("vec_id").alias("id_b"),
        F.col("table_id").alias("t2"),
        F.col("bucket").alias("b2"),
    )
    cand = (
        a.join(c, on=[a["table_id"] == c["t2"], a["bucket"] == c["b2"], a["id_a"] < c["id_b"]])
        .select("id_a", "id_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn(
            # round BEFORE thresholding so the SQL oracle (which sees
            # only 6dp) agrees on boundary values
            "cos",
            F.round(
                F.expr(_DOT.format(a="ea", b="eb"))
                / (F.expr(_NORM.format(a="ea")) * F.expr(_NORM.format(a="eb"))),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the amplified LSH path
    — works on unlabeled corpora (no label/metadata blocking; blocking
    is the signature itself).  At threshold ≥ 0.95 the two vectors'
    sign patterns agree on almost every plane, so recall through the
    bucket join is high by construction."""
    return lsh_neighbor_pairs(embeddings, n_planes, n_tables, threshold)
