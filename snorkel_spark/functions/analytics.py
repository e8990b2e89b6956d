"""Label-matrix analytics (SURVEY.md §2.6 A4–A7).

Reference: ``csr_AnnotationMatrix.lf_stats`` computes per-LF coverage /
overlaps / conflicts / accuracy on a driver-side scipy CSR
(⚠ snorkel/annotations.py ~L100–160, reconstructed — SURVEY.md §0) —
the driver-memory wall SURVEY.md §3.1 calls out.  Here every statistic
is a DataFrame aggregation over the long-form matrix: two hash
aggregations and a broadcast-back join, fully distributed, O(1) driver
memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lf_stats(
    L: DataFrame,
    n_candidates: int,
    gold: DataFrame | None = None,
    lf_registry: DataFrame | None = None,
) -> DataFrame:
    """Per-LF coverage / overlaps / conflicts (+ accuracy when gold given).

    coverage  = P(λ_j ≠ 0)
    overlaps  = P(λ_j ≠ 0 ∧ ∃k≠j: λ_k ≠ 0)
    conflicts = P(λ_j ≠ 0 ∧ ∃k≠j: λ_k ∉ {0, λ_j})
    polarity  = set of emitted labels
    """
    per_cand = L.groupBy("candidate_id").agg(
        F.count("*").alias("n_labels"),
        F.countDistinct("label").alias("n_distinct"),
    )
    per_cand_label = L.groupBy("candidate_id", "label").agg(F.count("*").alias("n_same"))
    rows = (
        L.join(per_cand, "candidate_id")
        .join(per_cand_label, ["candidate_id", "label"])
        .withColumn("has_overlap", (F.col("n_labels") > 1).cast("int"))
        # conflicts: some other row has a different label ⇔ rows with my
        # label < total rows on this candidate
        .withColumn("has_conflict", (F.col("n_same") < F.col("n_labels")).cast("int"))
    )
    if gold is not None:
        g = gold.select("candidate_id", F.col("label").alias("gold_label"))
        rows = rows.join(g, "candidate_id", "left").withColumn(
            "is_correct", (F.col("label") == F.col("gold_label")).cast("int")
        )
    aggs = [
        F.count("*").alias("n_labeled"),
        (F.count("*") / F.lit(n_candidates)).alias("coverage"),
        (F.sum("has_overlap") / F.lit(n_candidates)).alias("overlaps"),
        (F.sum("has_conflict") / F.lit(n_candidates)).alias("conflicts"),
        F.sort_array(F.collect_set("label")).alias("polarity"),
    ]
    if gold is not None:
        aggs.append(F.avg("is_correct").alias("emp_accuracy"))
    out = rows.groupBy("lf_id").agg(*aggs)
    if lf_registry is not None:
        out = out.join(F.broadcast(lf_registry), "lf_id", "left")
    return out.orderBy("lf_id")


def candidate_coverage(L: DataFrame, n_candidates: int) -> DataFrame:
    """A5 corpus-level stats: how many candidates have ≥1 label, ≥2
    labels, conflicts (⚠ snorkel/learning/utils.py ~L60–120)."""
    per_cand = L.groupBy("candidate_id").agg(
        F.count("*").alias("n_labels"), F.countDistinct("label").alias("n_distinct")
    )
    return per_cand.agg(
        F.count("*").alias("n_labeled"),
        (F.count("*") / F.lit(n_candidates)).alias("frac_labeled"),
        F.sum((F.col("n_labels") > 1).cast("int")).alias("n_overlapped"),
        F.sum((F.col("n_distinct") > 1).cast("int")).alias("n_conflicted"),
    )


def label_balancer(
    candidates_with_label: DataFrame, fractions: dict[int, float], seed: int = 42
) -> DataFrame:
    """A6 ``LabelBalancer`` (⚠ snorkel/learning/utils.py ~L120–180):
    seeded stratified subsample to a target class ratio."""
    return candidates_with_label.sampleBy("label", fractions, seed)


def filter_unlabeled(candidates: DataFrame, L: DataFrame) -> DataFrame:
    """A7: drop all-abstain candidates before training (tutorial idiom) —
    a left-semi join, no data movement of the wide side beyond the hash."""
    return candidates.join(
        L.select("candidate_id").distinct(), "candidate_id", "left_semi"
    )
