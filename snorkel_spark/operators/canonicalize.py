"""Canonicalization + triple materialization with salted two-phase
aggregation (SURVEY.md §2.11 N2/N3/N5 — new per north_rule).

Triples: candidates above the marginal threshold, joined with their
linked subj/obj entities, aggregated to (subj, pred, obj) with max
probability and top-k evidence.

Skew (north_rule explicitly): high-frequency entities make the triple
key skewed.  AQE's skew handling covers joins but NOT groupBy, so the
aggregation is **salted two-phase**: partial agg on
(key, salt = pmod(xxhash64(candidate_id), n_salts)), then final agg on
key.  For the commutative/associative aggregates used here (count, max,
bounded evidence lists) the two-phase result is exactly the one-phase
result — asserted by the skew test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_triples(
    candidates: DataFrame,
    marginals: DataFrame,
    subj_links: DataFrame,
    obj_links: DataFrame,
    pred: str = "spouse_of",
    threshold: float = 0.5,
    evidence_k: int = 5,
    n_salts: int = 0,
) -> DataFrame:
    """candidates ⋈ marginals(≥τ) ⋈ links → (subj, pred, obj, prob,
    n_evidence, evidence).

    ``subj_links``/``obj_links``: (candidate_id, entity_id) for each slot
    (from linker.link_mentions on the slot mentions).
    ``n_salts=0`` → plain two-phase hash agg (Spark's partial+final);
    ``n_salts>0`` → explicit salting for skewed keys.
    """
    probs = marginals.select("candidate_id", "prob_true").filter(F.col("prob_true") > threshold)
    base = (
        candidates.select("candidate_id", "doc_id", "sentence_id")
        .join(probs, "candidate_id")
        .join(subj_links.select("candidate_id", F.col("entity_id").alias("subj")), "candidate_id")
        .join(obj_links.select("candidate_id", F.col("entity_id").alias("obj")), "candidate_id")
        .withColumn("pred", F.lit(pred))
    )
    ev = F.struct("doc_id", "sentence_id", "candidate_id")
    if n_salts and n_salts > 1:
        partial = (
            base.withColumn("_salt", F.pmod(F.xxhash64("candidate_id"), F.lit(n_salts)))
            .groupBy("subj", "pred", "obj", "_salt")
            .agg(
                F.max("prob_true").alias("prob"),
                F.count("*").alias("n_evidence"),
                F.slice(F.sort_array(F.collect_list(ev)), 1, evidence_k).alias("evidence"),
            )
        )
        return (
            partial.groupBy("subj", "pred", "obj")
            .agg(
                F.max("prob").alias("prob"),
                F.sum("n_evidence").alias("n_evidence"),
                F.slice(F.sort_array(F.flatten(F.collect_list("evidence"))), 1, evidence_k).alias(
                    "evidence"
                ),
            )
        )
    return base.groupBy("subj", "pred", "obj").agg(
        F.max("prob_true").alias("prob"),
        F.count("*").alias("n_evidence"),
        F.slice(F.sort_array(F.collect_list(ev)), 1, evidence_k).alias("evidence"),
    )


def triple_prf(emitted: DataFrame, gold: DataFrame) -> dict:
    """P/R of emitted (subj, pred, obj) sets vs gold — the north_rule
    acceptance gate (≥0.95 both)."""
    e = emitted.select("subj", "pred", "obj").distinct()
    g = gold.select("subj", "pred", "obj").distinct()
    tp = e.join(g, ["subj", "pred", "obj"], "left_semi").count()
    ne, ng = e.count(), g.count()
    prec = tp / ne if ne else 0.0
    rec = tp / ng if ng else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "n_emitted": ne, "n_gold": ng, "precision": prec, "recall": rec, "f1": f1}
