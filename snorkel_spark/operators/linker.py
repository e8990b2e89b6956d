"""Entity-link scoring against the broadcast alias dictionary
(SURVEY.md §2.11 N1 — new per north_rule; no reference counterpart).

Tiers: exact alias match (weight 1.0) > casefolded (0.8) > lemma/stem
(0.6); score = tier_weight × prior; winner per mention =
``max_by(entity_id, (score, entity_id))`` (prior-weighted, ties broken
by entity_id for determinism); below ``min_score`` stays unlinked.

Physical shape — the part that matters at 10¹² docs:
- an OR of equality conditions would force a BroadcastNestedLoopJoin
  (mentions × dict rows); instead we run TWO broadcast **hash** joins
  (casefold key, lemma key) and union — each probe is O(1);
- the only shuffle is the per-mention ``max_by`` hash aggregation on
  mention_id (uniform key, map-side partial aggregation applies);
- for candidate/triple linking, scores depend only on the TEXT, so
  ``link_text_map`` resolves each distinct matched text once (bounded
  by dictionary size → tiny → broadcast back) — zero shuffle on the
  big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LEMMA = "array_join(transform(split({c}, ' '), lw -> if(length(lw) > 3 and endswith(lw, 's'), substring(lw, 1, length(lw) - 1), lower(lw))), ' ')"


def _prepared_aliases(alias_dict: DataFrame) -> DataFrame:
    return alias_dict.select(
        "alias", "entity_id", "canonical_name", "prior",
        F.lower("alias").alias("alias_ci"),
        F.expr(_LEMMA.format(c="alias")).alias("alias_lemma"),
    )


def _scored_matches(m: DataFrame, alias_dict: DataFrame, text_col: str) -> DataFrame:
    """Union of two broadcast hash joins (ci key, lemma key) with the
    tiered score column attached."""
    a = _prepared_aliases(alias_dict)
    m = m.withColumn("_ci", F.lower(text_col)).withColumn(
        "_lemma", F.expr(_LEMMA.format(c=text_col))
    )
    score = (
        F.when(F.col(text_col) == F.col("alias"), 1.0)
        .when(F.col("_ci") == F.col("alias_ci"), 0.8)
        .otherwise(0.6)
        * F.col("prior")
    ).alias("link_score")
    j_ci = m.join(F.broadcast(a), on=[m["_ci"] == a["alias_ci"]]).select(*m.columns, "alias", "entity_id", "canonical_name", "prior")
    j_lem = m.join(F.broadcast(a), on=[m["_lemma"] == a["alias_lemma"]]).select(*m.columns, "alias", "entity_id", "canonical_name", "prior")
    both = j_ci.unionByName(j_lem)
    a2 = both.withColumn("alias_ci", F.lower("alias")).withColumn("link_score", score)
    return a2


def _best_links(
    mentions: DataFrame, alias_dict: DataFrame, text_col: str, min_score: float
) -> DataFrame:
    """(mention_id, entity_id, canonical_name, link_score): the winning
    link per mention — the shared aggregation of both link entry
    points."""
    scored = _scored_matches(mentions, alias_dict, text_col)
    return (
        scored.groupBy("mention_id")
        .agg(
            F.expr("max_by(entity_id, struct(link_score, entity_id))").alias("entity_id"),
            F.expr("max_by(canonical_name, struct(link_score, entity_id))").alias("canonical_name"),
            F.max("link_score").alias("link_score"),
        )
        .filter(F.col("link_score") >= min_score)
    )


def link_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    text_col: str = "text",
    min_score: float = 0.0,
) -> DataFrame:
    """mentions → mentions + (entity_id, canonical_name, link_score)."""
    best = _best_links(mentions, alias_dict, text_col, min_score)
    return mentions.join(best, "mention_id")


def link_text_map(
    texts: DataFrame, alias_dict: DataFrame, text_col: str = "text", min_score: float = 0.0
) -> DataFrame:
    """Distinct text values → best (entity_id, canonical_name, score).

    ``texts`` should be the distinct matched texts (bounded by the
    dictionary, so the result broadcasts).  Use for candidate-slot /
    triple linking: join candidates on subj_text/obj_text with
    ``F.broadcast`` of this map — no shuffle of the candidate table.
    """
    t = texts.select(F.col(text_col).alias("__t")).distinct().withColumn("mention_id", F.col("__t"))
    # mention_id IS the distinct text here, so the winning-link
    # aggregate already carries every output column — the join-back to
    # ``t`` that link_mentions does for real mention tables would be an
    # identity inner join (guide §2.4: drop it).
    best = _best_links(t, alias_dict, text_col="__t", min_score=min_score)
    return best.select(
        F.col("mention_id").alias(text_col), "entity_id", "canonical_name", "link_score"
    )
