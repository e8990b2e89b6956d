"""Entity-link scoring against the broadcast alias dictionary
(SURVEY.md §2.11 N1 — new per north_rule; no reference counterpart).

Tiers: exact alias match (weight 1.0) > casefolded (0.8) > lemma/stem
(0.6); score = tier_weight × prior; the winning entity per mention is
``max_by(entity_id, score)``; ties broken by entity_id for determinism;
mentions scoring below ``min_score`` stay unlinked (dropped).

Physical shape: mention table ⋈ **broadcast** alias dict (the dict is
small by construction; at 10¹² docs the dict is still the small side —
executors hash it once), then one hash agg per mention.  No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LEMMA = "array_join(transform(split({c}, ' '), lw -> if(length(lw) > 3 and endswith(lw, 's'), substring(lw, 1, length(lw) - 1), lower(lw))), ' ')"


def link_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    text_col: str = "text",
    min_score: float = 0.0,
) -> DataFrame:
    """mentions(+text) → linked mentions with (entity_id, canonical_name,
    link_score)."""
    a = alias_dict.select(
        "alias", "entity_id", "canonical_name", "prior",
        F.lower("alias").alias("alias_ci"),
        F.expr(_LEMMA.format(c="alias")).alias("alias_lemma"),
    )
    m = mentions.withColumn("_ci", F.lower(text_col)).withColumn(
        "_lemma", F.expr(_LEMMA.format(c=text_col))
    )
    joined = m.join(
        F.broadcast(a),
        on=[
            (m["_ci"] == a["alias_ci"]) | (m["_lemma"] == a["alias_lemma"])
        ],
        how="inner",
    ).withColumn(
        "link_score",
        F.when(F.col(text_col) == F.col("alias"), 1.0)
        .when(F.col("_ci") == F.col("alias_ci"), 0.8)
        .otherwise(0.6)
        * F.col("prior"),
    )
    best = (
        joined.groupBy("mention_id")
        .agg(
            F.expr("max_by(entity_id, struct(link_score, entity_id))").alias("entity_id"),
            F.expr("max_by(canonical_name, struct(link_score, entity_id))").alias("canonical_name"),
            F.max("link_score").alias("link_score"),
        )
        .filter(F.col("link_score") >= min_score)
    )
    return mentions.join(best, "mention_id")
