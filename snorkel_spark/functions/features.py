"""Feature annotation (SURVEY.md §2.6 A2).

Reference: ``FeatureAnnotator`` runs treedlib feature templates over
candidates and stores ``(candidate, key, value)`` rows
(⚠ snorkel/annotations.py::FeatureAnnotator ~L260–300, reconstructed —
SURVEY.md §0).  treedlib needs dependency parses (unavailable offline),
so the feature templates here are the surface-form subset: between-token
unigrams/bigrams, span word shapes, inverted flag, token-distance
bucket — emitted in the same long sparse form the label matrix uses.

Pure built-in expressions: the template expansion is a computed-array
explode, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def featurize_candidates(candidates: DataFrame) -> DataFrame:
    """candidates → long-form (candidate_id, feature string, value=1)."""
    feats = F.expr(
        """
        concat(
          transform(tokens_between, fb -> concat('BTW_', fb)),
          transform(
            slice(tokens_between, 1, greatest(size(tokens_between) - 1, 0)),
            (fb, fj) -> concat('BTW_BI_', fb, '_', element_at(tokens_between, fj + 2))),
          array(concat('DIST_', least(cast(size(tokens_between) / 3 as int), 5))),
          array(concat('SUBJ_SHAPE_', regexp_replace(subj_text, '[0-9]', '#'))),
          array(concat('OBJ_SHAPE_', regexp_replace(obj_text, '[0-9]', '#')))
        )
        """
    )
    return (
        candidates.select("candidate_id", F.explode(feats).alias("feature"))
        .withColumn("value", F.lit(1))
        .dropDuplicates(["candidate_id", "feature"])
    )


def feature_vectors(candidates: DataFrame) -> DataFrame:
    """(candidate_id, features array<string>) — the discriminative
    model's input shape."""
    return (
        featurize_candidates(candidates)
        .groupBy("candidate_id")
        .agg(F.sort_array(F.collect_list("feature")).alias("features"))
    )
