"""Noise-aware discriminative model (SURVEY.md §2.8 D1/D3).

Reference: ``TFNoiseAwareModel``/``SparseLogisticRegression`` train a
discriminative classifier against the label model's MARGINALS (the
noise-aware cross-entropy of the VLDB'18 pipeline)
(⚠ snorkel/learning/disc_learning.py ~L1–250,
⚠ snorkel/learning/disc_models/logistic_regression.py ~L200,
reconstructed — SURVEY.md §0).  The RNN variants are out of scope
offline (no torch/TF); the logistic-regression path maps directly onto
``pyspark.ml``:

- features: hashed sparse vectors from the A2 feature annotator
  (``HashingTF`` over the feature-string array — the standard
  feature-hashing trick, no global vocabulary build);
- noise-aware loss: ``LogisticRegression(weightCol=...)`` over
  *duplicated* examples — each candidate contributes (y=1, w=p) and
  (y=0, w=1−p), which is exactly the expected cross-entropy over the
  marginal distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_noise_aware_lr(
    candidates_features: DataFrame,
    marginals: DataFrame,
    n_hash_features: int = 1 << 14,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """(candidate_id, features array<string>) × (candidate_id,
    prob_true) → fitted pyspark.ml LogisticRegressionModel + the
    assembled training frame.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    base = candidates_features.join(
        marginals.select("candidate_id", "prob_true"), "candidate_id"
    )
    tf = HashingTF(inputCol="features", outputCol="fv", numFeatures=n_hash_features)
    vec = tf.transform(base)
    pos = vec.select("fv", F.lit(1.0).alias("label"), F.col("prob_true").alias("weight"))
    neg = vec.select("fv", F.lit(0.0).alias("label"), (1.0 - F.col("prob_true")).alias("weight"))
    train = pos.unionByName(neg).filter(F.col("weight") > 1e-6)
    lr = LogisticRegression(
        featuresCol="fv", labelCol="label", weightCol="weight",
        regParam=reg_param, maxIter=max_iter, standardization=False,
    )
    model = lr.fit(train)
    return model, tf


def predict_lr(model, tf, candidates_features: DataFrame) -> DataFrame:
    """(candidate_id, features) → (candidate_id, prob_true) from the
    discriminative model (generalizes past LF coverage — the point of
    the discriminative stage in the reference pipeline)."""
    from pyspark.ml.functions import vector_to_array

    vec = tf.transform(candidates_features)
    out = model.transform(vec)
    return out.select(
        "candidate_id",
        F.element_at(vector_to_array("probability"), 2).alias("prob_true"),
    )
