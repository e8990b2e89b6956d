"""A2 feature annotator + D3 noise-aware discriminative model."""

import pyspark.sql.functions as F


def test_featurize(candidates):
    from snorkel_spark.functions.features import featurize_candidates

    f = featurize_candidates(candidates)
    # pat0 candidates: between = ['married'] → BTW_married present
    pat0 = candidates.filter("cast(doc_id as bigint) % 3 = 0").select("candidate_id")
    hit = f.join(pat0, "candidate_id").filter("feature = 'BTW_married'")
    assert hit.count() == pat0.count()
    shapes = f.filter("feature like 'SUBJ_SHAPE_%'").select("feature").distinct().collect()
    assert all("#" in r["feature"] for r in shapes)


def test_noise_aware_lr(spark, candidates, label_matrix, gold):
    from snorkel_spark.functions.features import feature_vectors
    from snorkel_spark.labelmodel.discriminative import predict_lr, train_noise_aware_lr
    from snorkel_spark.labelmodel.model import majority_vote, score_marginals

    fv = feature_vectors(candidates).cache()
    mv = majority_vote(label_matrix)
    model, tf = train_noise_aware_lr(fv, mv)
    preds = predict_lr(model, tf, fv)
    sc = score_marginals(preds, gold.select("candidate_id", "label"))
    # the discriminative model must recover the planted signal from
    # surface features (BTW_married / BTW_brother are fully separating)
    assert sc["precision"] >= 0.95 and sc["recall"] >= 0.95, sc
