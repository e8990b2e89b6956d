"""End-to-end pipeline: P/R ≥ 0.95 vs planted gold, checkpoint/resume,
salted == unsalted aggregation (north_rule gates)."""

import pyspark.sql.functions as F
import pytest

from snorkel_spark.operators.canonicalize import triple_prf
from snorkel_spark.plans.pipeline import run_kg_pipeline
from snorkel_spark.storage import Catalog
from tests.conftest import SF


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    cat = Catalog(str(tmp_path_factory.mktemp("warehouse")))
    info = run_kg_pipeline(spark, SF, cat)
    return cat, info


def test_triple_prf_gate(spark, pipeline_run):
    from snorkel_spark.sources import fixtures as FX

    cat, info = pipeline_run
    gt = FX.gold_triples(spark, SF)
    prf = triple_prf(info["triples_df"], gt)
    assert prf["precision"] >= 0.95, prf
    assert prf["recall"] >= 0.95, prf


def test_marginal_agreement_gate(spark, pipeline_run):
    """Label-model decisions vs the NumPy-oracle stand-in (P/R ≥ 0.95).

    Until /root/reference is populated (SURVEY.md §0) the oracle twin is
    the agreement target; at M0 this swaps to true reference marginals.
    """
    from snorkel_spark.labelmodel.model import score_marginals
    from snorkel_spark.sources import fixtures as FX

    cat, info = pipeline_run
    marg = cat.read(spark, "marginals")
    gold = FX.gold_labels(spark, SF)
    sc = score_marginals(marg, gold)
    assert sc["precision"] >= 0.95 and sc["recall"] >= 0.95, sc


def test_lineage_and_metrics_written(pipeline_run):
    cat, info = pipeline_run
    stages = {r["stage"] for r in cat.lineage()}
    assert {"sentences", "candidates", "label_matrix", "marginals", "triples"} <= stages
    met = cat.metrics()
    assert len(met) > 0
    assert {"stage", "partition_id", "output_rows", "wall_ms"} <= set(met[0])


def test_resume_skips_completed_stages(spark, pipeline_run):
    cat, info = pipeline_run
    info2 = run_kg_pipeline(spark, SF, cat)
    assert set(info2["skipped"]) == {
        "sentences", "candidates", "label_matrix", "marginals", "triples"
    }
    # identical triples after resume
    t1 = info["triples_df"].select("subj", "pred", "obj", "n_evidence")
    t2 = info2["triples_df"].select("subj", "pred", "obj", "n_evidence")
    assert t1.exceptAll(t2).count() == 0 and t2.exceptAll(t1).count() == 0


def test_partial_run_then_resume(spark, tmp_path_factory):
    """Kill-after-checkpoint: run through label_matrix only, then full —
    early stages must be skipped (north_rule resumability)."""
    cat = Catalog(str(tmp_path_factory.mktemp("warehouse2")))
    run_kg_pipeline(spark, SF, cat, stop_after="label_matrix")
    assert {r["stage"] for r in cat.lineage()} == {"sentences", "candidates", "label_matrix"}
    info = run_kg_pipeline(spark, SF, cat)
    assert {"sentences", "candidates", "label_matrix"} <= set(info["skipped"])
    assert "triples" not in info["skipped"]


def test_salted_equals_unsalted(spark, pipeline_run):
    cat, info = pipeline_run
    cat2 = Catalog(cat.root + "_salted")
    info2 = run_kg_pipeline(spark, SF, cat2, n_salts=8)
    cols = ["subj", "pred", "obj", "prob", "n_evidence"]
    t1 = info["triples_df"].select(*cols)
    t2 = info2["triples_df"].select(*cols)
    assert t1.exceptAll(t2).count() == 0 and t2.exceptAll(t1).count() == 0


def test_pipeline_full_parser_variant(spark, tmp_path_factory):
    """run_kg_pipeline(parser='full') runs the real splitter/tokenizer
    end-to-end: on the clean (punctuation-free) corpus it emits exactly
    the whitespace path's triples, and its sentences snapshot is keyed
    by a DIFFERENT config hash (the two parsers never alias on resume)."""
    from snorkel_spark.sources import fixtures as FX
    from snorkel_spark.operators.canonicalize import triple_prf

    cat = Catalog(str(tmp_path_factory.mktemp("warehouse_fullparse")))
    info = run_kg_pipeline(spark, SF, cat, parser="full")
    gt = FX.gold_triples(spark, SF)
    prf = triple_prf(info["triples_df"], gt)
    assert prf["precision"] >= 0.95 and prf["recall"] >= 0.95, prf
    # resume with parser='whitespace' must NOT reuse the full-parse
    # sentences snapshot (config hash differs) ...
    info2 = run_kg_pipeline(spark, SF, cat, parser="whitespace")
    assert "sentences" not in info2["skipped"]
    # ... while rerunning parser='full' resumes it
    info3 = run_kg_pipeline(spark, SF, cat, parser="full")
    assert "sentences" in info3["skipped"]
