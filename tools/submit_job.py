"""A minimal spark-submit entry point: runs the flagship KG query and
prints a row count.  Exercises the --py-files deployment path:

    python tools/make_pyfiles_zip.py
    spark-submit --master local[8] --py-files snorkel_spark.zip tools/submit_job.py
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.appName("snorkel_spark_submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from snorkel_spark.labelmodel.model import majority_vote
    from snorkel_spark.functions.labeling import apply_lfs, make_fixture_lfs
    from snorkel_spark.operators.candidates import extract_candidates
    from snorkel_spark.operators.matchers import person_matcher
    from snorkel_spark.operators.ngrams import ngram_mentions
    from snorkel_spark.operators.parser import parse_sentences
    from snorkel_spark.sources import fixtures as FX
    from snorkel_spark.sources.interleaved import synthesize_raw_documents

    sents = parse_sentences(synthesize_raw_documents(spark, sf_dir))
    mentions = ngram_mentions(sents, n_max=2)
    persons = person_matcher(FX.person_full_names(spark)).apply(mentions)
    cands = extract_candidates(persons, persons, sentences=sents)
    ks = FX.known_spouses(spark).collect()
    pairs = {
        (f"anna{r.subj_entity[1:]} lee{r.subj_entity[1:]}",
         f"bob{r.obj_entity[1:]} kim{r.obj_entity[1:]}") for r in ks
    }
    L = apply_lfs(cands, make_fixture_lfs(pairs))
    mv = majority_vote(L)
    print(json.dumps({"ok": True, "n_scored": mv.count()}))
    spark.stop()


if __name__ == "__main__":
    main()
