"""Isolated sub-stage profiling (guide §1.1/§1.4): times each pipeline
piece with the noop sink inside ONE warm session, so numbers reflect
computation, not snapshot writes or JVM startup.  Never used by the
driver — bench.py stays the frozen measurement contract.

Usage: python bench_extra.py [phase ...]
Phases: synth parse parsefull snapshot candidates labels triples
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df, desc, spark, out):
    spark.sparkContext.setJobDescription(desc)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.time() - t0, 3)
    out[desc] = dt
    print(f"  {desc}: {dt}s", flush=True)
    spark.sparkContext.setJobDescription(None)


def main():
    only = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from snorkel_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()  # warmup

    from bench import replicated_documents
    from snorkel_spark.operators.parser import parse_sentences, parse_sentences_full
    from snorkel_spark.sources.interleaved import synthesize_from_docs

    out: dict[str, float] = {}

    def on(phase):
        return not only or phase in only

    docs = replicated_documents(spark, SF, 1)
    raw = synthesize_from_docs(docs)

    if on("synth"):
        noop(docs.select("doc_id", "text"), "docs_scan", spark, out)
        noop(raw, "synthesize", spark, out)
    if on("parse"):
        noop(parse_sentences(raw), "parse_ws", spark, out)
        # parse again to see warm-cache variance
        noop(parse_sentences(raw), "parse_ws_2", spark, out)
    if on("parsefull"):
        noop(parse_sentences_full(raw), "parse_full", spark, out)
    if on("snapshot"):
        import shutil
        import tempfile
        d = tempfile.mkdtemp(prefix="bx_", dir="/dev/shm")
        spark.sparkContext.setJobDescription("parse_ws + parquet write")
        t0 = time.time()
        parse_sentences(raw).write.mode("overwrite").parquet(d)
        out["parse_ws_write"] = round(time.time() - t0, 3)
        print(f"  parse_ws_write: {out['parse_ws_write']}s", flush=True)
        t0 = time.time()
        n = spark.read.parquet(d).count()
        out["snapshot_count"] = round(time.time() - t0, 3)
        print(f"  snapshot_count: {out['snapshot_count']}s (n={n})", flush=True)
        shutil.rmtree(d, ignore_errors=True)

    if on("candidates") or on("labels") or on("triples"):
        import shutil
        import tempfile

        from snorkel_spark.operators.matchers import person_matcher
        from snorkel_spark.operators.ngrams import ngram_mentions
        from snorkel_spark.operators.candidates import extract_candidates
        from snorkel_spark.sources import fixtures as FX

        d = tempfile.mkdtemp(prefix="bx_s_", dir="/dev/shm")
        parse_sentences(raw).write.mode("overwrite").parquet(d)
        sents = spark.read.parquet(d)

        t0 = time.time()
        pm = person_matcher(FX.person_full_names(spark))
        n_vals = [n for n in pm.mention_lengths() if 1 <= n <= 2] or None
        out["matcher_setup"] = round(time.time() - t0, 3)
        print(f"  matcher_setup: {out['matcher_setup']}s", flush=True)
        mentions = ngram_mentions(sents, n_max=2, n_values=n_vals)
        if on("candidates"):
            noop(mentions, "ngram_mentions", spark, out)
            persons = pm.apply(mentions)
            noop(persons, "matcher_apply", spark, out)
            noop(
                extract_candidates(persons, persons, sentences=sents),
                "extract_candidates",
                spark,
                out,
            )
        if on("labels") or on("triples"):
            from snorkel_spark.functions.labeling import apply_lfs, make_fixture_lfs

            d2 = tempfile.mkdtemp(prefix="bx_c_", dir="/dev/shm")
            persons = pm.apply(mentions)
            extract_candidates(persons, persons, sentences=sents).write.mode(
                "overwrite"
            ).parquet(d2)
            cands = spark.read.parquet(d2)
            ks = FX.known_spouses(spark).collect()
            pairs = {
                (f"anna{r.subj_entity[1:]} lee{r.subj_entity[1:]}",
                 f"bob{r.obj_entity[1:]} kim{r.obj_entity[1:]}") for r in ks
            }
            lfs = make_fixture_lfs(pairs)
            if on("labels"):
                noop(apply_lfs(cands, lfs), "apply_lfs", spark, out)
            if on("triples"):
                from snorkel_spark.labelmodel.encoding import compute_O_selfjoin
                from snorkel_spark.labelmodel.model import LabelModel
                from snorkel_spark.operators.canonicalize import canonical_triples
                from snorkel_spark.operators.linker import link_text_map

                d3 = tempfile.mkdtemp(prefix="bx_L_", dir="/dev/shm")
                apply_lfs(cands, lfs).write.mode("overwrite").parquet(d3)
                L = spark.read.parquet(d3)
                C, n = compute_O_selfjoin(L, m=len(lfs))
                lm = LabelModel(m=len(lfs)).fit(C, n)
                t0 = time.time()
                marg = lm.marginals(spark, L)
                noop(marg, "marginals", spark, out)
                tmap = link_text_map(
                    cands.selectExpr("subj_text as text").unionByName(
                        cands.selectExpr("obj_text as text")
                    ),
                    FX.alias_dict(spark),
                )
                noop(tmap, "link_text_map", spark, out)
                subj = cands.join(
                    F.broadcast(tmap.withColumnRenamed("text", "subj_text")),
                    "subj_text",
                ).select("candidate_id", "entity_id")
                obj = cands.join(
                    F.broadcast(tmap.withColumnRenamed("text", "obj_text")),
                    "obj_text",
                ).select("candidate_id", "entity_id")
                noop(
                    canonical_triples(cands, marg, subj, obj, threshold=0.5, n_salts=16),
                    "canonical_triples",
                    spark,
                    out,
                )
                shutil.rmtree(d3, ignore_errors=True)
            shutil.rmtree(d2, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
