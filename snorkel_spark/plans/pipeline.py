"""The end-to-end KG-construction pipeline with checkpoint/resume.

north_rule: "checkpoints the label matrix and triple stages to Iceberg
snapshots with per-partition lineage + metrics, resumable mid-run".

Design:
- every stage runs through ``run_stage``: skip iff a lineage row with
  the same (stage, input_snapshot_ids, config_hash) points at an
  existing snapshot (idempotent resume — deterministic content-hash ids
  make re-runs produce identical bytes);
- per-partition metrics come from the written snapshot's **parquet
  footers** (Catalog.file_metrics) — metadata-only reads, so each stage
  output is scanned exactly once (by its own write); rows land in the
  catalog's ``_metrics.jsonl``;
- the reference's ``UDFRunner.clear()`` rerun-replace semantics
  (⚠ snorkel/udf.py ~L1–200, SURVEY.md §2.9 U1) map to "new snapshot
  wins".
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage import Catalog


def config_hash(cfg: dict) -> str:
    return hashlib.md5(json.dumps(cfg, sort_keys=True, default=str).encode()).hexdigest()[:12]


@dataclass
class PipelineContext:
    spark: SparkSession
    catalog: Catalog
    config: dict = field(default_factory=dict)
    collect_metrics: bool = True

    def _lineage_key(self, stage: str, inputs: dict[str, int]) -> dict:
        return {
            "stage": stage,
            "inputs": {k: int(v) for k, v in sorted(inputs.items())},
            "config_hash": config_hash(self.config.get(stage, {})),
        }

    def find_completed(self, stage: str, inputs: dict[str, int]) -> int | None:
        key = self._lineage_key(stage, inputs)
        for row in reversed(self.catalog.lineage()):
            if (
                row.get("stage") == key["stage"]
                and row.get("inputs") == key["inputs"]
                and row.get("config_hash") == key["config_hash"]
                and row.get("status") == "committed"
                and self.catalog.exists(stage, row.get("snapshot_id"))
            ):
                return row["snapshot_id"]
        return None

    def run_stage(
        self,
        stage: str,
        inputs: dict[str, int],
        build: "callable[[], DataFrame]",
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> tuple[DataFrame, int, bool]:
        """Returns (df, snapshot_id, was_skipped)."""
        if not force:
            snap = self.find_completed(stage, inputs)
            if snap is not None:
                return self.catalog.read(self.spark, stage, snap), snap, True
        t0 = time.time()
        df = build()
        snap = self.catalog.write(df, stage, partition_by=partition_by,
                                  meta=self._lineage_key(stage, inputs))
        out = self.catalog.read(self.spark, stage, snap)
        wall_ms = int((time.time() - t0) * 1000)
        if self.collect_metrics:
            # per-partition rows from parquet footers (metadata-only) —
            # the stage output is scanned exactly once: by its write.
            self.catalog.log_metrics(
                [
                    {"stage": stage, "snapshot_id": snap, "wall_ms": wall_ms, **fm}
                    for fm in self.catalog.file_metrics(stage, snap)
                ]
            )
        self.catalog.log_lineage(
            {
                **self._lineage_key(stage, inputs),
                "snapshot_id": snap,
                "status": "committed",
                "wall_ms": wall_ms,
                "committed_at": time.time(),
            }
        )
        return out, snap, False


def run_kg_pipeline(
    spark: SparkSession,
    sf_dir: str,
    catalog: Catalog,
    n_max: int = 2,
    threshold: float = 0.5,
    n_salts: int = 0,
    use_label_model: bool = True,
    o_path: str = "arrow",
    stop_after: str | None = None,
    parser: str = "whitespace",
) -> dict:
    """parse → candidates → label matrix → label model → link → triples.

    Returns a dict of stage snapshot ids + the triples DataFrame +
    timing facts; resumable: rerunning with the same catalog skips
    committed stages.

    ``parser``: 'whitespace' (split-on-space — exact for the clean
    synthesized corpus) or 'full' (``parse_sentences_full``: real
    sentence splitting at [.!?] + punctuation-aware tokenization — the
    path a punctuated corpus needs).  Part of the sentences stage's
    config hash, so snapshots from the two parsers never alias.
    """
    from ..functions.labeling import apply_lfs, make_fixture_lfs
    from ..labelmodel.encoding import compute_O_arrow, compute_O_selfjoin
    from ..labelmodel.model import LabelModel, majority_vote
    from ..operators.candidates import extract_candidates
    from ..operators.canonicalize import canonical_triples
    from ..operators.linker import link_text_map
    from ..operators.matchers import person_matcher
    from ..operators.ngrams import ngram_mentions
    from ..operators.parser import parse_sentences, parse_sentences_full
    from ..sources import fixtures as FX
    from ..sources.interleaved import synthesize_raw_documents

    if parser not in ("whitespace", "full"):
        raise ValueError(f"parser must be 'whitespace' or 'full', got {parser!r}")
    parse_fn = parse_sentences if parser == "whitespace" else parse_sentences_full

    ctx = PipelineContext(spark, catalog, config={
        "sentences": {"sf_dir": sf_dir, "parser": parser},
        "candidates": {"n_max": n_max},
        "label_matrix": {"lfs": "fixture_v1"},
        "marginals": {"use_label_model": use_label_model, "o_path": o_path},
        "triples": {"threshold": threshold, "n_salts": n_salts},
    })
    info: dict = {"skipped": []}

    raw = synthesize_raw_documents(spark, sf_dir)
    sents, s1, sk = ctx.run_stage("sentences", {}, lambda: parse_fn(raw))
    if sk:
        info["skipped"].append("sentences")
    if stop_after == "sentences":
        return info

    def build_cands():
        pm = person_matcher(FX.person_full_names(spark))
        # dictionary-length pruning: the matcher is the only consumer of
        # the mention space in this pipeline, so skip generating window
        # lengths it provably rejects (results identical, explode halved)
        n_vals = [n for n in pm.mention_lengths() if 1 <= n <= n_max] or None
        mentions = ngram_mentions(sents, n_max=n_max, n_values=n_vals)
        persons = pm.apply(mentions)
        return extract_candidates(persons, persons, sentences=sents)

    cands, s2, sk = ctx.run_stage("candidates", {"sentences": s1}, build_cands)
    if sk:
        info["skipped"].append("candidates")
    if stop_after == "candidates":
        return info

    ks = FX.known_spouses(spark).collect()
    ks_pairs = {
        (f"anna{r.subj_entity[1:]} lee{r.subj_entity[1:]}",
         f"bob{r.obj_entity[1:]} kim{r.obj_entity[1:]}")
        for r in ks
    }
    lfs = make_fixture_lfs(ks_pairs)
    L, s3, sk = ctx.run_stage(
        "label_matrix", {"candidates": s2}, lambda: apply_lfs(cands, lfs)
    )
    if sk:
        info["skipped"].append("label_matrix")
    if stop_after == "label_matrix":
        return info

    def build_marginals():
        if not use_label_model:
            return majority_vote(L)
        compute = compute_O_selfjoin if o_path == "selfjoin" else compute_O_arrow
        C, n = compute(L, m=len(lfs))
        lm = LabelModel(m=len(lfs)).fit(C, n)
        info["learned_lf_stats"] = lm.learned_lf_stats()
        return lm.marginals(spark, L)

    marg, s4, sk = ctx.run_stage("marginals", {"label_matrix": s3}, build_marginals)
    if sk:
        info["skipped"].append("marginals")

    def build_triples():
        tmap = link_text_map(
            cands.selectExpr("subj_text as text").unionByName(
                cands.selectExpr("obj_text as text")),
            FX.alias_dict(spark))
        subj_links = cands.join(
            F.broadcast(tmap.withColumnRenamed("text", "subj_text")), "subj_text"
        ).select("candidate_id", "entity_id")
        obj_links = cands.join(
            F.broadcast(tmap.withColumnRenamed("text", "obj_text")), "obj_text"
        ).select("candidate_id", "entity_id")
        return canonical_triples(
            cands, marg, subj_links, obj_links, threshold=threshold, n_salts=n_salts
        ).withColumn("snapshot_id", F.lit(-1))

    triples, s5, sk = ctx.run_stage(
        "triples", {"marginals": s4, "candidates": s2}, build_triples, partition_by=["pred"]
    )
    if sk:
        info["skipped"].append("triples")
    info.update(
        {"sentences": s1, "candidates": s2, "label_matrix": s3, "marginals": s4, "triples": s5,
         "triples_df": triples}
    )
    return info
