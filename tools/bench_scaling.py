"""Scaling-efficiency measurement (BASELINE.md protocol): run bench.py
at local[8] (N) and local[32] (4N) on the SAME input and report
throughput at both + efficiency = (tps@4N / tps@N) / 4 into
BENCH/BASELINE.md.

The input is the sf0.1-derived interleaved corpus replicated
SPARK_GRAFT_REPLICATE× (default 48 → ~240k docs / ~1M sentences) so the
measured window is compute, not session startup.  Each level runs
``runs`` times; median wall-clock is reported.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, repl: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPLICATE=str(repl),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repl = int(os.environ.get("SPARK_GRAFT_REPLICATE", "48"))
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    levels = [8, 32]
    results = {}
    for cpus in levels:
        # warm-up run (JIT/Arrow/page-cache), then timed runs
        run_bench(cpus, sf_dir, repl)
        trials = [run_bench(cpus, sf_dir, repl) for _ in range(runs)]
        med = sorted(trials, key=lambda r: r["value"])[len(trials) // 2]
        results[cpus] = {
            "wall_sec_all": [r["value"] for r in trials],
            "median": med,
        }
        print(f"local[{cpus}]: walls={[r['value'] for r in trials]}", flush=True)

    n, n4 = levels
    # distinct (subj,pred,obj) saturates at the synthesis's 137 entities,
    # so throughput for scaling purposes = rows of work per second:
    # sentences/sec (and candidates/sec as a cross-check); triples/sec
    # and evidence/sec are reported alongside.
    tps_n = results[n]["median"]["queries"]["sentences_per_sec"]
    tps_4n = results[n4]["median"]["queries"]["sentences_per_sec"]
    eff = (tps_4n / tps_n) / (n4 / n)
    cps_n = results[n]["median"]["queries"]["candidates_per_sec"]
    cps_4n = results[n4]["median"]["queries"]["candidates_per_sec"]
    eff_c = (cps_4n / cps_n) / (n4 / n)
    med4 = results[n4]["median"]["queries"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — measured baseline (sandbox protocol per BASELINE.md)

Machine: {os.cpu_count()} cores, Spark 4.1.2 / Java 17, local mode.
Input: sf0.1 documents × {repl} replicas = {5000 * repl} docs
({med4['n_sentences']} sentences, {med4['n_candidates']} candidates,
{med4['n_triples']} triples), deterministic synthesis seedless
(pure doc_id arithmetic).  {runs} timed runs per level, median reported.

## Scaling (north_rule gate: efficiency ≥ 0.8 from N → 4N)

Distinct (subj,pred,obj) triples saturate at the synthesis's 137
entity pairs, so row-throughput is the scaling measure: sentences/sec
(headline) and candidates/sec (cross-check); triple-evidence rows/sec
reported too.

| level | wall (s) | sentences/sec | candidates/sec | evidence/sec | distinct triples |
|---|---|---|---|---|---|
| local[{n}]  (N)  | {results[n]['median']['value']} | {tps_n} | {cps_n} | {results[n]['median']['queries']['evidence_per_sec']} | {results[n]['median']['queries']['n_triples']} |
| local[{n4}] (4N) | {results[n4]['median']['value']} | {tps_4n} | {cps_4n} | {med4['evidence_per_sec']} | {med4['n_triples']} |

**Scaling efficiency (sentences/sec) = (tps@4N / tps@N) / 4 = {eff:.3f}**
**Scaling efficiency (candidates/sec) = {eff_c:.3f}**

All walls: local[{n}]={results[n]['wall_sec_all']}, local[{n4}]={results[n4]['wall_sec_all']}

## Per-stage breakdown (median local[{n4}] run)

| stage | sec |
|---|---|
| sentences (synthesize+parse) | {med4['sentences_sec']} |
| candidates (ngrams+match+pair) | {med4['candidates_sec']} |
| label matrix (LF applier) | {med4['label_matrix_sec']} |
| O sufficient stats (self-join) | {med4['O_selfjoin_sec']} |
| O sufficient stats (Arrow two-phase) | {med4['O_treeagg_sec']} |
| label-model fit (driver NumPy) | {med4['fit_sec']} |
| marginals+link+triples | {med4['triples_sec']} |
""")
    print(json.dumps({"efficiency_sentences": eff, "efficiency_candidates": eff_c,
                      "tps_n": tps_n, "tps_4n": tps_4n}))


if __name__ == "__main__":
    main()
