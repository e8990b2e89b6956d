"""One-JVM scaling worker: a single Spark session per parallelism
level runs warmup + RUNS interleaved-size pipeline passes, printing one
JSON line per timed pass.

Why in-session: each subprocess-per-point campaign wall carries ~20 s
of session startup + JIT warmup, so a 5-replicate × 2-size × 3-level
campaign spends ~10 min measuring nothing — and on a noisy hypervisor
the only defense is MORE replicates.  Timing just the pipeline inside
one warm JVM makes a replicate ~3× cheaper, so the campaign can afford
7+ replicates per point.  Caches/parquet snapshots are torn down after
every pass (bench.run_pipeline), so passes stay independent; the warm
JIT/page cache is identical treatment at every level.

Usage: python tools/scaling_worker.py CPUS SIZES RUNS SF_DIR SNAPSHOT
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    sizes = [int(x) for x in sys.argv[2].split(",")]
    runs = int(sys.argv[3])
    sf_dir = sys.argv[4]
    snapshot = sys.argv[5] if len(sys.argv) > 5 else "none"

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from bench import run_pipeline
    from snorkel_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_worker_{cpus}", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    run_pipeline(spark, sf_dir, max(1, min(sizes) // 4), snapshot)  # warmup
    for i in range(runs):
        for size in sizes:
            wall, q = run_pipeline(spark, sf_dir, size, snapshot)
            print(
                json.dumps(
                    {
                        "cpus": cpus,
                        "size": size,
                        "rep": i,
                        "wall": wall,
                        "n_sentences": q["n_sentences"],
                        "n_triples": q["n_triples"],
                        "n_evidence": q["n_evidence"],
                        "stages": {k: v for k, v in q.items() if k.endswith("_sec")},
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
