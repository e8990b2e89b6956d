"""Host-steal probe: pure-CPU md5 burn in N INDEPENDENT PROCESSES —
no JVM, no shared heap, ~16-byte working set (cache-resident, so the
memory-bus ceiling measured in BENCH/multiproc.json does not apply
either).  If per-process throughput at 8 concurrent processes is below
4× the 2-process aggregate, the shortfall is the HOST (hypervisor
steal / sibling tenants), not the engine: nothing in this probe shares
anything.

Published next to a scaling campaign, it timestamps how much of that
campaign's efficiency loss the box itself ate.  Usage:
    python tools/bench_cpuburn.py            # P in {1,2,8,32}
Writes BENCH/cpuburn.json and prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import time

DUR = float(os.environ.get("SPARK_GRAFT_BURN_SEC", "12"))


def _burn(dur: float, q) -> None:
    t0 = time.time()
    n = 0
    h = b"x" * 16
    while time.time() - t0 < dur:
        for _ in range(2000):
            h = hashlib.md5(h).digest()
        n += 2000
    q.put(n / (time.time() - t0))


def agg_rate(p: int, dur: float = DUR) -> tuple[float, list[float]]:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_burn, args=(dur, q)) for _ in range(p)]
    for x in ps:
        x.start()
    for x in ps:
        x.join()
    rates = sorted(q.get() for _ in ps)
    return sum(rates), rates


def main() -> None:
    out: dict = {"dur_sec": DUR, "levels": {}}
    for p in (1, 2, 8, 32):
        total, rates = agg_rate(p)
        out["levels"][str(p)] = {
            "aggregate_md5_per_sec": round(total),
            "per_proc_min": round(rates[0]),
            "per_proc_max": round(rates[-1]),
        }
        print(f"P={p}: aggregate {total:,.0f} md5/s "
              f"(per-proc {rates[0]:,.0f}..{rates[-1]:,.0f})", flush=True)
    a = out["levels"]
    out["eff_2_to_8"] = round(
        a["8"]["aggregate_md5_per_sec"] / (4 * a["2"]["aggregate_md5_per_sec"]), 3
    )
    out["eff_8_to_32"] = round(
        a["32"]["aggregate_md5_per_sec"] / (4 * a["8"]["aggregate_md5_per_sec"]), 3
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "cpuburn.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"cpuburn_eff_2_to_8": out["eff_2_to_8"],
                      "cpuburn_eff_8_to_32": out["eff_8_to_32"]}))


if __name__ == "__main__":
    main()
