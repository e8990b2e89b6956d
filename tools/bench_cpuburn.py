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


# ---- memory-bandwidth probe (campaign-13 lesson) ---------------------
# The md5 burn is cache-resident and therefore BLIND to DRAM-bandwidth
# steal from sibling tenants — the exact condition observed on
# 2026-08-18: local[2] walls at historical-best levels while local[8]
# walls ran ~1.8x inflated, with every md5 probe reading clean.  An
# 8-thread Spark level needs ~4x the bandwidth of a 2-thread one, so
# bandwidth contention mimics poor engine scaling.  This probe measures
# aggregate memcpy rate over a cache-busting buffer in 2 and 8
# share-nothing processes.  NOTE the gate is ABSOLUTE, not a 2->8
# ratio: this box's aggregate memcpy is bus-flat by design (see
# BENCH/multiproc.json — ~constant GB/s however many processes run), so
# the healthy signature is agg_gbps_p8 ≈ the calibrated quiet-host
# reference (SPARK_GRAFT_MEMBW_REF_GBPS); a sibling tenant eating the
# bus shows up as p8 aggregate well below that reference.

def _membw(dur: float, q) -> None:
    import numpy as np

    src = np.empty(64 * 1024 * 1024, dtype=np.uint8)  # 64 MiB >> LLC
    src.fill(1)  # materialize src pages — an un-written np.empty is
    dst = np.empty_like(src)  # zero-page-backed and reads come from cache
    np.copyto(dst, src)  # fault dst in BEFORE timing
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        np.copyto(dst, src)
        n += src.nbytes
    q.put(n / (time.time() - t0))


def agg_membw(p: int, dur: float = 6.0) -> tuple[float, list[float]]:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_membw, args=(dur, q)) for _ in range(p)]
    for x in ps:
        x.start()
    for x in ps:
        x.join()
    rates = sorted(q.get() for _ in ps)
    return sum(rates), rates


def probe_membw(dur: float = 6.0) -> dict:
    dur = max(dur, 4.0)  # short burns are spawn/page-fault-dominated
    a2, _ = agg_membw(2, dur)
    a8, _ = agg_membw(8, dur)
    out = {
        "ts": round(time.time(), 1),
        "agg_gbps_p2": round(a2 / 1e9, 2),
        "agg_gbps_p8": round(a8 / 1e9, 2),
    }
    ref = float(os.environ.get("SPARK_GRAFT_MEMBW_REF_GBPS", "0"))
    if ref > 0:
        out["vs_ref"] = round(a8 / 1e9 / ref, 3)
    return out
