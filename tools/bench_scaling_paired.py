"""Paired-block scaling campaign — the episodic-steal-tolerant variant
of tools/bench_scaling.py.

The monolithic design measures each parallelism level as one ~50-minute
block of replicates; one hypervisor-steal episode inside the small
level poisons the whole campaign (and in the flattering direction —
campaigns 10/11).  This variant interleaves the two levels in adjacent
short PAIR BLOCKS, so a steal episode either hits both levels of a
block (differenced out by the within-block ratio) or is confined to
one block that gets rejected, while clean blocks keep accumulating:

    block_i:  probe → local[A]: ×r1, ×r2 → local[B]: ×r1, ×r2
    eff_i  =  (Δwall_A / Δwall_B) / (B / A)      (Δ = wall_r2 − wall_r1)

Block acceptance (all must hold, every value published either way):

1. cpuburn ceiling ≥ gate (default 0.95) immediately before the block;
2. every one of the block's four walls ≤ tol × the campaign-wide
   minimum wall for its (level, size) point (default tol 1.35) — walls
   can only be inflated by steal, so the per-point min over blocks is
   the clean reference, and a block whose every wall sits near the min
   ran on a quiet host end to end;
3. Δwall positive at both levels.

The campaign is accepted when ≥ min_blocks (default 3) blocks survive;
the headline is the median block efficiency over survivors (block effs
are already drift-differenced, so median/min over surviving blocks
corroborate each other rather than diverging under one-sided noise).

Writes BENCH/campaign{TAG}_paired.json and (if accepted)
BENCH/PAIRED.md.  Does NOT touch BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def probe_host(burn_sec: float = 6.0) -> dict:
    from bench_cpuburn import agg_rate, probe_membw

    a2, _ = agg_rate(2, burn_sec)
    a8, _ = agg_rate(8, burn_sec)
    out = {
        "ts": round(time.time(), 1),
        "eff_2_to_8": round(a8 / (4 * a2), 3),
    }
    # DRAM-bandwidth leg (campaign-13 lesson): the md5 burn is
    # cache-resident and blind to a sibling tenant eating the memory
    # bus — the condition that inflates ONLY the high-thread level's
    # walls.  Reported always; gates when a calibrated quiet-host
    # reference is supplied (SPARK_GRAFT_MEMBW_REF_GBPS + the
    # SPARK_GRAFT_MEMBW_MIN_RATIO fraction of it, default 0.75).
    mb = probe_membw(burn_sec / 2)
    out["agg_gbps_p8"] = mb["agg_gbps_p8"]
    if "vs_ref" in mb:
        out["membw_vs_ref"] = mb["vs_ref"]
        out["membw_ok"] = mb["vs_ref"] >= float(
            os.environ.get("SPARK_GRAFT_MEMBW_MIN_RATIO", "0.75")
        )
    return out


def run_worker_once(cpus: int, sizes: list[int], sf_dir: str, snapshot: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_worker.py"),
         str(cpus), ",".join(map(str, sizes)), "1", sf_dir, snapshot],
        capture_output=True, text=True, timeout=3600,
    )
    rows = [json.loads(l) for l in out.stdout.strip().splitlines()
            if l.startswith("{")]
    if len(rows) < len(sizes):
        raise RuntimeError(f"worker local[{cpus}] incomplete:\n{out.stderr[-1500:]}")
    by_size = {r["size"]: r for r in rows}
    return {
        "walls": {str(s): by_size[s]["wall"] for s in sizes},
        "rows": {str(s): by_size[s]["n_sentences"] for s in sizes},
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = [int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(",")][:2]
    r1, r2 = [int(x) for x in os.environ.get("SPARK_GRAFT_SIZES", "48,192").split(",")]
    n_blocks = int(os.environ.get("SPARK_GRAFT_BLOCKS", "6"))
    gate = float(os.environ.get("SPARK_GRAFT_HOST_GATE", "0.95"))
    tol = float(os.environ.get("SPARK_GRAFT_WALL_TOL", "1.35"))
    min_blocks = int(os.environ.get("SPARK_GRAFT_MIN_BLOCKS", "3"))
    wait_sec = int(os.environ.get("SPARK_GRAFT_HOST_WAIT_SEC", "0"))
    poll_sec = int(os.environ.get("SPARK_GRAFT_HOST_POLL_SEC", "120"))
    snapshot = os.environ.get("SPARK_GRAFT_SNAPSHOT", "none")
    tag = os.environ.get("SPARK_GRAFT_CAMPAIGN", "paired")

    blocks: list[dict] = []
    deadline = time.time() + wait_sec
    i = 0
    while len(blocks) < n_blocks:
        i += 1
        p = probe_host()
        print(f"block {i} probe: {p}", flush=True)
        if gate > 0 and not p.get("membw_ok", True):
            if time.time() + poll_sec > deadline:
                print(f"block {i}: memory bus contended and wait budget "
                      f"exhausted — stopping", flush=True)
                break
            blocks.append({"i": i, "probe": p, "rejected": "membw"})
            time.sleep(poll_sec)
            continue
        if gate > 0 and p["eff_2_to_8"] < gate:
            if time.time() + poll_sec > deadline:
                print(f"block {i}: host noisy and wait budget exhausted — stopping",
                      flush=True)
                break
            blocks.append({"i": i, "probe": p, "rejected": "probe"})
            time.sleep(poll_sec)
            continue
        try:
            a = run_worker_once(lo, [r1, r2], sf_dir, snapshot)
            b = run_worker_once(hi, [r1, r2], sf_dir, snapshot)
        except RuntimeError as e:
            blocks.append({"i": i, "probe": p, "rejected": f"worker: {e}"})
            continue
        blk = {"i": i, "probe": p, "lo": a, "hi": b}
        print(f"block {i}: local[{lo}] {a['walls']}  local[{hi}] {b['walls']}",
              flush=True)
        blocks.append(blk)
        if time.time() > deadline and wait_sec:
            print("wall-clock budget exhausted", flush=True)
            break

    # ---- post-hoc wall screen (steal inflates, never deflates) ------
    def wall(blk, side, size):
        return blk[side]["walls"][str(size)]

    measured = [b for b in blocks if "lo" in b]
    mins = {
        (side, size): min(wall(b, side, size) for b in measured)
        for side in ("lo", "hi") for size in (r1, r2)
    } if measured else {}
    for b in measured:
        dirty = [
            f"{side}@{size}={wall(b, side, size)} > {tol}x min {mins[(side, size)]}"
            for side in ("lo", "hi") for size in (r1, r2)
            if wall(b, side, size) > tol * mins[(side, size)]
        ]
        d_lo = wall(b, "lo", r2) - wall(b, "lo", r1)
        d_hi = wall(b, "hi", r2) - wall(b, "hi", r1)
        if d_lo <= 0 or d_hi <= 0:
            dirty.append("non-positive marginal wall")
        if dirty:
            b["rejected"] = "; ".join(dirty)
        else:
            b["eff"] = round((d_lo / d_hi) / (hi / lo), 4)

    clean = [b for b in measured if "eff" in b]
    effs = [b["eff"] for b in clean]
    accepted = len(clean) >= min_blocks
    summary = {
        "levels": [lo, hi], "sizes": [r1, r2], "tol": tol, "gate": gate,
        "n_blocks_attempted": len(blocks), "n_blocks_clean": len(clean),
        "accepted": accepted,
        "eff_blocks": effs,
        "eff_median": round(statistics.median(effs), 4) if effs else None,
        "eff_min": round(min(effs), 4) if effs else None,
        "eff_max": round(max(effs), 4) if effs else None,
        "blocks": blocks,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", f"campaign{tag}_paired.json"), "w") as f:
        json.dump(summary, f, indent=1)
    if accepted:
        lines = [
            "# Paired-block scaling campaign (episodic-steal-tolerant protocol)",
            "",
            "See tools/bench_scaling_paired.py for the protocol: the two",
            "parallelism levels run in adjacent short blocks; a block is",
            "accepted only when the cpuburn ceiling immediately before it",
            f"clears {gate} AND all four of its walls sit within {tol}x of",
            "the campaign-wide per-point minimum (steal only ever inflates",
            "a wall, so the per-point min over blocks is the clean",
            "reference).  Block efficiencies are computed WITHIN a block",
            "(adjacent in time — slow drift cancels), then summarized.",
            "",
            f"| block | probe | local[{lo}] walls ×{r1}/×{r2} | local[{hi}] walls ×{r1}/×{r2} | eff |",
            "|---|---|---|---|---|",
        ]
        for b in measured:
            eff = b.get("eff", f"rejected: {b.get('rejected', '?')}")
            lines.append(
                f"| {b['i']} | {b['probe']['eff_2_to_8']} | "
                f"{wall(b, 'lo', r1)} / {wall(b, 'lo', r2)} | "
                f"{wall(b, 'hi', r1)} / {wall(b, 'hi', r2)} | {eff} |"
            )
        lines += [
            "",
            f"**{len(clean)} clean blocks of {len(blocks)} attempted; "
            f"median eff = {summary['eff_median']}, min = {summary['eff_min']}, "
            f"max = {summary['eff_max']}** (gate ≥ 0.8 on the "
            f"local[{lo}]→local[{hi}] cluster proxy).",
        ]
        with open(os.path.join(REPO, "BENCH", "PAIRED.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(json.dumps({k: v for k, v in summary.items() if k != "blocks"}))


if __name__ == "__main__":
    main()
