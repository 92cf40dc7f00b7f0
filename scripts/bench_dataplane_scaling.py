"""Dataplane N-vs-4N scaling evidence -> BENCH/scaling_raw.jsonl.

Runs scripts/bench_dataplane.py (the compute-dominant index pipeline:
dedup -> docids -> tokenize -> postings -> segment encode as ONE job
chain) at two parallelism levels, ALTERNATING levels across repeats,
and reports the per-level minimum.  This is the sandbox proxy for the
north rule's N vs 4N executor criterion: same job, same input, fresh
JVM per run; efficiency = (T_lo / T_hi) / (hi / lo).

The alternation + minima protocol exists because this VM suffers
episodic hypervisor CPU-steal (identical jobs vary up to 5x between
runs); the per-level minimum approximates the un-throttled cost of
the code itself.  See BENCH/BASELINE.md.

Usage: python scripts/bench_dataplane_scaling.py --docs 600000 \
           --levels 2 8 --repeats 3
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_dataplane(cpus: int, docs: int, pin: bool = False) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "bench_dataplane.py"),
        "--docs", str(docs),
        "--cpus", str(cpus),
    ]
    if pin:
        # Pin the whole process tree (JVM + python workers) to exactly
        # `cpus` physical CPUs so both legs of a pair experience the
        # hypervisor's per-CPU steal the same way — a local[2] leg can
        # no longer float across all 32 vCPUs chasing fresh burst
        # credit while the local[8] leg saturates the sustained
        # envelope (VERDICT r3 next-item 5).
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"bench_dataplane produced no JSON at cpus={cpus}:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600000)
    ap.add_argument("--levels", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pin", action="store_true",
                    help="taskset each leg to exactly its core count")
    args = ap.parse_args()
    lo, hi = args.levels
    factor = hi / lo

    raw_path = os.path.join(REPO, "BENCH", "scaling_raw.jsonl")
    os.makedirs(os.path.dirname(raw_path), exist_ok=True)
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    with open(raw_path, "a") as raw:
        for i in range(args.repeats):
            for level in (lo, hi):
                r = run_dataplane(level, args.docs, pin=args.pin)
                r["extras"]["repeat"] = i
                r["extras"]["pinned"] = args.pin
                runs[level].append(r)
                raw.write(json.dumps(r) + "\n")
                raw.flush()
                print(
                    f"repeat {i} local[{level}]: {r['value']}s "
                    f"({r['extras']['docs_per_sec']} docs/sec)",
                    file=sys.stderr,
                )

    t_lo = min(r["value"] for r in runs[lo])
    t_hi = min(r["value"] for r in runs[hi])
    eff = (t_lo / t_hi) / factor
    # per-repeat ADJACENT-pair efficiencies: each repeat runs lo then
    # hi back-to-back, so pair i shares one host window — the
    # throttle-robust view (best pair) alongside the min-based one
    pair_effs = [
        round((rl["value"] / rh["value"]) / factor, 3)
        for rl, rh in zip(runs[lo], runs[hi])
    ]
    summary = {
        "metric": "dataplane_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": f"synthetic_{args.docs}",
        "extras": {
            "levels": [lo, hi],
            "t_lo_min_sec": t_lo,
            "t_hi_min_sec": t_hi,
            "docs_per_sec_lo": round(args.docs / t_lo, 1),
            "docs_per_sec_hi": round(args.docs / t_hi, 1),
            "repeats": args.repeats,
            "all_lo": [r["value"] for r in runs[lo]],
            "all_hi": [r["value"] for r in runs[hi]],
            "adjacent_pair_effs": pair_effs,
            "best_pair_eff": max(pair_effs),
            "pinned": args.pin,
            "date": str(datetime.date.today()),
        },
    }
    with open(raw_path, "a") as raw:
        raw.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
