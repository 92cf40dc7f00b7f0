#!/usr/bin/env python
"""Alternated-minima A/B of the contract `term_counts` query
(VERDICT r4 next-item 6: 1.92 s @ r3 -> 2.72 s @ r4 in the gated
bench — window noise, or a real regression?).

Protocol (same as BENCH/BASELINE.md's scaling pairs): one fresh
process per sample, A/B strictly alternated so hypervisor steal hits
both arms equally; each sample reports the COLD first run plus the
min of 3 warm reps; the verdict compares per-arm minima (the code's
cost with the noise floor subtracted).

Usage: python scripts/bench_ab_term_counts.py --a /tmp/sgb_r3wt \
         --b /root/repo [--rounds 4] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line; append conclusion to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

CHILD = r"""
import sys, time, json
repo, sf = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
from search_engine_spark.session import get_spark
spark = get_spark("ab-termcounts", parallelism=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
import importlib.util
spec = importlib.util.spec_from_file_location(
    "entry_ab", repo + "/__spark_entry__.py")
E = importlib.util.module_from_spec(spec)
spec.loader.exec_module(E)
q = E.queries()["term_counts"]
spark.range(10).count()  # absorb session warm-up
t0 = time.time(); q(spark, sf).count(); cold = time.time() - t0
warm = []
for _ in range(3):
    t0 = time.time(); q(spark, sf).count(); warm.append(time.time() - t0)
print(json.dumps({"cold": round(cold, 3),
                  "warm": [round(t, 3) for t in warm]}))
spark.stop()
"""


def sample(repo: str, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, repo, sf_dir],
        capture_output=True, text=True, timeout=600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="r3 worktree path")
    ap.add_argument("--b", required=True, help="HEAD repo path")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    arms: dict[str, list[dict]] = {"a": [], "b": []}
    for i in range(args.rounds):
        for arm, repo in (("a", args.a), ("b", args.b)):
            s = sample(repo, args.sf_dir)
            arms[arm].append(s)
            print(f"round {i} arm {arm}: {s}", file=sys.stderr)

    def mins(rows):
        return {
            "cold_min": min(r["cold"] for r in rows),
            "warm_min": min(t for r in rows for t in r["warm"]),
            "cold_all": [r["cold"] for r in rows],
            "warm_all": [t for r in rows for t in r["warm"]],
        }

    a, b = mins(arms["a"]), mins(arms["b"])
    row = {
        "metric": "term_counts_ab_warm_min_ratio_head_vs_r3",
        "value": round(b["warm_min"] / a["warm_min"], 3),
        "unit": "ratio",
        "sf": args.sf_dir.rstrip("/").split("/")[-1],
        "extras": {
            "r3": a,
            "head": b,
            "cold_ratio": round(b["cold_min"] / a["cold_min"], 3),
            "rounds": args.rounds,
        },
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
