"""Two-parallelism scaling benchmark -> BENCH/BASELINE.md.

The north rule's N vs 4N executor criterion, evidenced in this
sandbox by the documented proxy: the SAME job at local[8] vs
local[32] (fresh JVM each), same input, reporting throughput at both
plus scaling efficiency (T_8 / T_32) / 4   (1.0 = perfect).

Usage: python scripts/bench_scaling.py [--docs 40000]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, docs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    # the harness caps local threads at the host's sustained envelope;
    # a scaling run must measure the REQUESTED level, so lift the cap
    env["SPARK_GRAFT_MAX_LOCAL"] = str(cpus)
    env["SPARK_GRAFT_BENCH_DOCS"] = str(docs)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench.py produced no JSON at cpus={cpus}:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def _merge_min(runs: list[dict]) -> dict:
    """Per-metric minimum across repeats.

    This sandbox VM suffers episodic hypervisor CPU-steal (identical
    jobs vary up to 5x between runs); the minimum over alternated
    repeats approximates the un-throttled cost of the code itself.
    """
    best = json.loads(json.dumps(runs[0]))
    for r in runs[1:]:
        for k, v in r["queries"].items():
            if v < best["queries"].get(k, float("inf")):
                best["queries"][k] = v
    best["extras"]["docs_per_sec"] = max(
        r["extras"]["docs_per_sec"] for r in runs
    )
    best["extras"]["batch_qps"] = max(r["extras"]["batch_qps"] for r in runs)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    lo, hi = args.levels
    factor = hi / lo

    lo_runs, hi_runs = [], []
    for _ in range(args.repeats):  # alternate levels to average out
        lo_runs.append(run_bench(lo, args.docs))  # throttle episodes
        hi_runs.append(run_bench(hi, args.docs))
    r_lo = _merge_min(lo_runs)
    r_hi = _merge_min(hi_runs)

    def eff(key: str) -> tuple[float, float, float]:
        a = r_lo["queries"][key]
        b = r_hi["queries"][key]
        return a, b, (a / b) / factor

    b8, b32, beff = eff("index_build")
    q8, q32, qeff = eff("batch_48q")
    qlat8 = sum(v for k, v in r_lo["queries"].items() if k.startswith("q"))
    qlat32 = sum(v for k, v in r_hi["queries"].items() if k.startswith("q"))

    md = f"""# BENCH/BASELINE.md — measured engine performance

Generated {datetime.date.today()} by `scripts/bench_scaling.py`
(same job, same input, fresh JVM per level — the sandbox proxy for
N vs 4N executors; see BASELINE.md for the reference's published
single-node numbers).

Corpus: deterministic synthetic code corpus (FIXTURES.md),
{args.docs} documents, ~{r_hi['extras']['n_docs_indexed']} after exact dedup.
Index config: slab_size=1024, term_buckets=16, block_size=128.

| metric | local[{lo}] | local[{hi}] | scaling efficiency (T_{lo}/T_{hi})/{factor:.0f} |
|---|---|---|---|
| index build (sec) | {b8:.1f} | {b32:.1f} | **{beff:.2f}** |
| index build (docs/sec) | {r_lo['extras']['docs_per_sec']:.0f} | {r_hi['extras']['docs_per_sec']:.0f} | |
| batch 48-query job (sec) | {q8:.1f} | {q32:.1f} | **{qeff:.2f}** |
| batch query throughput (q/s) | {r_lo['extras']['batch_qps']:.1f} | {r_hi['extras']['batch_qps']:.1f} | |
| single-query latency, 12-query total (sec) | {qlat8:.1f} | {qlat32:.1f} | (latency-bound, not a scaling metric) |

Target (BASELINE.json): scaling efficiency >= 0.8.  Each level is the
per-metric minimum over {args.repeats} alternated runs: this VM shows
episodic hypervisor CPU-steal (historical steal time ~2x user time in
/proc/stat; identical jobs vary up to 5x wall-clock between runs), and
the minimum approximates the un-throttled cost of the code.

Reference comparison (BASELINE.md): the reference indexes 1000
docs/sec into a single-node Elasticsearch; serves p99 < 100 ms at
10M docs (per-shard Lucene + in-memory caches).  Our batch engine
optimizes for index-build + batch-query throughput at cluster scale;
single-query latency in local mode carries ~0.5-1.5s of fixed Spark
job overhead per query and is reported for completeness.

Raw JSON:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
