#!/usr/bin/env python
"""Run EVERY __spark_entry__ contract query against its DuckDB oracle
on an arbitrary sf directory, driver-style (rows + schema + sorted
value compare), and write a CORRECTNESS-shaped JSON artifact.

This is the robustness-sweep harness (VERDICT r3 #1): the driver only
gates sf0.01; this reruns the full contract at 10x/100x that scale,
where two real scale-dependent bugs have been caught so far.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def compare(name, spark_pdf, duck_pdf):
    import pandas as pd

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    a, b = norm(spark_pdf), norm(duck_pdf)
    res = {
        "rows_match": len(a) == len(b),
        "schema_match": list(a.columns) == list(b.columns),
        "hash_match": False,
        "spark_rows": len(a),
        "oracle_rows": len(b),
        "err": None,
    }
    if not (res["rows_match"] and res["schema_match"]):
        return res
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col].tolist(), b[col].tolist())):
            if isinstance(x, float) or isinstance(y, float):
                ok = (pd.isna(x) and pd.isna(y)) or x == y or math.isclose(
                    x, y, rel_tol=0, abs_tol=0
                )
            else:
                ok = x == y
            if not ok:
                res["err"] = f"{col}[{i}]: {x!r} != {y!r}"
                return res
    res["hash_match"] = True
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("contract-sweep")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    names = args.only or sorted(qs)
    results, n_green = {}, 0
    for name in names:
        t0 = time.time()
        try:
            sp = qs[name](spark, args.sf_dir).toPandas()
            sql = oracles.get(name)
            if sql is None:
                results[name] = {
                    "rows_match": True, "schema_match": True,
                    "hash_match": None, "spark_rows": len(sp),
                    "oracle_rows": None, "err": "rows-only (no oracle)",
                }
            else:
                du = con.sql(sql).df()
                results[name] = compare(name, sp, du)
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:500],
            }
        r = results[name]
        green = r["hash_match"] in (True, None) and r["rows_match"]
        n_green += bool(green)
        print(
            f"{name}: {'OK' if green else 'FAIL'} "
            f"rows={r['spark_rows']} t={time.time() - t0:.1f}s"
            + (f" err={r['err']}" if r["err"] and not green else ""),
            flush=True,
        )
    out = args.out or os.path.join(
        REPO, f"CORRECTNESS_sweep_{os.path.basename(args.sf_dir.rstrip('/'))}.json"
    )
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"{n_green}/{len(names)} green -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
