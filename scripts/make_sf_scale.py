#!/usr/bin/env python
"""Deterministically scale an sf testdata directory by an integer
factor, for contract robustness sweeps beyond the shipped sf0.1
(VERDICT r3 #1: "10x again").

Copy 0 is the source data verbatim; copies 1..K-1 shift every key
space by a collision-free stride and mutate content just enough that
no copied row aliases an original under the engine's dedup/tie-break
semantics:

- documents: doc_id += i*DOC_STRIDE; copy i's text gets the suffix
  token `copyvariantN` repeated i times (the frozen tokenizer keeps
  it), so sha256 exact dedup does NOT collapse copies AND every copy
  has a distinct doclen — distinct BM25 scores.  The first generator
  version appended ONE token to every copy, which manufactured 9-way
  exact score ties at top-k boundaries and exposed last-ulp
  float-sum-order differences between DuckDB's SUM and the WAND
  kernel's fold — an oracle-stability artifact of the synthetic data,
  not an engine bug (the engine's tie-break is the deterministic
  docid); n_chars recomputed.
- events: event_id/user_id shifted; ts += i seconds (stays inside the
  source's 30-day window, so sessionization/windowing semantics scale
  instead of shifting).
- orders/customer/lineitem/supplier: o_orderkey/o_custkey/c_custkey/
  l_orderkey/l_suppkey/s_suppkey shifted by i*KEY_STRIDE so the
  pagerank edge graph and the customer join chain scale 10x with no
  cross-copy node collisions (custkey+100000 dst space stays inside
  one stride).
- embeddings: vec_id += i*VEC_STRIDE; copies perturbed per-dimension
  by a deterministic +/-5e-3 lattice so no copy duplicates an
  original vector.
- nation/region/part: broadcast dims, copied verbatim.

Everything is written as plain parquet; Spark and DuckDB read the
SAME files, so the sweep needs no generator parity — only
determinism.
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_STRIDE = 1_000_000
KEY_STRIDE = 10_000_000
VEC_STRIDE = 1_000_000


def scale_sql(con, src, out, table, factor, expr_fn):
    parts = [expr_fn(i) for i in range(factor)]
    union = " UNION ALL ".join(
        f"SELECT {p} FROM t" for p in parts
    )
    con.sql(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}/{table}.parquet'")
    con.sql(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf_big")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    f = args.factor

    scale_sql(con, args.src, args.out, "documents", f, lambda i: (
        f"doc_id + {i * DOC_STRIDE} AS doc_id, "
        + ("text, " if i == 0
           else f"text || repeat(' copyvariant{i}', {i}) AS text, ")
        + "lang, source, "
        + ("n_chars" if i == 0
           else f"CAST(length(text || repeat(' copyvariant{i}', {i})) "
                f"AS BIGINT) AS n_chars")
    ))
    scale_sql(con, args.src, args.out, "events", f, lambda i: (
        f"event_id + {i * KEY_STRIDE} AS event_id, "
        f"ts + INTERVAL {i} SECOND AS ts, "
        f"user_id + {i * 100_000} AS user_id, event_type, value, props"
    ))
    scale_sql(con, args.src, args.out, "orders", f, lambda i: (
        f"o_orderkey + {i * KEY_STRIDE} AS o_orderkey, "
        f"o_custkey + {i * KEY_STRIDE} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    ))
    scale_sql(con, args.src, args.out, "customer", f, lambda i: (
        f"c_custkey + {i * KEY_STRIDE} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment"
    ))
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{args.src}/lineitem.parquet'"
    ).fetchall()]
    keyed = {"l_orderkey", "l_suppkey"}
    scale_sql(con, args.src, args.out, "lineitem", f, lambda i: ", ".join(
        f"{c} + {i * KEY_STRIDE} AS {c}" if c in keyed else c for c in cols
    ))
    sup_cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{args.src}/supplier.parquet'"
    ).fetchall()]
    scale_sql(con, args.src, args.out, "supplier", f, lambda i: ", ".join(
        f"{c} + {i * KEY_STRIDE} AS {c}" if c == "s_suppkey" else c
        for c in sup_cols
    ))
    for t in ("nation", "region", "part"):
        con.sql(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )

    # embeddings: numpy perturbation lattice, float32 like the source
    tab = pq.read_table(f"{args.src}/embeddings.parquet")
    vec = np.asarray(tab.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(tab.column("embedding").to_pylist(), dtype=np.float32)
    lab = np.asarray(tab.column("label").to_pylist(), dtype=np.int32)
    n, d = emb.shape
    out_vec, out_emb, out_lab = [vec], [emb], [lab]
    j = np.arange(d)
    for i in range(1, f):
        pert = (((vec[:, None] * 31 + j[None, :] * 7 + i * 13) % 11) - 5
                ).astype(np.float32) * 1e-3
        out_vec.append(vec + i * VEC_STRIDE)
        out_emb.append(emb + pert)
        out_lab.append(lab)
    allv = np.concatenate(out_vec)
    alle = np.concatenate(out_emb)
    alll = np.concatenate(out_lab)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(allv, pa.int64()),
                "embedding": pa.array(
                    [row for row in alle.tolist()], pa.list_(pa.float32())
                ),
                "label": pa.array(alll, pa.int32()),
            }
        ),
        f"{args.out}/embeddings.parquet",
    )
    for t in ("documents", "events", "orders", "customer", "lineitem",
              "supplier", "embeddings"):
        cnt = con.sql(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {cnt}")


if __name__ == "__main__":
    main()
