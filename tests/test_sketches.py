"""Deterministic sketches (ops/sketches.py): estimate quality bounds,
partitioning/cluster-size invariance (the determinism claim), CMS
overcount property, register-table shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.ops.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    cms_point_estimates,
    cms_sketch,
    hll_cardinality,
    hll_registers,
)


def _items(spark, n_distinct, dups=3, parts=8):
    df = spark.range(n_distinct).select(
        F.concat(F.lit("item"), F.col("id")).alias("t"),
        (F.col("id") % 4).cast("string").alias("g"),
    )
    out = df
    for _ in range(dups - 1):
        out = out.union(df)
    return out.repartition(parts)




def test_hll_grouped_accuracy(spark):
    est = {
        r["g"]: r["est"]
        for r in hll_cardinality(_items(spark, 40000), "t", ["g"]).collect()
    }
    for g in ("0", "1", "2", "3"):
        true = 10000.0
        assert abs(est[g] - true) / true < 0.05, (g, est[g])


def test_hll_linear_counting_small(spark):
    # n << m: linear counting is near-exact
    est = hll_cardinality(_items(spark, 150), "t", ["g"]).collect()
    for r in est:
        assert abs(r["est"] - 37.5) < 3.0, r


def test_hll_duplicates_absorbed(spark):
    # 1x vs 5x duplication of the same universe: identical registers
    a = hll_cardinality(_items(spark, 5000, dups=1), "t", ["g"]).collect()
    b = hll_cardinality(_items(spark, 5000, dups=5), "t", ["g"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_partitioning_invariance(spark):
    # the 100 TB determinism claim: same input, different partitioning
    # (different "cluster size") -> bit-identical estimates
    a = hll_cardinality(_items(spark, 3000, parts=2), "t", ["g"]).collect()
    b = hll_cardinality(_items(spark, 3000, parts=16), "t", ["g"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_register_bounds(spark):
    regs = hll_registers(_items(spark, 2000), "t", ["g"])
    rows = regs.collect()
    assert all(0 <= r["idx"] < HLL_M for r in rows)
    assert all(1 <= r["rank"] <= 49 for r in rows)
    # register table is bounded at |groups| * m regardless of input
    assert len(rows) <= 4 * HLL_M


def _exact_counts(spark, items):
    return {
        r["t"]: r["c"]
        for r in items.groupBy("t").agg(F.count("*").alias("c")).collect()
    }


def test_cms_overcount_never_under(spark):
    items = spark.range(20000).select(
        F.concat(F.lit("w"), (F.col("id") % 500)).alias("t")
    )
    sk = cms_sketch(items, "t")
    exact = _exact_counts(spark, items)
    probes = [f"w{i}" for i in range(0, 500, 37)] + ["absent1", "absent2"]
    est = {
        r["term"]: r["est"]
        for r in cms_point_estimates(sk, probes).collect()
    }
    for t in probes:
        assert est[t] >= exact.get(t, 0), t
    # width 4096 >> 500 distinct: collisions are rare enough that at
    # least one depth row is clean for every probe here
    assert all(est[t] == exact.get(t, 0) for t in probes)


def test_cms_sketch_bounded(spark):
    items = spark.range(100000).select(
        F.concat(F.lit("w"), (F.col("id") % 20000)).alias("t")
    )
    sk = cms_sketch(items, "t")
    assert sk.count() <= CMS_DEPTH * CMS_WIDTH
    # total mass per depth row == n items
    per_depth = {
        r["j"]: r["s"]
        for r in sk.groupBy("j").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_depth) == set(range(CMS_DEPTH))
    assert all(v == 100000 for v in per_depth.values())


def test_cms_partitioning_invariance(spark):
    items = spark.range(5000).select(
        F.concat(F.lit("w"), (F.col("id") % 300)).alias("t")
    )
    probes = ["w0", "w100", "w299", "nope"]
    a = cms_point_estimates(
        cms_sketch(items.repartition(2), "t"), probes
    ).collect()
    b = cms_point_estimates(
        cms_sketch(items.repartition(16), "t"), probes
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
