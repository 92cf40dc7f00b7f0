"""URL prioritization / trust / admission operators (X10-X12, F6)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import priority as P


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (0, "https://en.wikipedia.org/wiki/BM25", 0),
        (1, "https://github.com/apache/spark", 1),
        (2, "https://cs.stanford.edu/paper", 2),
        (3, "https://www.nasa.gov/data", 0),
        (4, "https://foo.example.net/admin/x", 0),
        (5, "https://foo.example.net/blog/" + "a" * 220, 1),
        (6, "https://bar.io/post/p?x=1&a=1&b=2&c=3&d=4&e=5&f=6", 2),
        (7, "https://bar.io/s?jsessionid=abc", 5),
        (8, "https://blog.medium.com/article/deep", 3),
    ]
    return spark.createDataFrame(rows, "id long, url string, depth int")


def test_domain_trust(urls):
    got = {
        r["id"]: r["t"]
        for r in urls.select("id", P.domain_trust_col("url").alias("t")).collect()
    }
    assert got[0] == 0.9          # wikipedia
    assert got[1] == 0.85         # github
    assert got[2] == 0.85         # .edu
    assert got[3] == 0.80         # .gov
    assert got[4] == 0.5          # default
    assert got[8] == 0.75         # medium


def test_priority_formula(urls):
    rows = {
        r["id"]: r
        for r in urls.select(
            "id",
            P.priority_col("url", "depth").alias("p"),
            P.is_high_priority("url", "depth").alias("high"),
            P.should_skip("url", "depth").alias("skip"),
        ).collect()
    }
    # wikipedia root at depth 0, content-free path: .9*.4 + 1*.3 + 1*.3
    assert rows[0]["p"] == pytest.approx(0.96)
    assert rows[0]["high"] and not rows[0]["skip"]
    # /admin/ page: trust .5*.4 + 1*.3 + .5*.3
    assert rows[4]["p"] == pytest.approx(0.2 + 0.3 + 0.15)
    # very long URL penalty applied
    assert rows[5]["p"] < rows[0]["p"]
    # >5 query params (-0.2) + /post/ bonus (+0.2) at depth 2
    assert rows[6]["p"] == pytest.approx(0.5 * 0.4 + 0.4 * 0.3 + 0.3 * 1.0)
    # everything clamped to [0, 1]
    for r in rows.values():
        assert 0.0 <= r["p"] <= 1.0


def test_link_priority(spark):
    df = spark.createDataFrame(
        [(0, True, "read more"), (3, False, None), (9, False, "")],
        "depth int, main boolean, anchor string",
    )
    got = [
        r["p"]
        for r in df.select(
            P.link_priority_col("depth", "main", "anchor").alias("p")
        ).collect()
    ]
    assert got[0] == pytest.approx(1.0 - 0.0 + 0.5 + 0.2)
    assert got[1] == pytest.approx(1.0 - 0.3)
    assert got[2] == pytest.approx(0.1)  # floor


def test_simhash_plan_no_python_no_blowup(spark):
    """Scale regression guard for the reworked simhash fingerprints:
    the plan must contain NO Python evaluation (pure JVM column math)
    and NO per-bit row explosion (the old path joined every posting
    against 64 bit-rows; the new one hashes each distinct term once
    and folds 64 aggregate columns)."""
    import io
    from contextlib import redirect_stdout

    from search_engine_spark.ops.simhash import simhash_fingerprints

    postings = spark.createDataFrame(
        [("alpha", 0, 2), ("beta", 0, 1), ("alpha", 1, 1)],
        "term string, docid long, tf int",
    )
    fp = simhash_fingerprints(postings)
    buf = io.StringIO()
    with redirect_stdout(buf):
        fp.explain(mode="formatted")
    plan = buf.getvalue()
    for op in ("BatchEvalPython", "ArrowEvalPython",
               "FlatMapGroupsInPandas", "MapInPandas"):
        assert op not in plan, op        # pure JVM column math
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan        # no explode of a 64-row table
    # and the semantics still match the reference bit layout
    import hashlib

    rows = {r["docid"]: r["simhash"] for r in fp.collect()}

    def py_fp(term_tfs):
        sums = [0] * 64
        for term, tf in term_tfs:
            h = int(hashlib.md5(term.encode()).hexdigest()[:16], 16)
            for j in range(64):
                bit = (h >> (63 - j)) & 1
                sums[j] += tf * (2 * bit - 1)
        v = 0
        for j in range(64):
            if sums[j] > 0:
                v |= 1 << (63 - j)
        return v - (1 << 64) if v >= (1 << 63) else v

    assert rows[0] == py_fp([("alpha", 2), ("beta", 1)])
    assert rows[1] == py_fp([("alpha", 1)])


def test_similarity_pct(spark):
    """X4: similarity % = (1 - hamming/64) * 100
    (SimHashService.java:89-92)."""
    from search_engine_spark.ops.simhash import similarity_pct

    df = spark.createDataFrame([(0,), (3,), (64,)], "h int")
    got = [
        r["s"] for r in df.select(similarity_pct(F.col("h")).alias("s")).collect()
    ]
    assert got == [100.0, pytest.approx((1 - 3 / 64) * 100), 0.0]


def test_admission_glob_filter(spark):
    df = spark.createDataFrame(
        [("src/main/App.java",), ("src/test/AppTest.java",),
         ("docs/readme.md",), ("build/out.class",)],
        "path string",
    )
    adm = df.filter(
        P.admission_col("path", include=["src/*", "docs/*"],
                        exclude=["*test*", "*.class"])
    )
    assert [r["path"] for r in adm.collect()] == [
        "src/main/App.java", "docs/readme.md"
    ]
    # empty include admits everything not excluded
    adm2 = df.filter(P.admission_col("path", include=None, exclude=["build/*"]))
    assert adm2.count() == 3


# --- X13 strategy-pattern priorities ---------------------------------------

def test_bfs_priority(spark):
    df = spark.createDataFrame(
        [(0,), (1,), (5,), (11,)], "depth int"
    )
    got = [
        r["p"]
        for r in df.select(P.bfs_priority_col("depth").alias("p"))
        .orderBy(F.desc("p"))
        .collect()
    ]
    assert got == [100.0, 90.0, 50.0, 0.0]  # floor at 0, -10*depth


def test_best_first_priority(spark):
    df = spark.createDataFrame(
        [
            (0, 0.8, 0.9, 0),     # known everything, depth 0
            (1, None, 0.9, 2),    # pageRank null -> 0.5
            (2, 0.8, None, 10),   # authority null -> 0.5, zero bonus
        ],
        "id long, pr double, auth double, depth int",
    )
    got = {
        r["id"]: r["p"]
        for r in df.select(
            "id",
            P.best_first_priority_col("pr", "auth", "depth").alias("p"),
        ).collect()
    }
    assert got[0] == pytest.approx(0.8 * 50 + 0.9 * 30 + 20.0)
    assert got[1] == pytest.approx(0.5 * 50 + 0.9 * 30 + (8 / 10) * 20)
    assert got[2] == pytest.approx(0.8 * 50 + 0.5 * 30 + 0.0)


def test_focused_priority(spark):
    allowed = ["github.com", "example.net"]
    kws = ["blog", "post", "article", "page"]
    df = spark.createDataFrame(
        [
            (0, "https://github.com/blog/x", "github.com", 0.6),
            (1, "https://github.com/blog/post", "github.com", None),
            (2, "https://other.org/blog/x", "other.org", 0.9),
            (3, "https://github.com/plain", "github.com", 0.9),
        ],
        "id long, url string, host string, pr double",
    )
    got = {
        r["id"]: r["p"]
        for r in df.select(
            "id",
            P.focused_priority_col(
                "url", "host", "pr", allowed, kws, 0.2
            ).alias("p"),
        ).collect()
    }
    assert got[0] == pytest.approx(0.25 * 50 + 0.6 * 50)
    assert got[1] == pytest.approx(0.5 * 50 + 25.0)  # null pr -> flat 25
    assert got[2] == 0.0  # domain not whitelisted
    assert got[3] == 0.0  # relevance 0 < threshold


def test_opic_round_conservation(spark):
    """One cash round conserves total cash (= N nodes * 1.0) and
    matches the hand-computed distribution."""
    from search_engine_spark.ops.graph import opic_round

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["cash"] for r in opic_round(edges).collect()
    }
    # 1: spent (has out-links) + 1.0 from 4          = 1.0
    # 2: spent + 0.5 from 1                          = 0.5
    # 3: sink, keeps 1.0 + 0.5 from 1 + 1.0 from 2   = 2.5
    # 4: source with out-links, receives nothing     = 0.0
    assert got == {
        1: pytest.approx(1.0),
        2: pytest.approx(0.5),
        3: pytest.approx(2.5),
        4: pytest.approx(0.0),
    }
    assert sum(got.values()) == pytest.approx(len(got) * 1.0)
