"""Host link graph: href extraction + integer-quantized PageRank
(functions/linkgraph.py, functions/html.py::extract_links_col)."""

from pyspark.sql import functions as F

from rasters_jl_spark.functions.linkgraph import PR_D_PCT, PR_UNITS, pagerank


def _py_pagerank(edges, iters=3, units=PR_UNITS, d_pct=PR_D_PCT):
    """Pure-Python reference with the SAME integer ops as the engine."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = units // n
    tele = ((100 - d_pct) * base) // 100
    rank = {v: base for v in nodes}
    for _ in range(iters):
        inbox = {v: 0 for v in nodes}
        for s, d in edges:
            inbox[d] += rank[s] // outdeg[s]
        dang = sum(rank[v] for v in nodes if v not in outdeg)
        rank = {
            v: tele + (d_pct * (inbox[v] + dang // n)) // 100 for v in nodes
        }
    return rank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank_u"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_python_reference(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "a"), ("d", "b"), ("d", "c"),
    ]
    assert _run(spark, edges) == _py_pagerank(edges)


def test_pagerank_dangling_mass_redistributes(spark):
    # z has no outlinks: its mass must spread, not vanish
    edges = [("a", "z"), ("b", "z"), ("a", "b")]
    got = _run(spark, edges)
    want = _py_pagerank(edges)
    assert got == want
    # total mass conserved up to integer floor loss
    assert sum(got.values()) <= PR_UNITS
    assert sum(got.values()) >= PR_UNITS - 1000


def test_pagerank_sink_attracts_rank(spark):
    # star into z: z must outrank the spokes
    edges = [("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")]
    got = _run(spark, edges)
    assert got["z"] == max(got.values())


def test_extract_links_variants(spark):
    from rasters_jl_spark.functions.html import extract_links_col

    df = spark.createDataFrame(
        [
            (1, '<a href="https://x.com/a">A</a> text <A HREF=\'http://y.org/b\'>B</A>'),
            (2, '<a class="z" href="https://q.net/c?u=1">C</a><a>no href</a>'),
            (3, "no links at all"),
            (4, None),
        ],
        "id int, html string",
    )
    out = {
        r["id"]: r["links"]
        for r in df.select(
            "id", extract_links_col(F.col("html")).alias("links")
        ).collect()
    }
    assert out[1] == ["https://x.com/a", "http://y.org/b"]
    assert out[2] == ["https://q.net/c?u=1"]
    assert out[3] == [] and out[4] == []
