"""Structured page content — operators/structured.py + linkgraph.anchor_rel.

The registry parity gate (test_queries.py) cross-checks q_jsonld_types /
q_nofollow_edges / q_html_tables against DuckDB on the synthesized
corpus; this file pins the pieces on hand-written inputs the synthesis
doesn't produce (malformed JSON blocks, nofollow token boundaries,
ragged/empty tables) plus the no-Python/no-shuffle plan shape.
"""

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import structured as S
from corsearch_project_spark.operators import linkgraph as L


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pages(spark, html, url="https://a.com/p"):
    return spark.createDataFrame([(url, html)], "url string, html string")


# ------------------------------------------------------------ JSON-LD

def test_jsonld_entities_multiblock_and_malformed(spark):
    html = (
        '<html><script type="application/ld+json">'
        '{"@type":"Product","name":"X 1"}</script>'
        '<script type="application/ld+json">not json at all</script>'
        '<script type="application/ld+json">{"name":"typeless"}</script>'
        "</html>"
    )
    rows = sorted(
        (r["jtype"], r["name"])
        for r in S.jsonld_entities(_pages(spark, html)).collect()
    )
    # Malformed JSON degrades to an empty-typed row (never a task error);
    # a missing @type or name degrades to ''.
    assert rows == [("", ""), ("", "typeless"), ("Product", "X 1")]


def test_jsonld_no_blocks_no_rows(spark):
    assert S.jsonld_entities(_pages(spark, "<html><body>x</body></html>")
                             ).count() == 0


def test_jsonld_census_counts_distinct_names(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/1",
             '<script type="application/ld+json">'
             '{"@type":"Product","name":"N1"}</script>'),
            ("https://a.com/2",
             '<script type="application/ld+json">'
             '{"@type":"Product","name":"N1"}</script>'),
            ("https://a.com/3",
             '<script type="application/ld+json">'
             '{"@type":"Product","name":"N2"}</script>'),
        ],
        "url string, html string",
    )
    r = S.jsonld_type_census(pages).head()
    assert (r["host"], r["jtype"], r["n_entities"], r["n_names"]) == (
        "a.com", "Product", 3, 2)


def test_jsonld_payloads_projection_pure(spark):
    df = _pages(spark, "x").select(
        S.jsonld_payloads(F.col("html")).alias("j"))
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# ----------------------------------------------------------- nofollow

NOFOLLOW_CASES = [
    ('<a href="https://b.com/1" rel="nofollow">x</a>', True),
    ('<a href="https://b.com/1" rel="ugc nofollow">x</a>', True),
    ('<a href="https://b.com/1" rel="nofollow sponsored">x</a>', True),
    ('<a href="https://b.com/1" rel="a nofollow b">x</a>', True),
    # token boundary: nofollow must be a whole token of the rel value
    ('<a href="https://b.com/1" rel="nofollower">x</a>', False),
    ('<a href="https://b.com/1" rel="sponsored">x</a>', False),
    ('<a href="https://b.com/1">x</a>', False),
]


@pytest.mark.parametrize("html,want", NOFOLLOW_CASES)
def test_anchor_rel_token_boundary(spark, html, want):
    got = _pages(spark, html).select(
        L.anchor_rel(F.col("html")).alias("a")).head()["a"]
    assert len(got) == 1 and got[0]["nofollow"] is want, (html, got)


def test_host_edges_rel_counts_and_reconciliation(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/1",
             '<a href="https://b.com/x" rel="nofollow">1</a>'
             '<a href="https://b.com/y">2</a>'
             '<a href="/rel">self</a>'),
            ("https://a.com/2", '<a href="https://b.com/z">3</a>'),
        ],
        "url string, html string",
    )
    got = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_followed"])
        for r in L.host_edges_rel(pages).collect()
    }
    assert got == {("a.com", "b.com"): (3, 2), ("a.com", "a.com"): (1, 1)}
    # n_links reconciles exactly with the rel-blind host_edges on an
    # anchors-only page set (same self-resolution convention).
    base = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in L.host_edges(pages).collect()
    }
    assert base == {k: v[0] for k, v in got.items()}


# ------------------------------------------------------------- tables

def test_table_stats_shapes(spark):
    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td>b</td></tr>"
        "<tr><td>ragged</td></tr></table>"
        "<table><tr><td>solo</td></tr></table>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = S.table_stats(df).head()
    assert (r["n_tables"], r["n_rows"], r["n_cells"], r["header"]) == (
        2, 4, 6, "k|v")


def test_table_stats_tableless_page(spark):
    df = spark.createDataFrame([(1, "<html><p>no tables</p></html>")],
                               "doc_id long, html string")
    r = S.table_stats(df).head()
    assert (r["n_tables"], r["n_rows"], r["n_cells"], r["header"]) == (
        0, 0, 0, "")


def test_table_kv_two_cell_rows_only(spark):
    html = (
        "<table><tr><td>Weight</td><td>2 kg</td></tr>"
        "<tr><td>one-cell</td></tr>"
        "<tr><td>a</td><td>b</td><td>c</td></tr>"
        "<tr><td>Color</td><td>red</td></tr></table>"
    )
    got = sorted(
        (r["key"], r["value"])
        for r in S.table_kv(_pages(spark, html)).collect()
    )
    assert got == [("Color", "red"), ("Weight", "2 kg")]


def test_table_stats_projection_pure(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, html string")
    plan = _plan(S.table_stats(df))
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# ------------------------------------------------------ RSS/Atom feeds

FEED_HTML = (
    '<html><head>'
    '<link rel="stylesheet" href="/s.css">'
    '<link rel="alternate" type="application/rss+xml" title="R"'
    ' href="https://a.com/feed.xml">'
    '<link rel="alternate" type="application/atom+xml"'
    ' href="https://a.com/atom.xml">'
    '<link rel="canonical" href="https://a.com/p">'
    "</head></html>"
)


def test_feed_targets_discovers_both_kinds_skips_decoys(spark):
    rows = sorted(
        (r["ftype"], r["feed_url"])
        for r in S.feed_targets(_pages(spark, FEED_HTML)).collect()
    )
    assert rows == [
        ("atom", "https://a.com/atom.xml"),
        ("rss", "https://a.com/feed.xml"),
    ]


def test_feed_targets_hrefless_tag_dropped(spark):
    html = '<link rel="alternate" type="application/rss+xml">'
    assert S.feed_targets(_pages(spark, html)).count() == 0


def test_feed_census_distinct_feed_urls(spark):
    tag = (
        '<link rel="alternate" type="application/rss+xml"'
        ' href="https://a.com/feed.xml">'
    )
    pages = spark.createDataFrame(
        [(f"https://a.com/p{i}", tag) for i in range(3)],
        "url string, html string",
    )
    row = S.feed_census(pages).collect()[0]
    assert (row["host"], row["ftype"], row["n_pages"], row["n_feeds"]) == (
        "a.com", "rss", 3, 1
    )


RSS_XML = (
    '<rss version="2.0"><channel><title>Chan</title>'
    "<item><title>P1</title><link>https://a.com/1</link>"
    "<pubDate>2026-01-05</pubDate></item>"
    "<item><title>P2</title><link>https://a.com/2</link>"
    "<pubDate>2026-01-06</pubDate></item>"
    "</channel></rss>"
)
ATOM_XML = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
    '<entry><title>E1</title><link href="https://a.com/a/1"/>'
    "<updated>2026-02-03</updated></entry></feed>"
)


def _feeds(spark, rows):
    return spark.createDataFrame(rows, "feed_url string, xml string")


def test_feed_entries_rss_and_atom_shapes(spark):
    df = S.feed_entries(
        _feeds(spark, [("f1", RSS_XML), ("f2", ATOM_XML)])
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        ("f1", "rss", "P1", "https://a.com/1", "2026-01-05"),
        ("f1", "rss", "P2", "https://a.com/2", "2026-01-06"),
        ("f2", "atom", "E1", "https://a.com/a/1", "2026-02-03"),
    ]
    # channel/feed-level <title> never leaks into entry titles
    assert not any("Chan" in r[2] or r[2] == "F" for r in rows)


def test_feed_entries_nonfeed_yields_no_rows(spark):
    assert S.feed_entries(
        _feeds(spark, [("f", "<html><body>not a feed</body></html>")])
    ).count() == 0


def test_feed_projections_pure(spark):
    tgt = S.feed_targets(_pages(spark, FEED_HTML))
    ent = S.feed_entries(_feeds(spark, [("f", RSS_XML)]))
    for df in (tgt, ent):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
            assert marker not in plan, plan
