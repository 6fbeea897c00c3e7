"""HTML head-metadata extraction — operators/pagemeta.py.

Pin the documented subset contract (conventional attribute order,
double-quoted values, five-entity unescape with &amp; last) and the
no-Python/no-shuffle plan shape.
"""

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import pagemeta as M


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_head_fields_extracted(spark):
    html = (
        '<html lang="EN"><head><title> A  &amp; &lt;B&gt; </title>'
        '<meta name="description" content="d &quot;x&quot; &#39;y&#39;">'
        '<meta property="og:title" content="OG">'
        '<link rel="canonical" href="https://a.com/base"></head>'
        "<body>ignored</body></html>"
    )
    pages = spark.createDataFrame([("https://a.com/v", html)],
                                  "url string, html string")
    r = M.page_metadata(pages).head()
    assert r["title"] == "A & <B>"
    assert r["description"] == "d \"x\" 'y'"
    assert r["canonical"] == "https://a.com/base"
    assert r["og_title"] == "OG"
    assert r["lang"] == "en"


def test_missing_fields_default(spark):
    """No head metadata at all: empty strings, canonical falls back to
    the page's own url (always a usable dedup key)."""
    pages = spark.createDataFrame([("https://a.com/x", "<html></html>")],
                                  "url string, html string")
    r = M.page_metadata(pages).head()
    assert (r["title"], r["description"], r["og_title"], r["lang"]) == \
        ("", "", "", "")
    assert r["canonical"] == "https://a.com/x"


def test_double_escape_resolves_amp_last(spark):
    """&amp;lt; must yield the literal text '&lt;', not '<'."""
    pages = spark.createDataFrame(
        [("u", "<html><head><title>&amp;lt;tag&amp;gt;</title></head></html>")],
        "url string, html string")
    assert M.page_metadata(pages).head()["title"] == "&lt;tag&gt;"


def test_multiline_title_normalized(spark):
    pages = spark.createDataFrame(
        [("u", "<html><head><title>\n  one\n   two  \n</title></head></html>")],
        "url string, html string")
    assert M.page_metadata(pages).head()["title"] == "one two"


def test_metadata_plan_pure_codegen(spark):
    """All six columns are one projection: no Python stage, no exchange."""
    pages = spark.createDataFrame([("u", "<html></html>")],
                                  "url string, html string")
    plan = _plan(M.page_metadata(pages))
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Exchange" not in plan


def test_canonical_groups_counts(spark):
    """Variants collapse onto the declared target; unfetched targets show
    n_self=0 (frontier candidates); undeclared pages self-group."""
    mk = '<html><head><link rel="canonical" href="{c}"></head></html>'
    pages = spark.createDataFrame(
        [
            ("https://a.com/base", mk.format(c="https://a.com/base")),
            ("https://a.com/v1", mk.format(c="https://a.com/base")),
            ("https://a.com/v2", mk.format(c="https://a.com/base")),
            # target never fetched:
            ("https://b.com/m", mk.format(c="https://b.com/base")),
            # declares nothing:
            ("https://c.com/solo", "<html></html>"),
        ],
        "url string, html string",
    )
    got = {r["canonical"]: (r["n_variants"], r["n_self"])
           for r in M.canonical_groups(pages).collect()}
    assert got == {
        "https://a.com/base": (3, 1),
        "https://b.com/base": (1, 0),
        "https://c.com/solo": (1, 1),
    }


def test_hreflang_pairs_extraction(spark):
    html = ('<html><head>'
            '<link rel="alternate" hreflang="FR" href="https://a.com/fr">'
            '<link rel="alternate" hreflang="de-AT" href="https://a.com/de">'
            '<link rel="canonical" href="https://a.com/">'  # not an alternate
            '</head></html>')
    pages = spark.createDataFrame([(html,)], "html string")
    got = [(x["lang"], x["href"]) for x in
           pages.select(M.hreflang_pairs(F.col("html")).alias("p")).head()["p"]]
    assert got == [("fr", "https://a.com/fr"), ("de-at", "https://a.com/de")]


def test_hreflang_reciprocity_counts(spark):
    """A<->B reciprocate; A->C dangles (C declares nothing back)."""
    mk = ('<html><head><link rel="alternate" hreflang="fr" href="{h}">'
          '{extra}</head></html>')
    pages = spark.createDataFrame(
        [
            ("https://a.com/en", mk.format(
                h="https://b.com/fr",
                extra='<link rel="alternate" hreflang="de" href="https://c.com/de">')),
            ("https://b.com/fr", mk.format(h="https://a.com/en", extra="")),
            ("https://c.com/de", "<html></html>"),
        ],
        "url string, html string",
    )
    got = {r["host"]: (r["n_alt"], r["n_reciprocal"])
           for r in M.hreflang_reciprocity(pages).collect()}
    # c.com declares nothing -> absent from the edge relation entirely
    assert got == {"a.com": (2, 1), "b.com": (1, 1)}


def test_tag_sequence_and_template_hash(spark):
    """Same DOM shape, different content -> identical fingerprint;
    closing tags and attribute values never enter the sequence."""
    a = '<html><body CLASS="x"><p>hello</p><p>one</p></body></html>'
    b = '<html><body class="y"><p>totally</p><p>different</p></body></html>'
    c = '<html><body><p>extra</p><p>para</p><p>graph</p></body></html>'
    df = spark.createDataFrame([(a,), (b,), (c,)], "html string")
    seqs = [r["s"] for r in
            df.select(M.tag_sequence(F.col("html")).alias("s")).collect()]
    assert seqs[0] == ["html", "body", "p", "p"] == seqs[1]
    assert seqs[2] == ["html", "body", "p", "p", "p"]
    hashes = [r["h"] for r in
              df.select(M.template_hash(F.col("html")).alias("h")).collect()]
    assert hashes[0] == hashes[1] != hashes[2]


def test_host_templates_census(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/1", "<html><body><p>x</p></body></html>"),
            ("https://a.com/2", "<html><body><p>y</p></body></html>"),
            ("https://a.com/3", "<html><body><div>z</div></body></html>"),
            ("https://b.com/1", "<html><body></body></html>"),
        ],
        "url string, html string",
    )
    got = {r["host"]: (r["n_pages"], r["n_templates"], r["top_template_n"])
           for r in M.host_templates(pages).collect()}
    assert got == {"a.com": (3, 2, 2), "b.com": (1, 1, 1)}


def test_meta_robots_directives(spark):
    from corsearch_project_spark.operators.pagemeta import meta_robots

    cases = [
        ('<meta name="robots" content="noindex, nofollow">', True, True),
        ('<meta name="robots" content="noindex">', True, False),
        ('<meta name="robots" content="NOFOLLOW">', False, True),
        ('<meta name="robots" content="none">', True, True),
        ('<meta name="robots" content="index, follow">', False, False),
        ("<p>no meta at all</p>", False, False),
        # token-boundary: 'noindexing' is NOT a noindex directive
        ('<meta name="robots" content="noindexing">', False, False),
    ]
    df = spark.createDataFrame(
        [(h,) for h, _, _ in cases], "html string"
    ).select("html", meta_robots(F.col("html")).alias("r"))
    got = [(r["r"]["noindex"], r["r"]["nofollow"]) for r in df.collect()]
    assert got == [(a, b) for _, a, b in cases]

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_heading_outline_levels_order_and_decoys(spark):
    """Outline extraction: document order preserved, attributed tags and
    entities handled, heading-like prose in <p> never matches, pages
    without headings emit nothing."""
    from corsearch_project_spark.operators.pagemeta import heading_outline

    rows = [
        ("a", '<h1 class="t">One &amp; Two</h1><p>an h2 level decoy</p>'
              "<h3> spaced   text </h3><h2>last</h2>"),
        ("b", "<p>no headings at all</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = sorted(
        (r["url"], r["pos"], r["level"], r["heading"])
        for r in heading_outline(df).collect()
    )
    assert got == [
        ("a", 0, 1, "One & Two"),
        ("a", 1, 3, "spaced text"),
        ("a", 2, 2, "last"),
    ]
    plan = heading_outline(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan
