"""Crawl/corpus QA operators — mojibake, soft-404, image assets.

The registry parity gate cross-checks q_mojibake / q_soft404 /
q_image_assets against DuckDB on the synthesized corpus; this file pins
the pieces on hand-written inputs (trailing lead sequences, phrase/length
gate combinations, srcset microsyntax corners) plus plan shapes.
"""

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import pagemeta as M
from corsearch_project_spark.operators import structured as S
from corsearch_project_spark.operators import textstats as X


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ mojibake

MOJI_CASES = [
    ("cafÃ© â€œxâ€", 2),  # Ã© + â€œ; trailing â€ lacks a trailer
    ("ÃÃÃ", 1),  # ÃÃ consumed, lone trailing Ã uncounted
    ("plain ascii text", 0),
    ("Â nbsp mojibake", 1),  # Â + nbsp trailer
]


@pytest.mark.parametrize("text,want", MOJI_CASES)
def test_mojibake_hits(spark, text, want):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(X.mojibake_hits(F.col("text")).alias("h")).head()["h"]
    assert got == want, (text, got)


def test_mojibake_census_branches(spark):
    df = spark.createDataFrame(
        [("a", "clean"), ("a", "cafÃ© naÃ¯ve"),
         ("b", "clean too")],
        "host string, text string",
    )
    got = {r["host"]: (r["n_docs"], r["n_suspect"], r["hits_total"])
           for r in X.mojibake_census(df).collect()}
    assert got == {"a": (2, 1, 2), "b": (1, 0, 0)}


# ------------------------------------------------------------ soft-404

SOFT404_CASES = [
    # phrase in title, short body -> flagged
    ("<title>404 Not Found</title>", "tiny", True),
    # phrase in body, short -> flagged
    ("<title>Oops</title>", "this page does not exist", True),
    # phrase but long body -> NOT flagged (length gate)
    ("<title>article</title>", "404 " + "w" * 600, False),
    # short but clean -> NOT flagged (phrase gate)
    ("<title>stub</title>", "short stub", False),
]


@pytest.mark.parametrize("html,text,want", SOFT404_CASES)
def test_soft404_gates(spark, html, text, want):
    df = spark.createDataFrame([(html, text)], "html string, text string")
    got = df.select(
        M.soft404(F.col("html"), F.col("text")).alias("s")).head()["s"]
    assert got is want, (html, text, got)


def test_soft404_projection_pure(spark):
    df = spark.createDataFrame([("x", "y")], "html string, text string")
    plan = _plan(df.select(M.soft404(F.col("html"), F.col("text"))))
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# -------------------------------------------------------- image assets

def test_image_assets_src_and_srcset(spark):
    html = (
        '<img src="/i/a.png">'
        '<img srcset="https://c.net/x-2x.jpg 2x, /i/x.png 1x" src="/i/x.png">'
        '<img alt="no source">'
        "<p>not an img</p>"
    )
    df = spark.createDataFrame([("https://h.com/p", html)],
                               "url string, html string")
    got = sorted(r["asset"] for r in S.image_assets(df).collect())
    # srcset candidates split at first space; src-less tag contributes
    # nothing; the duplicated /i/x.png ref is kept (refs, not distinct)
    assert got == ["/i/a.png", "/i/x.png", "/i/x.png",
                   "https://c.net/x-2x.jpg"]


def test_image_asset_census_offsite_split(spark):
    df = spark.createDataFrame(
        [("https://h.com/1",
          '<img src="https://cdn.net/a.jpg"><img src="/local.png">'
          '<img src="https://h.com/self.png">'),
         ("https://h.com/2", '<img src="https://cdn.net/a.jpg">')],
        "url string, html string",
    )
    r = S.image_asset_census(df).head()
    # 4 refs, 3 distinct assets, 1 offsite (cdn.net; the absolute
    # same-host and relative assets are onsite)
    assert (r["host"], r["n_refs"], r["n_assets"], r["n_offsite"]) == (
        "h.com", 4, 3, 1)


def test_image_assets_no_python_stage(spark):
    df = spark.createDataFrame([("u", "x")], "url string, html string")
    plan = _plan(S.image_assets(df))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# -------------------------------------------------------- publish dates

def test_publish_date_priority_meta_over_jsonld_over_url(spark):
    html = (
        '<meta property="article:published_time" content="2024-05-06T10:00:00Z">'
        '<script type="application/ld+json">'
        '{"@type":"Article","datePublished":"2023-01-02"}</script>'
    )
    df = spark.createDataFrame(
        [(f"https://h.com/2022/03/x", html)], "url string, html string")
    r = df.select(M.publish_date(F.col("html"), F.col("url")).alias("p")
                  ).head()["p"]
    assert (r["date"], r["src"]) == ("2024-05-06", "meta")


def test_publish_date_jsonld_first_dated_block(spark):
    html = (
        '<script type="application/ld+json">{"@type":"BreadcrumbList"}</script>'
        '<script type="application/ld+json">'
        '{"@type":"Article","datePublished":"2021-07-08T09:00:00+02:00"}'
        "</script>"
    )
    df = spark.createDataFrame([("https://h.com/p", html)],
                               "url string, html string")
    r = df.select(M.publish_date(F.col("html"), F.col("url")).alias("p")
                  ).head()["p"]
    assert (r["date"], r["src"]) == ("2021-07-08", "jsonld")


def test_publish_date_url_month_precision_and_none(spark):
    df = spark.createDataFrame(
        [("https://h.com/2019/11/post", "<html></html>"),
         ("https://h.com/p/1", "<html></html>")],
        "url string, html string")
    got = {r["url"]: r["p"] for r in df.select(
        "url", M.publish_date(F.col("html"), F.col("url")).alias("p")
    ).collect()}
    assert (got["https://h.com/2019/11/post"]["date"],
            got["https://h.com/2019/11/post"]["src"]) == ("2019-11-01", "url")
    assert (got["https://h.com/p/1"]["date"],
            got["https://h.com/p/1"]["src"]) == ("", "none")


def test_publish_date_projection_pure(spark):
    df = spark.createDataFrame([("u", "h")], "url string, html string")
    plan = _plan(df.select(M.publish_date(F.col("html"), F.col("url"))))
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# ----------------------------------------------------- pagination chains

from corsearch_project_spark.operators import linkgraph as L


def test_paginate_chains_positions_and_cycle(spark):
    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", "a4"),
         ("b1", "b2"),
         ("c1", "c2"), ("c2", "c1")],
        "src string, dst string")
    got = {r["url"]: (r["head_url"], r["pos"], r["chain_len"], r["resolved"])
           for r in L.paginate_chains(edges).collect()}
    assert got == {
        "a1": ("a1", 0, 4, True), "a2": ("a1", 1, 4, True),
        "a3": ("a1", 2, 4, True), "a4": ("a1", 3, 4, True),
        "b1": ("b1", 0, 2, True), "b2": ("b1", 1, 2, True),
        "c1": ("", -1, -1, False), "c2": ("", -1, -1, False),
    }


def test_paginate_chains_max_len_cap(spark):
    """A chain longer than max_len hops stays unresolved past the cap:
    after ceil(log2(4))=2 doubling rounds the pointer has jumped at most
    4 hops, so the 6th page of a 6-chain cannot reach the head."""
    edges = spark.createDataFrame(
        [(f"a{i}", f"a{i+1}") for i in range(1, 6)],
        "src string, dst string")
    got = {r["url"]: r for r in L.paginate_chains(edges, max_len=4).collect()}
    assert got["a5"]["resolved"] is True and got["a5"]["pos"] == 4
    assert got["a6"]["resolved"] is False


def test_next_links_extraction(spark):
    df = spark.createDataFrame(
        [("u1", '<link rel="next" href="u2"><link rel="stylesheet" href="c">'),
         ("u2", "<html></html>")],
        "url string, html string")
    got = [(r["src"], r["dst"]) for r in L.next_links(df).collect()]
    assert got == [("u1", "u2")]


# ----------------------------------------------------------- blocklist

BL_CASES = [
    # (url, text, term_hits, url_blocked)
    ("https://ok.example.com/a", "clean prose here", 0, False),
    ("https://ok.example.com/b", "has zorblax once", 1, False),
    ("https://ok.example.com/c", "Zorblax, ZORBLAX and quuxad", 3, False),
    ("https://ok.example.com/d", "zorblaxes quuxads", 0, False),  # \b
    ("https://ok.example.com/e", "pre-zorblax hyphen", 1, False),
    ("https://bad.site.example/x", "clean", 0, True),
    ("https://deep.sub.bad.site.example/y", "clean", 0, True),
    ("https://notbad.site.example/z", "clean", 0, False),
    ("https://bad.site.example:8080/p", "clean", 0, True),  # port strip
]


def test_blocklist_census_matrix(spark):
    from corsearch_project_spark.operators.textstats import blocklist_census

    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t, _, _) in enumerate(BL_CASES)],
        "doc_id long, url string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in blocklist_census(
            df, ("zorblax", "quuxad"), ("bad.site.example",)
        ).collect()
    }
    for i, (_, _, hits, blocked) in enumerate(BL_CASES):
        r = got[i]
        assert (r["term_hits"], r["url_blocked"]) == (hits, blocked), i
        assert r["keep"] == (hits == 0 and not blocked), i


def test_blocklist_empty_terms_and_plan(spark):
    """Empty term list -> zero hits everywhere; the census must stay a
    pure projection (no Python stage, no exchange) — regex-escaping must
    neutralize metacharacters in supplied terms."""
    from corsearch_project_spark.operators.textstats import blocklist_census

    df = spark.createDataFrame(
        [(0, "https://a.example/x", "a.b matches nothing literal")],
        "doc_id long, url string, text string",
    )
    row = blocklist_census(df, (), ()).head()
    assert (row["term_hits"], row["url_blocked"], row["keep"]) == (0, False, True)

    # 'a.b' as a term must match only the literal 'a.b', not 'aXb'
    df2 = spark.createDataFrame(
        [(0, "https://a.example/x", "a.b but not axb")],
        "doc_id long, url string, text string",
    )
    assert blocklist_census(df2, ("a.b",), ()).head()["term_hits"] == 1

    plan = _plan(blocklist_census(df, ("t1",), ("d.example",)))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                   "Exchange"):
        assert marker not in plan


# ------------------------------------------------------- script census

def test_script_census_matrix(spark):
    from corsearch_project_spark.operators.textstats import script_census

    rows = [
        (0, "pure latin text"),
        (1, "привет"),                      # pure cyrillic
        (2, "abc привет"),                  # latin 3 vs cyrillic 6
        (3, "123 --- :::"),                 # nothing scripted
        (4, "你好 hello 你好吗"),            # han 5 vs latin 5 -> tie
        (5, "ひらがな"),                     # kana
        (6, "한국어"),                       # hangul
        (7, "مرحبا שלום"),                  # arabic 5 vs hebrew 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_census(df).collect()}

    assert got[0]["dominant_script"] == "latin"
    assert got[0]["dominant_permille"] == 1000
    assert got[1]["dominant_script"] == "cyrillic"
    r2 = got[2]
    assert (r2["n_latin"], r2["n_cyrillic"]) == (3, 6)
    assert r2["dominant_script"] == "cyrillic"
    assert r2["dominant_permille"] == 666  # 6*1000 div 9
    r3 = got[3]
    assert (r3["scripted_chars"], r3["dominant_script"],
            r3["dominant_permille"]) == (0, "none", 0)
    # tie at 5-5: latin precedes han in SCRIPT_ORDER -> latin wins
    r4 = got[4]
    assert (r4["n_latin"], r4["n_han"]) == (5, 5)
    assert r4["dominant_script"] == "latin"
    assert got[5]["dominant_script"] == "kana"
    assert got[6]["dominant_script"] == "hangul"
    r7 = got[7]
    assert (r7["n_arabic"], r7["n_hebrew"]) == (5, 4)
    assert r7["dominant_script"] == "arabic"


def test_script_census_plan_pure_projection(spark):
    from corsearch_project_spark.operators.textstats import script_census

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = _plan(script_census(df))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                   "Exchange"):
        assert marker not in plan
