"""Seeded randomized fuzz for the round-4 structured-content/QA operators.

JSON-LD pull, table extraction, srcset parsing, nofollow probing,
publish-date priority and the mojibake counter are pure-Column regex/JSON
programs over hostile markup — the assertions are INVARIANTS, not golden
values:

* nothing ever raises (malformed input degrades, never crashes);
* jsonld_entities emits one row per ld+json block, never null columns;
* table_stats counts are consistent (n_tables/n_rows/n_cells >= 0,
  rows imply tables, cells imply rows; header '' iff no rows survive);
* image_assets never emits an empty asset;
* publish_date src is always one of meta/jsonld/url/none and date is ''
  exactly when src is 'none';
* anchor_rel emits one struct per opening anchor tag with a non-null
  nofollow bit;
* paginate_chains over random functional next-graphs: resolved rows have
  0 <= pos < chain_len and heads at pos 0; unresolved rows are exactly
  the normalized ('', -1, -1) shape.
"""

import random

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import linkgraph as L
from corsearch_project_spark.operators import pagemeta as M
from corsearch_project_spark.operators import structured as S
from corsearch_project_spark.operators import textstats as X

N = 200


def _rng():
    return random.Random(20260819)


def _junk(rng, n):
    alphabet = 'abcXYZ0189 <>"\'&;:/\\\n\r\t.?=#%()*$^|[]{}é中�Ãâ€Â'
    return "".join(rng.choice(alphabet) for _ in range(n))


@pytest.fixture(scope="module")
def fuzz_pages(spark):
    rng = _rng()
    rows = []
    for i in range(N):
        parts = [_junk(rng, rng.randrange(40))]
        n_blocks = rng.randrange(3)
        for _ in range(n_blocks):
            payload = rng.choice(
                [
                    '{"@type":"Product","name":"' + _junk(rng, 5).replace('"', "") + '"}',
                    '{"name":"x"}',
                    _junk(rng, 12).replace("</script>", ""),
                    "",
                ]
            )
            parts.append(
                '<script type="application/ld+json">%s</script>' % payload
            )
        for _ in range(rng.randrange(3)):
            cells = "".join(
                "<td>%s</td>" % _junk(rng, 4).replace("<", "")
                for _ in range(rng.randrange(4))
            )
            parts.append("<table><tr>%s</tr></table>" % cells)
        for _ in range(rng.randrange(3)):
            href = _junk(rng, 8).replace('"', "")
            rel = rng.choice(["", ' rel="nofollow"', ' rel="x"'])
            parts.append('<a href="%s"%s>t</a>' % (href, rel))
        for _ in range(rng.randrange(2)):
            parts.append(
                '<img src="%s" srcset="%s">'
                % (
                    _junk(rng, 6).replace('"', ""),
                    _junk(rng, 12).replace('"', ""),
                )
            )
        rng.shuffle(parts)
        rows.append(
            ("https://h%d.example.com/%s" % (i % 7, _junk(rng, 6).replace(" ", "")),
             "".join(parts), i, n_blocks)
        )
    return spark.createDataFrame(
        rows, "url string, html string, i long, n_blocks long"
    )


def test_jsonld_block_per_row_and_no_nulls(spark, fuzz_pages):
    ent = S.jsonld_entities(fuzz_pages)
    got = ent.collect()  # must not raise
    # one row per embedded block across the corpus
    want = fuzz_pages.agg(F.sum("n_blocks")).head()[0]
    assert len(got) == want
    assert all(r["jtype"] is not None and r["name"] is not None for r in got)


def test_table_stats_invariants(spark, fuzz_pages):
    rows = S.table_stats(fuzz_pages, id_col="i").collect()
    assert len(rows) == N
    for r in rows:
        assert r["n_tables"] >= 0 and r["n_rows"] >= 0 and r["n_cells"] >= 0
        if r["n_rows"] > 0:
            assert r["n_tables"] > 0
        if r["n_cells"] > 0:
            assert r["n_rows"] > 0
        if r["n_rows"] == 0:
            assert r["header"] == ""


def test_image_assets_never_empty(spark, fuzz_pages):
    for r in S.image_assets(fuzz_pages).collect():
        assert r["asset"] != "" and r["asset"] is not None


def test_anchor_rel_one_struct_per_tag(spark, fuzz_pages):
    got = fuzz_pages.select(
        F.size(F.regexp_extract_all(
            "html", F.lit(L.ANCHOR_OPEN_PATTERN), F.lit(0))).alias("n_tags"),
        F.size(L.anchor_rel(F.col("html"))).alias("n_structs"),
        L.anchor_rel(F.col("html")).alias("a"),
    ).collect()
    for r in got:
        assert r["n_tags"] == r["n_structs"]
        assert all(x["nofollow"] is not None for x in r["a"])


def test_publish_date_total_and_consistent(spark, fuzz_pages):
    rows = fuzz_pages.select(
        M.publish_date(F.col("html"), F.col("url")).alias("p")
    ).collect()
    assert len(rows) == N
    for r in rows:
        p = r["p"]
        assert p["src"] in ("meta", "jsonld", "url", "none")
        assert (p["date"] == "") == (p["src"] == "none")


def test_mojibake_and_soft404_never_raise(spark, fuzz_pages):
    out = fuzz_pages.select(
        X.mojibake_hits(F.col("html")).alias("m"),
        M.soft404(F.col("html"), F.col("html")).alias("s"),
    ).collect()
    assert len(out) == N
    assert all(r["m"] >= 0 and r["s"] in (True, False) for r in out)


def test_paginate_chains_random_functional_graph(spark):
    """Random functional next-graphs (each src points to one dst drawn
    from a small url space — chains, trees-onto-chains, cycles all
    arise). Invariants partition the members exactly."""
    rng = _rng()
    urls = ["u%d" % i for i in range(60)]
    edges = []
    for src in rng.sample(urls, 40):
        dst = rng.choice([u for u in urls if u != src])
        edges.append((src, dst))
    # duplicate dsts (two pages declaring the same next) are legal input:
    # the operator keeps min(src) per dst deterministically
    df = spark.createDataFrame(edges, "src string, dst string")
    out = L.paginate_chains(df).collect()
    members = set()
    for r in out:
        members.add(r["url"])
        if r["resolved"]:
            assert 0 <= r["pos"] < r["chain_len"]
            if r["pos"] == 0:
                assert r["head_url"] == r["url"]
        else:
            assert (r["head_url"], r["pos"], r["chain_len"]) == ("", -1, -1)
    rows = df.collect()
    want_members = {r["src"] for r in rows} | {r["dst"] for r in rows}
    assert members == want_members
