"""Seeded randomized fuzz for the round-4 regex-based operators.

These are pure-Column regex programs (robots parsing, head metadata,
anchor/tag pulls) — the classic place where adversarial input breaks
assumptions. One seeded corpus of hostile strings goes through each
operator in a single Spark job; the assertions are INVARIANTS, not
golden values:

* nothing ever raises (malformed input degrades, never crashes);
* robots rules only ever come from the wildcard group (a poison path
  planted exclusively in named-agent groups must never surface);
* crawl_permissions is total — every input url appears exactly once;
* tag_sequence emits only lowercase tag-name-shaped strings.
"""

import random

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import linkgraph as L
from corsearch_project_spark.operators import pagemeta as M

N = 200
POISON = "/never-from-wildcard"


def _rng():
    return random.Random(20260818)


def _junk(rng, n):
    alphabet = (
        'abcXYZ0189 <>"\'&;:/\\\n\r\t.?=#%()*$^|[]{}é中�'
    )
    return "".join(rng.choice(alphabet) for _ in range(n))


@pytest.fixture(scope="module")
def fuzz_robots(spark):
    rng = _rng()
    rows = []
    for i in range(N):
        pieces = []
        # named group carrying the poison path
        pieces.append(f"User-agent: bot{i}\nDisallow: {POISON}\n")
        if rng.random() < 0.7:
            pieces.append("User-agent: *\n")
            for _ in range(rng.randrange(4)):
                kind = rng.choice(["Disallow", "Allow", "Crawl-delay"])
                val = rng.choice(
                    ["/a", "/a/b", "", "/x?q=1", _junk(rng, rng.randrange(12)),
                     str(rng.randrange(99))]
                )
                pieces.append(f"{kind}: {val}\n")
        if rng.random() < 0.5:
            pieces.append(f"User-agent: other\nDisallow: {POISON}2\n")
        # random corruption
        txt = "".join(pieces)
        if rng.random() < 0.3:
            cut = rng.randrange(max(1, len(txt)))
            txt = txt[:cut] + _junk(rng, rng.randrange(20))
        rows.append((f"h{i}.example.com", txt))
    return spark.createDataFrame(rows, "host string, robots string")


def test_robots_rules_never_leak_named_groups(spark, fuzz_robots):
    got = fuzz_robots.select(
        L.robots_rules(F.col("robots")).alias("r"),
        L.robots_crawl_delay(F.col("robots")).alias("d"),
    ).collect()
    assert len(got) == N
    for row in got:
        for r in row["r"]:
            assert r["path"] != ""  # empty rules always dropped
            assert not r["path"].startswith(POISON)
        assert row["d"] >= 0


def test_crawl_permissions_total_on_fuzz(spark, fuzz_robots):
    rng = _rng()
    urls = spark.createDataFrame(
        [(f"https://h{rng.randrange(N + 50)}.example.com/"
          + _junk(rng, rng.randrange(16)).replace("\n", ""),)
         for _ in range(N)],
        "url string",
    ).distinct()
    n_urls = urls.count()
    out = L.crawl_permissions(urls, fuzz_robots)
    assert out.count() == n_urls  # total: no url lost, none duplicated
    assert out.where(F.col("allowed").isNull()).count() == 0


def test_pagemeta_never_raises_on_junk(spark):
    rng = _rng()
    pages = spark.createDataFrame(
        [(f"https://f{i}.com/x", _junk(rng, rng.randrange(400)))
         for i in range(N)],
        "url string, html string",
    )
    meta = M.page_metadata(pages)
    assert meta.count() == N
    # canonical fallback holds even on garbage
    assert meta.where(F.col("canonical") == "").count() == 0
    tags = pages.select(
        F.explode(M.tag_sequence(F.col("html"))).alias("t")
    )
    bad = tags.where(~F.col("t").rlike("^[a-z][a-z0-9]*$")).count()
    assert bad == 0


def test_anchor_and_hreflang_pulls_never_raise(spark):
    rng = _rng()
    pages = spark.createDataFrame(
        [(f"https://f{i}.com/x", _junk(rng, rng.randrange(300)))
         for i in range(N)],
        "url string, html string",
    )
    n = pages.select(
        L.anchor_pairs(F.col("html")).alias("a"),
        M.hreflang_pairs(F.col("html")).alias("h"),
        L.sitemap_locs(F.col("html")).alias("s"),
    ).count()
    assert n == N


def test_urlnorm_surt_psl_never_raise_and_hold_invariants(spark):
    """Seeded junk through the round-4 url operators: surt_key always
    yields exactly one ')' separator and is deterministic;
    registrable_domain always returns a dot-suffix of the (lowercased)
    host; meta_robots is total on junk html."""
    from corsearch_project_spark.functions.psl import registrable_domain
    from corsearch_project_spark.functions.urlnorm import canonicalize_url, surt_key

    rng = _rng()
    urls = []
    for i in range(N):
        scheme = rng.choice(["http://", "https://", "HTTPS://", ""])
        host = rng.choice([
            f"h{i}.example.com", "WWW.Ex.CO.UK:443", "localhost",
            _junk(rng, rng.randrange(1, 14)).replace("/", ""),
        ])
        path = rng.choice(["", "/", "/p/" + _junk(rng, rng.randrange(8))])
        q = rng.choice(["", "?a=1&utm_x=2", "?" + _junk(rng, rng.randrange(10))])
        urls.append((scheme + host + path + q,))
    df = spark.createDataFrame(urls, "url string")
    out = df.select(
        "url",
        surt_key(F.col("url")).alias("s"),
        canonicalize_url(F.col("url")).alias("c"),
    ).collect()
    assert len(out) == N  # total: no exceptions
    for r in out:
        assert r["s"].count(")") >= 1  # host/path separator present

    hosts = spark.createDataFrame(
        [(u[0].split("://")[-1].split("/")[0] or "x",) for u in urls],
        "host string",
    )
    doms = hosts.select(
        F.lower(F.col("host")).alias("h"),
        registrable_domain(F.col("host")).alias("d"),
    ).collect()
    for r in doms:
        assert r["h"].endswith(r["d"]), (r["h"], r["d"])

    from corsearch_project_spark.operators.pagemeta import meta_robots

    rng2 = _rng()
    junk_html = spark.createDataFrame(
        [(_junk(rng2, rng2.randrange(200)),) for _ in range(N)],
        "html string",
    )
    verdicts = junk_html.select(meta_robots(F.col("html")).alias("r")).collect()
    assert len(verdicts) == N
