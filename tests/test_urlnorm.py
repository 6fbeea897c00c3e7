"""Edge cases for the pure-JVM URL canonicalizer (functions/urlnorm.py).

The registry-wide parity gate (test_queries.py) already cross-checks
q_url_canonical against DuckDB on the synthesized messy URLs; this file
pins the individual normalization rules on hand-written adversarial
inputs the synthesis doesn't produce (http :80, non-default ports, no
query, all-params-stripped, ref= vs legitimate referrer=).
"""

import pytest

from pyspark.sql import functions as F

from corsearch_project_spark.functions.urlnorm import canonicalize_url

CASES = [
    # fragment stripped, host lowercased, https :443 dropped, utm stripped,
    # params sorted
    (
        "HTTPS://WWW.Ex.COM:443/A/B?zz=1&utm_source=x&a=2#frag",
        "https://www.ex.com/A/B?a=2&zz=1",
    ),
    # http :80 dropped; path case preserved
    ("http://EX.com:80/Path", "http://ex.com/Path"),
    # non-default port preserved
    ("https://ex.com:8443/x?b=1", "https://ex.com:8443/x?b=1"),
    # no query, no fragment -> unchanged modulo host case
    ("https://Ex.Com/p", "https://ex.com/p"),
    # every param stripped -> no trailing '?'
    ("https://ex.com/p?utm_source=a&utm_medium=b&ref=r", "https://ex.com/p"),
    # ref= stripped but referrer= (not the 4-char prefix 'ref=') kept
    ("https://ex.com/p?referrer=keep&ref=drop", "https://ex.com/p?referrer=keep"),
    # empty params dropped ('a=1&&b=2'), order sorted
    ("https://ex.com/p?b=2&&a=1", "https://ex.com/p?a=1&b=2"),
    # :443 on an http url is NOT a default port -> preserved
    ("http://ex.com:443/p", "http://ex.com:443/p"),
    # query param values keep their case
    ("https://ex.com/p?Key=VaLuE", "https://ex.com/p?Key=VaLuE"),
    # '?' inside a query VALUE: qs is everything after the FIRST '?', so
    # 'next=/a?b=1' survives intact (splitting at the last '?' would have
    # dropped it and kept only 'b=1')
    ("https://ex.com/p?next=/a?b=1&zz=0", "https://ex.com/p?next=/a?b=1&zz=0"),
    # same, with a tracking param to prove filtering still applies after
    # the first-'?' split
    ("https://ex.com/p?utm_x=1&next=/a?b=1", "https://ex.com/p?next=/a?b=1"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonicalize_url(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "url string")
    got = df.select(canonicalize_url(F.col("url")).alias("c")).head()["c"]
    assert got == want, f"{raw!r}: got {got!r}, want {want!r}"


def test_canonicalize_is_pure_projection(spark):
    """The canonicalizer must stay a narrow projection: no shuffle, no
    Python stage — Project over scan only."""
    df = spark.range(10).select(
        F.concat(F.lit("https://EX.com:443/p?utm_a=1&k="), F.col("id").cast("string")).alias("url")
    )
    plan = df.select(canonicalize_url(F.col("url")).alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ------------------------------------------------------------- SURT key

from corsearch_project_spark.functions.urlnorm import surt_key  # noqa: E402

SURT_CASES = [
    # scheme dropped, host lowercased+reversed, :443 and www. stripped,
    # tracking param dropped, params sorted, fragment gone
    (
        "HTTPS://WWW.News.Example.com:443/p/1?b=2&utm_s=x&a=1#f",
        "com,example,news)/p/1?a=1&b=2",
    ),
    # empty path defaults to '/'; :80 stripped
    ("http://EX.com:80", "com,ex)/"),
    # www. stripped only as a LEADING label; inner 'www' kept
    ("https://a.www.ex.com/p", "com,ex,www,a)/p"),
    # non-default port survives inside the host key
    ("https://ex.com:8443/x", "com,ex:8443)/x"),
    # single-label host (intranet) reverses to itself
    ("https://localhost/x?a=1", "localhost)/x?a=1"),
    # http vs https collapse onto the same key (scheme is dropped)
    ("http://ex.com/p", "com,ex)/p"),
    ("https://ex.com/p", "com,ex)/p"),
]


@pytest.mark.parametrize("raw,want", SURT_CASES)
def test_surt_key(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "url string")
    got = df.select(surt_key(F.col("url")).alias("s")).head()["s"]
    assert got == want, f"{raw!r}: got {got!r}, want {want!r}"


def test_surt_clusters_domain_contiguously(spark):
    """The point of the transform: every url of a registrable domain —
    any subdomain — sorts into one contiguous key range, with the
    unrelated domain that would interleave in plain-url order (cdn.ex.com
    vs ex.org) pushed outside it."""
    urls = [
        "https://ex.org/a",
        "https://cdn.ex.com/a",
        "https://ex.com/b",
        "https://www.ex.com/a",
        "https://a.b.ex.com/z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    keys = sorted(r["s"] for r in df.select(surt_key("url").alias("s")).collect())
    within = [k for k in keys if k.startswith("com,ex")]
    lo, hi = keys.index(within[0]), keys.index(within[-1])
    assert within == keys[lo : hi + 1]  # contiguous
    assert len(within) == 4


def test_surt_is_pure_projection(spark):
    df = spark.range(10).select(
        F.concat(F.lit("https://WWW.h"), F.col("id").cast("string"),
                 F.lit(".Ex.com:443/p?utm_a=1&k=1")).alias("url")
    )
    plan = df.select(surt_key(F.col("url")).alias("s"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
