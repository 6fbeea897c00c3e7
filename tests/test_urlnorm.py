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
