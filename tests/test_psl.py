"""Registrable-domain extraction (functions/psl.py): the PSL decision on
hand-written oddities — multi-label public suffixes, private registries,
suffix-is-the-host, unknown tails — plus the pure-projection plan gate.
The registry parity gate cross-checks q_domain_quality's rollup against a
DuckDB oracle that mirrors the decision generically."""

import pytest

from pyspark.sql import functions as F

from corsearch_project_spark.functions.psl import registrable_domain

CASES = [
    # plain gTLD: suffix+1
    ("example.com", "example.com"),
    ("sub.example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    # multi-label ccTLD suffix beats the 1-label match on 'uk'
    ("foo.co.uk", "foo.co.uk"),
    ("www.news.bbc.co.uk", "bbc.co.uk"),
    # private registry: each label under github.io is a publisher
    ("alice.github.io", "alice.github.io"),
    ("www.alice.github.io", "alice.github.io"),
    # the host IS a public suffix -> itself, not NULL
    ("co.uk", "co.uk"),
    ("github.io", "github.io"),
    # unknown tail / bare label -> own domain
    ("x.intranet", "x.intranet"),
    ("localhost", "localhost"),
    # case folding
    ("WWW.Example.COM", "example.com"),
]


@pytest.mark.parametrize("host,want", CASES)
def test_registrable_domain(spark, host, want):
    df = spark.createDataFrame([(host,)], "host string")
    got = df.select(registrable_domain(F.col("host")).alias("d")).head()["d"]
    assert got == want, f"{host!r}: got {got!r}, want {want!r}"


def test_registrable_domain_is_pure_projection(spark):
    """Literal suffix arrays compile into the plan: no join, no Exchange,
    no Python stage — the rollup key costs a narrow projection."""
    df = spark.range(10).select(
        F.concat(F.lit("s"), F.col("id").cast("string"), F.lit(".ex.co.uk")).alias("h")
    )
    plan = (
        df.select(registrable_domain(F.col("h")).alias("d"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "Join" not in plan
