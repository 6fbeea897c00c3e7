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


# -------------------------------------------- mixture sampling (textstats)

from corsearch_project_spark.operators import textstats as X  # noqa: E402


def test_mixture_keep_deterministic_and_rate_scoped(spark):
    """Same rows kept across reruns and partitionings; rate 0 drops all,
    1000 keeps all, partial rates keep a stable strict subset."""
    rows = [("a", str(i)) for i in range(400)] + [
        ("z", str(i)) for i in range(400)
    ] + [("half", str(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "src string, key string")
    keep = X.mixture_keep(
        F.col("src"), F.col("key"),
        {"a": 1000, "z": 0, "half": 500},
    )
    got = df.where(keep)
    kept = {(r["src"], r["key"]) for r in got.collect()}
    assert {s for s, _ in kept} == {"a", "half"}
    assert len([1 for s, _ in kept if s == "a"]) == 400  # keep-all
    n_half = len([1 for s, _ in kept if s == "half"])
    assert 0 < n_half < 400  # partial, both branches populated
    # determinism across a different partitioning
    again = {(r["src"], r["key"])
             for r in df.repartition(13).where(keep).collect()}
    assert again == kept


def test_mixture_keep_decorrelated_from_hash_split(spark):
    """The salt must keep 'sampled at 50%' independent of 'test split':
    within the kept half, the split distribution stays ~80/10/10, not
    skewed — equality of the two hashes would make it degenerate."""
    df = spark.createDataFrame(
        [(str(i),) for i in range(2000)], "key string"
    )
    keep = X.mixture_keep(F.lit("s"), F.col("key"), {"s": 500})
    kept = df.where(keep).select(
        X.hash_split(F.col("key")).alias("split")
    )
    counts = {r["split"]: r["n"]
              for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert 0.70 < counts["train"] / total < 0.90
    assert counts.get("valid", 0) > 0 and counts.get("test", 0) > 0


def test_mixture_keep_is_pure_projection(spark):
    df = spark.createDataFrame([("s", "k")], "src string, key string")
    plan = (
        df.where(X.mixture_keep(F.col("src"), F.col("key"), {"s": 500}))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


# ------------------------------------------ sentence chunking (textstats)


def test_chunk_sentences_boundaries_and_straddle(spark):
    """Chunks break ONLY at sentence boundaries; a sentence straddling
    the budget overflows its chunk; an oversized single sentence becomes
    its own chunk uncut."""
    doc1 = "one two three. four five. six seven eight nine. ten."
    doc2 = "a " * 19 + "b."  # one 20-token sentence, budget 5
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    got = {
        (r["doc"], r["chunk_id"]): (r["chunk_text"], r["n_tok"])
        for r in X.chunk_sentences(df, max_tokens=5).collect()
    }
    # doc1 tokens per sentence: 3, 2, 4, 1 -> before: 0,3,5,9
    # chunk 0: before<5 -> sents 1+2; chunk 1: before 5,9 -> sents 3+4
    assert got[(1, 0)] == ("one two three. four five.", 5)
    assert got[(1, 1)] == ("six seven eight nine. ten.", 5)
    assert got[(2, 0)][1] == 20  # oversized sentence kept whole
    assert "a a" in got[(2, 0)][0] and got[(2, 0)][0].endswith("b.")


def test_chunk_sentences_reassembly_order_and_plan(spark):
    """Sentence order survives the groupBy (array_sort on pos, not
    collect_list order), across partitionings; zero Python stages."""
    text = " ".join(f"s{i}." for i in range(40))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = X.chunk_sentences(df.repartition(7), max_tokens=8)
    rows = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in out.collect()
    )
    joined = " ".join(t for _, t in rows)
    assert joined == text  # exact reconstruction in order
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


# ------------------------------------------------ per-domain cap sampling


def test_domain_cap_deterministic_and_capped(spark):
    rows = [(f"u{i}", "big.com") for i in range(50)] + [
        ("v1", "small.org"), ("v2", "small.org")
    ]
    df = spark.createDataFrame(rows, "url string, domain string")
    kept = X.domain_cap(df, cap=10)
    got = {(r["domain"], r["url"]) for r in kept.collect()}
    assert len([1 for d, _ in got if d == "big.com"]) == 10
    assert len([1 for d, _ in got if d == "small.org"]) == 2  # under cap
    # survivors are a pure function of the keys, not input partitioning
    again = {(r["domain"], r["url"])
             for r in X.domain_cap(df.repartition(9), cap=10).collect()}
    assert again == got
    # schema passthrough (no helper columns leak)
    assert kept.columns == ["url", "domain"]


# ------------------------------------------- corpus-relative token rarity


def test_common_token_fraction_scores_gibberish_low(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on a mat"),
            (3, "the cat and the dog sat"),
            (4, "qzxv jkwpt brrgl zzyqt"),  # gibberish: df-1 tokens only
        ],
        "doc_id long, text string",
    )
    got = {r["doc"]: r.asDict()
           for r in X.common_token_fraction(docs, min_df=2).collect()}
    assert got[4]["n_common_tok"] == 0 and got[4]["common_permille"] == 0
    # doc 1 distinct tokens: the,cat,sat,on,mat -> all df>=2 -> 1000
    assert got[1] == {"doc": 1, "n_tok": 5, "n_common_tok": 5,
                      "common_permille": 1000}
    # doc 2: the,dog,sat,on,a,mat -> 'a' is df-1 -> 5/6 -> 833
    assert got[2]["common_permille"] == 833
