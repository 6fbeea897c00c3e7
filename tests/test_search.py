"""Inverted-index search — operators/search.py."""

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import search as S


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta alpha gamma"),
            (2, "alpha beta"),
            (3, "beta  beta gamma"),  # double space: empty token dropped
            (4, "delta"),
        ],
        "doc_id long, text string",
    )


def test_postings_tf_and_empty_tokens(spark, corpus):
    got = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in S.build_postings(corpus).collect()
    }
    assert got[("alpha", 1)] == 2
    assert got[("beta", 3)] == 2
    assert ("", 3) not in got  # whitespace runs never emit empty terms
    assert len(got) == 8


def test_term_doc_freq(spark, corpus):
    df = {r["term"]: r["df"]
          for r in S.term_doc_freq(S.build_postings(corpus)).collect()}
    assert df == {"alpha": 2, "beta": 3, "gamma": 2, "delta": 1}


def test_conjunctive_and_semantics(spark, corpus):
    """Only docs containing ALL terms qualify; rarity-weighted score:
    n_docs=4, df(alpha)=2, df(beta)=3 -> weight 2 and 1."""
    rows = S.search_conjunctive(corpus, ["alpha", "beta"], k=10).collect()
    got = [(r["doc_id"], r["score"]) for r in rows]
    # doc1: alpha tf2*2 + beta tf1*1 = 5; doc2: 2*1 + 1*1 = 3
    assert got == [(1, 5), (2, 3)]


def test_topk_tiebreak_and_plan(spark, corpus):
    out = S.search_conjunctive(corpus, ["beta"], k=2)
    rows = [(r["doc_id"], r["score"]) for r in out.collect()]
    # df(beta)=3, weight 1: doc3 tf2 -> 2; docs 1,2 tf1 -> 1, doc_id break
    assert rows == [(3, 2), (1, 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Cartesian" not in plan


def test_update_postings_equals_rebuild(spark, corpus):
    """Incremental maintenance == full rebuild on the merged corpus:
    doc 2 changes content, doc 5 is new, docs 1/3/4 untouched."""
    changed = spark.createDataFrame(
        [(2, "epsilon epsilon alpha"), (5, "zeta")],
        "doc_id long, text string",
    )
    merged = spark.createDataFrame(
        [
            (1, "alpha beta alpha gamma"),
            (2, "epsilon epsilon alpha"),   # replaced
            (3, "beta  beta gamma"),
            (4, "delta"),
            (5, "zeta"),                    # new
        ],
        "doc_id long, text string",
    )
    inc = S.update_postings(S.build_postings(corpus), changed)
    full = S.build_postings(merged)
    assert sorted(map(tuple, inc.collect())) == \
        sorted(map(tuple, full.collect()))
    # stale postings must be GONE, not shadowed
    assert inc.where((F.col("doc_id") == 2)
                     & (F.col("term") == "beta")).count() == 0


def test_search_snippets_window(spark, corpus):
    """Snippet centers on the first query-term hit; broadcast of the
    k-row side; no Python stage."""
    out = S.search_snippets(corpus, ["beta"], k=2, width=10)
    rows = {r["doc_id"]: r["snippet"] for r in out.collect()}
    # doc3 'beta  beta gamma': hit at pos 1, window starts at 1
    assert rows[3] == "beta  beta"
    # doc1 'alpha beta alpha gamma': hit at 7, start=max(1,7-20)=1
    assert rows[1] == "alpha beta"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_postings_persist_and_bucket_prune(spark, corpus, tmp_path):
    """Persisted term-bucketed index: lookup equals the in-memory filter,
    the plan prunes on the term_bucket partition column, and the scan
    touches a strict subset of the bucket directories."""
    import os

    path = str(tmp_path / "postings")
    S.write_postings(S.build_postings(corpus), path, n_buckets=16)
    got = S.lookup_postings(spark, path, ["beta"], n_buckets=16)
    want = {(r["term"], r["doc_id"], r["tf"])
            for r in S.build_postings(corpus)
            .where(F.col("term") == "beta").collect()}
    assert {(r["term"], r["doc_id"], r["tf"]) for r in got.collect()} == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan  # partition-prune predicate present
    # physical layout: beta's single bucket directory alone holds exactly
    # the looked-up rows, and it is a strict subset of the bucket dirs
    b = spark.createDataFrame([("beta",)], "term string").select(
        F.pmod(F.xxhash64("term"), F.lit(16)).cast("int").alias("b")
    ).head()["b"]
    only = spark.read.parquet(os.path.join(path, f"term_bucket={b}"))
    assert {(r["term"], r["doc_id"], r["tf"])
            for r in only.where(F.col("term") == "beta").collect()} == want
    n_dirs = len([d for d in os.listdir(path) if d.startswith("term_bucket=")])
    assert n_dirs > 1  # pruning to one dir is a strict subset


def test_build_index_job_full_and_incremental(spark, tmp_path):
    """jobs/build_index.py build_index(): full build persists the
    term-bucketed index; --increment drops stale postings for
    re-extracted urls (not shadowed) and the probe lookup equals a full
    scan."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "jobs"))
    import build_index as J

    ext = str(tmp_path / "extracted")
    spark.createDataFrame(
        [("u1", "alpha beta beta"), ("u2", "beta gamma"),
         ("u3", "alpha delta")],
        "url string, extracted_text string",
    ).write.parquet(ext)
    idx = str(tmp_path / "index")
    rep = J.build_index(spark, ext, idx, buckets=8, probe="beta,missing")
    assert rep["docs"] == 3 and rep["terms"] == 4
    assert rep["probe"] == {"beta": 2}  # u1+u2; 'missing' absent

    # increment: u2 re-extracted without 'beta' -> its stale posting gone
    inc = str(tmp_path / "inc")
    spark.createDataFrame(
        [("u2", "gamma gamma epsilon")],
        "url string, extracted_text string",
    ).write.parquet(inc)
    idx2 = str(tmp_path / "index2")
    rep2 = J.build_index(spark, ext, idx2, buckets=8, increment=inc,
                         probe="beta,epsilon")
    assert rep2["probe"] == {"beta": 1, "epsilon": 1}  # only u1 keeps beta

    from corsearch_project_spark.operators.search import lookup_postings

    got = lookup_postings(spark, idx2, ["gamma"], n_buckets=8).collect()
    assert {(r["doc_id"], r["tf"]) for r in got} == {("u2", 2)}
