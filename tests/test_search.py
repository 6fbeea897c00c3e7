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


# ------------------------------------------------------------- BM25


def _bm25_ref(docs, terms, scale=1_000_000):
    """Independent pure-Python reference of the exact-integer BM25
    (same rational constants, recomputed from scratch — not the Spark
    expression transcribed)."""
    toks = {d: [w for w in t.split() if w] for d, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl_milli = (1000 * total) // n
    df = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    scores = {}
    for d, v in toks.items():
        s = 0
        for q in terms:
            tf = v.count(q)
            if not tf:
                continue
            sat = (scale * 22 * tf * avgdl_milli) // (
                10 * avgdl_milli * tf + 3 * avgdl_milli + 9000 * len(v)
            )
            s += (n - df[q]) * sat
        if s:
            scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bm25_matches_reference_and_is_disjunctive(spark, corpus):
    rows = S.search_bm25(corpus, ["alpha", "beta"], k=10).collect()
    got = [(r["doc_id"], r["score"]) for r in rows]
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    assert got == _bm25_ref(docs, ["alpha", "beta"])
    # OR semantics: doc3 has beta but no alpha and still scores
    assert 3 in {d for d, _ in got}


def test_bm25_length_norm_and_saturation(spark, corpus):
    """The two signals rarity weighting lacks, observable in the tiny
    corpus: (a) length norm — doc2 'alpha beta' (dl=2) outranks doc1
    'alpha beta alpha gamma' (dl=4) even though doc1 holds alpha TWICE;
    (b) saturation — doc1's tf=2 alpha term is worth less than two tf=1
    alpha terms at equal length."""
    rows = S.search_bm25(corpus, ["alpha", "beta"], k=10).collect()
    score = {r["doc_id"]: r["score"] for r in rows}
    assert score[2] > score[1] > score[3]          # length norm
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    ref = dict(_bm25_ref(docs, ["alpha"]))
    sat2, sat1 = ref[1], ref[2]  # doc1 tf=2 dl=4; doc2 tf=1 dl=2
    # compare at EQUAL dl via the raw formula instead: tf=2 vs 2*(tf=1)
    n, avg = 4, (1000 * 10) // 4
    one = (1_000_000 * 22 * 1 * avg) // (10 * avg * 1 + 3 * avg + 9000 * 4)
    two = (1_000_000 * 22 * 2 * avg) // (10 * avg * 2 + 3 * avg + 9000 * 4)
    assert two < 2 * one                           # saturation
    assert sat2 and sat1                           # both ranked at all


def test_bm25_plan_no_python_no_cartesian(spark, corpus):
    out = S.search_bm25(corpus, ["alpha", "beta"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Cartesian" not in plan  # scalar sides are broadcast
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------- phrase search


@pytest.fixture(scope="module")
def phrase_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b c a b c a b"),        # [a,b,c] at 1 and 4; [a,b] x3
            (2, "a  b c"),                 # empty token occupies no pos
            (3, "a c b"),                  # partial orders never match
            (4, "buffalo buffalo buffalo"),
            (5, "c b a"),                  # reversed never matches
        ],
        "doc_id long, text string",
    )


def test_phrase_hits_and_first_pos(spark, phrase_corpus):
    rows = S.search_phrase(phrase_corpus, ["a", "b", "c"], k=10).collect()
    got = [(r["doc_id"], r["n_hits"], r["first_pos"]) for r in rows]
    assert got == [(1, 2, 1), (2, 1, 1)]


def test_phrase_two_term_and_boundary(spark, phrase_corpus):
    rows = S.search_phrase(phrase_corpus, ["a", "b"], k=10).collect()
    got = [(r["doc_id"], r["n_hits"], r["first_pos"]) for r in rows]
    # doc1: anchors 1,4,7 (the pos-1 boundary anchor is legal);
    # doc2's double space does not shift positions
    assert got == [(1, 3, 1), (2, 1, 1)]


def test_phrase_repeated_term_overlap(spark, phrase_corpus):
    """'buffalo buffalo' in 'buffalo buffalo buffalo': a term matching
    several slots fans out per slot, and the two OVERLAPPING occurrences
    (anchors 1 and 2) both count."""
    rows = S.search_phrase(
        phrase_corpus, ["buffalo", "buffalo"], k=10
    ).collect()
    got = [(r["doc_id"], r["n_hits"], r["first_pos"]) for r in rows]
    assert got == [(4, 2, 1)]


def test_phrase_plan_no_python(spark, phrase_corpus):
    out = S.search_phrase(phrase_corpus, ["a", "b", "c"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Cartesian" not in plan
    assert "TakeOrderedAndProject" in plan


def test_positional_postings_dense_positions(spark, phrase_corpus):
    got = sorted(
        (r["doc_id"], r["pos"], r["term"])
        for r in S.build_positional_postings(
            phrase_corpus.where(F.col("doc_id") == 2)
        ).collect()
    )
    assert got == [(2, 1, "a"), (2, 2, "b"), (2, 3, "c")]


# -------------------------------------------------- proximity search


@pytest.fixture(scope="module")
def prox_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a x x x b a b"),     # pairs: (5,6)=1 via a@6,b@5? see test
            (2, "a x b"),             # single pair at dist 2
            (3, "b a"),               # order-agnostic: dist 1
            (4, "a a a"),             # no b: never returned
            (5, "x a b x a x x b"),   # dists 1 and 3
        ],
        "doc_id long, text string",
    )


def test_proximity_min_dist_and_order_agnostic(spark, prox_corpus):
    rows = S.search_proximity(prox_corpus, "a", "b", k=10).collect()
    got = [(r["doc_id"], r["min_dist"], r["n_pairs"]) for r in rows]
    # doc1 positions a:[1,6] b:[5,7] -> adjacent diff pairs (1,5)=4,(5,6)=1,
    # (6,7)=1 -> min 1, n_pairs 3; doc3 'b a' -> min 1 (order-agnostic);
    # doc5 a:[2,5] b:[3,8] -> (2,3)=1,(3,5)=2,(5,8)=3 -> min 1, n 3;
    # doc2 -> min 2; doc4 dropped (no b). Order: min_dist ASC, n_pairs
    # DESC (density tiebreak), doc_id ASC.
    assert got == [
        (1, 1, 3), (5, 1, 3), (3, 1, 1), (2, 2, 1),
    ]


def test_proximity_matches_bruteforce_min(spark, prox_corpus):
    """The adjacent-in-merged-order trick equals the true min over ALL
    cross pairs (two-pointer fact), checked by brute force."""
    rows = S.search_proximity(prox_corpus, "a", "b", k=10).collect()
    got = {r["doc_id"]: r["min_dist"] for r in rows}
    for d, text in [(r["doc_id"], r["text"])
                    for r in prox_corpus.collect()]:
        toks = [w for w in text.split() if w]
        pa = [i + 1 for i, w in enumerate(toks) if w == "a"]
        pb = [i + 1 for i, w in enumerate(toks) if w == "b"]
        if pa and pb:
            assert got[d] == min(abs(x - y) for x in pa for y in pb)
        else:
            assert d not in got


def test_proximity_max_dist_gate(spark, prox_corpus):
    rows = S.search_proximity(prox_corpus, "a", "b", k=10, max_dist=1)
    got = [(r["doc_id"], r["min_dist"], r["n_pairs"]) for r in rows.collect()]
    # only distance<=1 adjacencies count toward n_pairs AND qualification
    assert got == [(1, 1, 2), (3, 1, 1), (5, 1, 1)]


def test_proximity_plan_no_python_single_window(spark, prox_corpus):
    out = S.search_proximity(prox_corpus, "a", "b", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "CartesianProduct" not in plan and "Join" not in plan  # no self-join
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------- more-like-this


def _mlt_ref(docs, qid, max_df=None):
    toks = {d: [w for w in t.split() if w] for d, t in docs}
    n = len(docs)
    q = toks[qid]
    df = {t: sum(1 for v in toks.values() if t in v) for t in set(q)}
    out = {}
    for d, v in toks.items():
        if d == qid:
            continue
        s, shared = 0, 0
        for term in set(q):
            if max_df is not None and df[term] > max_df:
                continue
            tf = v.count(term)
            if tf:
                s += q.count(term) * tf * (n - df[term]) ** 2
                shared += 1
        if shared:
            out[d] = (s, shared)
    return sorted(
        ((d, s, sh) for d, (s, sh) in out.items()),
        key=lambda r: (-r[1], r[0]),
    )


def test_more_like_this_matches_reference(spark, corpus):
    rows = S.more_like_this(corpus, 1, k=10).collect()
    got = [(r["doc_id"], r["score"], r["n_shared"]) for r in rows]
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    assert got == _mlt_ref(docs, 1)
    # doc4 shares nothing with doc1 -> absent; doc2 shares alpha+beta
    assert {d for d, _, _ in got} == {2, 3}


def test_more_like_this_max_df_cap(spark, corpus):
    # beta has df 3: a cap of 2 removes it, leaving alpha+gamma signal
    rows = S.more_like_this(corpus, 1, k=10, max_df=2).collect()
    got = [(r["doc_id"], r["score"], r["n_shared"]) for r in rows]
    docs = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    assert got == _mlt_ref(docs, 1, max_df=2)
    assert all(r[2] >= 1 for r in got)


def test_more_like_this_plan_broadcast_only(spark, corpus):
    out = S.more_like_this(corpus, 1, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "SortMergeJoin" not in plan          # all joins broadcast
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
