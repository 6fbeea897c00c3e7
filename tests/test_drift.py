"""Token-drift chi-square + histogram sketch — operators/drift.py,
operators/sketches.py hist_build/hist_merge.

Property oracles: the chi-square contribution matches an independent
pure-Python integer reference exactly; single-snapshot tokens keep their
full contribution; the right-shift coarsening equals shifting in the
reference; histogram merge over halves equals the build over the whole.
"""

from pyspark.sql import functions as F

from corsearch_project_spark.operators import drift as DR
from corsearch_project_spark.operators import sketches as SK


def _ref_chi2(a: int, b: int, tot_a: int, tot_b: int, scale=1_000_000) -> int:
    d = a * tot_b - b * tot_a
    return (scale * d * d) // ((a + b) * tot_a * tot_b)


def _counts(spark, pairs):
    return spark.createDataFrame(pairs, "tok string, n long")


def test_chi2_matches_pure_python_reference(spark):
    ca = [("common", 50), ("a_only", 10), ("shifted", 40)]
    cb = [("common", 48), ("b_only", 7), ("shifted", 5)]
    tot_a, tot_b = sum(n for _, n in ca), sum(n for _, n in cb)
    got = {
        r["tok"]: (r["n_a"], r["n_b"], r["chi2_scaled"])
        for r in DR.token_drift(_counts(spark, ca), _counts(spark, cb)).collect()
    }
    da, db = dict(ca), dict(cb)
    assert set(got) == set(da) | set(db)
    for tok in got:
        a, b = da.get(tok, 0), db.get(tok, 0)
        assert got[tok] == (a, b, _ref_chi2(a, b, tot_a, tot_b)), tok


def test_single_snapshot_token_keeps_full_contribution(spark):
    ca = [("only_a", 9), ("pad", 91)]
    cb = [("pad", 100)]
    rows = {
        r["tok"]: r
        for r in DR.token_drift(_counts(spark, ca), _counts(spark, cb)).collect()
    }
    r = rows["only_a"]
    assert (r["n_a"], r["n_b"]) == (9, 0)
    assert r["chi2_scaled"] == _ref_chi2(9, 0, 100, 100)
    assert r["chi2_scaled"] > 0


def test_shift_coarsens_counts_before_totals(spark):
    ca = [("x", 17), ("y", 40)]
    cb = [("x", 5), ("y", 64)]
    got = {
        r["tok"]: r["chi2_scaled"]
        for r in DR.token_drift(
            _counts(spark, ca), _counts(spark, cb), shift=3
        ).collect()
    }
    # shifted: a = {x:2, y:5} tot 7; b = {y:8} tot 8 (x's 5>>3 == 0 drops)
    assert got["x"] == _ref_chi2(2, 0, 7, 8)
    assert got["y"] == _ref_chi2(5, 8, 7, 8)


def test_token_counts_splits_like_the_engine_contract(spark):
    docs = spark.createDataFrame(
        [(1, "  a b  b "), (2, "b c")], "doc_id long, text string"
    )
    got = {r["tok"]: r["n"] for r in DR.token_counts(docs).collect()}
    assert got == {"a": 1, "b": 3, "c": 1}


def test_hist_build_bins_and_overflow(spark):
    df = spark.createDataFrame(
        [(0,), (511,), (512,), (1023,), (4096,), (99999,)], "v long"
    )
    got = {r["bin"]: r["n"] for r in SK.hist_build(df, "v", 512, 8).collect()}
    assert got == {0: 2, 1: 2, 7: 2}  # 4096//512=8 and beyond clamp to 7


def test_hist_merge_equals_whole_build(spark):
    whole = spark.range(0, 1000).selectExpr(
        "CAST(id % 7 AS STRING) AS k", "id * 13 % 4100 AS v"
    )
    build = SK.hist_build(whole, "v", 512, 8, keys=("k",))
    halves = [
        SK.hist_build(whole.where("id % 2 = 0"), "v", 512, 8, keys=("k",)),
        SK.hist_build(whole.where("id % 2 = 1"), "v", 512, 8, keys=("k",)),
    ]
    merged = SK.hist_merge(halves, keys=("k",))
    a = sorted(map(tuple, build.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_drift_plan_no_python_stage(spark):
    ca = _counts(spark, [("x", 3), ("y", 4)])
    cb = _counts(spark, [("y", 2), ("z", 9)])
    plan = DR.token_drift(ca, cb)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
