

def test_substring_dup_interval_union(spark):
    """Hand corpus pinning the interval-union semantics: overlapping
    matched windows merge; disjoint runs add; within-doc-only repeats do
    NOT count; docs under the window length report 0."""
    from corsearch_project_spark.operators.dedup import substring_dup_stats

    shared = "a b c d e f g h i j"          # 10 tokens: 3 shingles, all shared
    rows = [
        (0, shared + " unique tail zero"),   # shared run at pos 0..2
        (1, "one own prefix " + shared),     # same run at pos 3..5
        (2, "w x y z " + "r s " * 4),        # within-doc repeats only
        (3, "short doc"),                    # < 8 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in substring_dup_stats(df).collect()}
    # doc 0: matched positions {0,1,2} -> union [0, 10) = 10 tokens
    assert (got[0]["n_tokens"], got[0]["dup_tokens"]) == (13, 10)
    # doc 1: matched positions {3,4,5} -> union [3, 13) = 10 tokens
    assert (got[1]["n_tokens"], got[1]["dup_tokens"]) == (13, 10)
    assert got[2]["dup_tokens"] == 0
    assert got[3]["dup_tokens"] == 0 and got[3]["dup_fraction"] == 0.0
    assert abs(got[0]["dup_fraction"] - round(10 / 13, 6)) < 1e-12
