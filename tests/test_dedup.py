

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


def test_mirror_hosts_branches(spark):
    """Hand corpus pinning every mirror_hosts branch: a true mirror pair
    (containment 1000 despite the big host's larger corpus), a partial
    mirror below full containment, a sub-threshold pair, and a vendor
    default page shared by too many hosts (capped out BEFORE pairing —
    it must neither create pairs nor count toward host sizes)."""
    from corsearch_project_spark.operators.dedup import mirror_hosts

    rows = (
        # big.com: 6 docs; tiny-mirror.com serves 3 of them and nothing
        # else -> containment = 3/3 = 1000 even though big has 6
        [("big.com", f"d{i}") for i in range(6)]
        + [("tiny-mirror.com", f"d{i}") for i in range(3)]
        # partial.com shares 3 of its 6 docs with big.com
        + [("partial.com", f"d{i}") for i in range(3, 6)]
        + [("partial.com", f"p{i}") for i in range(3)]
        # weak.com shares only 2 with big.com -> below min_shared=3
        + [("weak.com", "d0"), ("weak.com", "d1"), ("weak.com", "w0")]
        # 'apache-default' on 5 hosts > cap 4 -> dropped pre-pairing
        + [(h, "apache-default")
           for h in ("big.com", "tiny-mirror.com", "partial.com",
                     "weak.com", "other.com")]
        # duplicate (host, digest) rows must not inflate counts
        + [("big.com", "d0"), ("tiny-mirror.com", "d0")]
    )
    df = spark.createDataFrame(rows, "host string, digest string")
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_hosts(df, min_shared=3, max_hosts_per_digest=4).collect()
    }
    assert set(got) == {
        ("big.com", "tiny-mirror.com"),
        ("big.com", "partial.com"),
    }
    tiny = got[("big.com", "tiny-mirror.com")]
    assert (tiny["n_shared"], tiny["overlap_permille"]) == (3, 1000)
    part = got[("big.com", "partial.com")]
    # partial has 6 digests (apache-default capped out), shares 3 -> 500
    assert (part["n_shared"], part["overlap_permille"]) == (3, 500)


def test_mirror_hosts_plan_no_cartesian(spark):
    """The digest self-join must stay an equi-join (cap bounds fan-out);
    a cartesian/BNLJ in this plan would be quadratic at corpus scale."""
    from corsearch_project_spark.operators.dedup import mirror_hosts

    df = spark.createDataFrame(
        [("h%d" % (i % 5), "d%d" % (i % 20)) for i in range(100)],
        "host string, digest string",
    )
    plan = mirror_hosts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_change_stats_grades_edit_magnitude(spark):
    """Shift resistance end-to-end: a prepended word must perturb only the
    first chunk (low change_permille on a long doc), a full rewrite must
    score 1000, an identical doc 0; urls on one side only are excluded."""
    from corsearch_project_spark.operators.dedup import cdc_change_stats

    base = " ".join(f"w{i}" for i in range(400))
    old = spark.createDataFrame(
        [("same", base), ("prep", base), ("rewrite", base), ("gone", base)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [
            ("same", base),
            ("prep", "inserted " + base),
            ("rewrite", " ".join(f"x{i}" for i in range(400))),
            ("fresh", base),
        ],
        "url string, text string",
    )
    got = {r["url"]: r for r in cdc_change_stats(old, new).collect()}
    assert set(got) == {"same", "prep", "rewrite"}
    assert got["same"]["change_permille"] == 0
    assert got["rewrite"]["change_permille"] == 1000
    # the prepend perturbs only the first chunk: far below half changed
    assert 0 < got["prep"]["change_permille"] < 300
    assert (
        got["prep"]["common_chunks"]
        >= got["prep"]["n_chunks_old"] - 2
    )
