"""Integer Lloyd k-means — operators/clustering.py.

Oracle: an independent pure-Python Lloyd implementation with the same
determinism contract (quantized integers, total-ordered argmin, FLOOR
division centroid means — Python's // floors, which is the portable
semantics the engine's remainder identity reproduces). Negative
coordinates are included on purpose: they are exactly the inputs where
truncating division (Spark ``div``) and floor division (DuckDB ``//``)
disagree, so a wrong centroid formula fails here.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from corsearch_project_spark.operators import clustering as C


def _vectors(n=60, d=4):
    # whole-valued floats in [-5, 5]: qe = v*1000 is exact, sums go negative
    return {
        i: [float(((i * 7 + j * 13 + (i * j) % 11) % 11) - 5) for j in range(d)]
        for i in range(n)
    }


def ref_kmeans(vecs, stride, rounds):
    q = {i: [int(round(x * 1000)) for x in v] for i, v in vecs.items()}
    cents = {i: list(q[i]) for i in q if i % stride == 0}
    assign = {}
    for r in range(rounds):
        assign = {}
        for i, v in q.items():
            dist, cid = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), cid)
                for cid, c in cents.items()
            )
            assign[i] = (cid, dist)
        if r < rounds - 1:
            groups = defaultdict(list)
            for i, (cell, _) in assign.items():
                groups[cell].append(q[i])
            cents = {
                cell: [sum(col) // len(ms) for col in zip(*ms)]
                for cell, ms in groups.items()
            }
    return cents, assign


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )


def test_kmeans_matches_pure_python_lloyd(spark):
    vecs = _vectors()
    for rounds in (1, 2, 3):
        cents, assigned = C.kmeans(_df(spark, vecs), stride=12, rounds=rounds)
        ref_cents, ref_assign = ref_kmeans(vecs, stride=12, rounds=rounds)
        got_assign = {
            r["vec_id"]: (r["cell"], r["dist"]) for r in assigned.collect()
        }
        assert got_assign == ref_assign, f"rounds={rounds}"
        got_cents = {r["cent_id"]: list(r["cqe"]) for r in cents.collect()}
        assert got_cents == {k: list(v) for k, v in ref_cents.items()}


def test_kmeans_inertia_non_increasing(spark):
    df = _df(spark, _vectors(n=80))
    inertias = []
    for rounds in (1, 2, 3):
        _, assigned = C.kmeans(df, stride=16, rounds=rounds)
        inertias.append(
            assigned.agg(F.sum("dist")).collect()[0][0]
        )
    assert inertias[0] >= inertias[1] >= inertias[2], inertias


def test_kmeans_floor_div_on_negative_sums(spark):
    df2 = spark.createDataFrame(
        [(0, [-3.0]), (2, [-4.0])], "vec_id long, embedding array<float>"
    )
    cents2, _ = C.kmeans(df2, stride=10, rounds=2)  # only vec 0 seeds
    got = {r["cent_id"]: list(r["cqe"]) for r in cents2.collect()}
    assert got == {0: [(-3000 + -4000) // 2]}  # floor(-3500.0) == -3500
    df3 = spark.createDataFrame(
        [(0, [-3.0]), (2, [-4.0]), (4, [-5.0])],
        "vec_id long, embedding array<float>",
    )
    cents3, _ = C.kmeans(df3, stride=10, rounds=2)
    got3 = {r["cent_id"]: list(r["cqe"]) for r in cents3.collect()}
    assert got3 == {0: [(-12000) // 3]}
    # the discriminating case: sum not divisible, negative
    df4 = spark.createDataFrame(
        [(0, [-3.0]), (2, [-4.0]), (4, [-4.0])],
        "vec_id long, embedding array<float>",
    )
    cents4, _ = C.kmeans(df4, stride=10, rounds=2)
    got4 = {r["cent_id"]: list(r["cqe"]) for r in cents4.collect()}
    assert got4 == {0: [(-11000) // 3]}  # -3667, truncation would give -3666


def test_kmeans_assignment_plan_no_python_broadcast_only(spark):
    df = _df(spark, _vectors())
    _, assigned = C.kmeans(df, stride=12, rounds=2)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_semdedup_drops_exact_twins_keeps_cell_minimum(spark):
    vecs = _vectors(n=60)
    # ids 100..109 are exact copies of 0..9: same distances everywhere, so
    # each twin lands in its original's cell and MUST drop (cos == 1.0)
    twins = {100 + i: vecs[i] for i in range(10)}
    allv = {**vecs, **twins}
    df = _df(spark, allv)
    census = C.semdedup(df, stride=12, rounds=3, threshold=0.999999)
    rows = census.collect()
    assert sum(r["n"] for r in rows) == 70
    assert sum(r["n_dropped"] for r in rows) >= 10
    assert all(r["n_dropped"] <= r["n"] - 1 for r in rows)

    # reconstruct the dropped set at a looser threshold via the reference
    _cents, ref_assign = ref_kmeans(allv, stride=12, rounds=3)
    cells = defaultdict(list)
    for i, (cell, _) in ref_assign.items():
        cells[cell].append(i)
    # the smallest id of every cell can never be dropped, so per-cell
    # drops are bounded by the reference cell sizes minus one
    by_cell = {r["cell"]: r for r in rows}
    for cell, members in cells.items():
        assert by_cell[cell]["n"] == len(members)
        assert by_cell[cell]["n_dropped"] <= len(members) - 1


def test_sliding_passages_coverage_and_plan(spark):
    """Every token lands in >= 1 window, stride-aligned windows
    reconstruct the document exactly, the last window clamps, and the
    whole op compiles to a shuffle-free pure-JVM plan."""
    from corsearch_project_spark.operators import textstats as X

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),
         (2, "a b c"),            # shorter than one chunk
         (3, " ".join(f"t{i}" for i in range(9)))],  # exact multiple
        "doc_id long, text string",
    )
    out = X.sliding_passages(docs, chunk=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc"], []).append(r)
    # doc 2: single clamped window
    assert len(by_doc[2]) == 1 and by_doc[2][0]["passage"] == "a b c"
    # doc 1 (10 tokens): last_k = ceil((10-4)/3) = 2 -> 3 windows
    w1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["start_tok"] for r in w1] == [0, 3, 6]
    assert w1[-1]["n_tokens"] == 4  # clamps at 10: tokens 6..9
    # reconstruction: tokens at stride boundaries cover everything in order
    toks = []
    for r in w1:
        toks.extend(r["passage"].split()[: 3 if r != w1[-1] else 4])
    assert toks == [f"w{i}" for i in range(10)]
    # doc 3 (9 tokens): (9-4+2)//3 = 2 -> windows at 0,3,6 (wait: last
    # covers 6..8, 3 tokens)
    w3 = sorted(by_doc[3], key=lambda r: r["chunk_id"])
    assert [r["start_tok"] for r in w3] == [0, 3, 6]
    assert w3[-1]["n_tokens"] == 3

    plan = (
        X.sliding_passages(docs, chunk=4, stride=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan

    import pytest

    with pytest.raises(ValueError):
        X.sliding_passages(docs, chunk=4, stride=5)
