"""Count-Min / Bloom sketches — operators/sketches.py.

Property oracles: CMS never underestimates and is exactly mergeable
(cell-wise sum over a union == build over the concatenation); Bloom has
zero false negatives and bit_or-merges exactly. Plan gates hold the build
to one partial-agg shuffle with no Python stage, and the probe to a
broadcast join.
"""

from pyspark.sql import functions as F

from corsearch_project_spark.operators import sketches as SK


def _items(spark, lo, hi, rep=3):
    # value i appears (i % rep) + 1 times — known exact multiset
    return spark.range(lo, hi).selectExpr(
        f"explode(array_repeat(concat('it-', id), CAST(id % {rep} AS INT) + 1))"
        " AS item"
    )


def test_cms_never_underestimates(spark):
    items = _items(spark, 0, 200)
    sk = SK.cms_build(items, depth=4, width=32)
    true = items.groupBy("item").agg(F.count(F.lit(1)).alias("true_n"))
    j = SK.cms_estimate(true.select("item"), sk, depth=4, width=32).join(
        true, "item"
    )
    rows = j.collect()
    assert rows
    assert all(r["est"] >= r["true_n"] for r in rows)
    # width 32 over 200 distinct items MUST collide somewhere
    assert any(r["est"] > r["true_n"] for r in rows)


def test_cms_unseen_item_estimates_from_cells_only(spark):
    items = _items(spark, 0, 50)
    sk = SK.cms_build(items, depth=4, width=64)
    probe = spark.createDataFrame([("never-seen-token-xyzzy",)], "item string")
    est = SK.cms_estimate(probe, sk, depth=4, width=64).collect()[0]["est"]
    # not necessarily 0 (cells are shared), but bounded by the heaviest cell
    mx = sk.agg(F.max("n")).collect()[0][0]
    assert 0 <= est <= mx


def test_cms_merge_is_cellwise_sum(spark):
    a, b = _items(spark, 0, 80), _items(spark, 80, 160)
    both = a.unionAll(b)
    merged = (
        SK.cms_build(a, depth=4, width=32)
        .unionAll(SK.cms_build(b, depth=4, width=32))
        .groupBy("row", "col")
        .agg(F.sum("n").alias("n"))
    )
    full = SK.cms_build(both, depth=4, width=32)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_cms_weighted_build(spark):
    w = spark.createDataFrame(
        [("x", 5), ("y", 7), ("x", 1)], "item string, wt int"
    )
    sk = SK.cms_build(w, weight_col="wt", depth=4, width=64)
    est = {
        r["item"]: r["est"]
        for r in SK.cms_estimate(
            w.select("item").distinct(), sk, depth=4, width=64
        ).collect()
    }
    assert est["x"] >= 6 and est["y"] >= 7


def test_bloom_no_false_negatives_and_merge(spark):
    members = _items(spark, 0, 120).distinct()
    others = _items(spark, 120, 240).distinct()
    bl = SK.bloom_build(members, n_bits=256, n_hashes=3)
    claimed = SK.bloom_probe(members, bl, n_bits=256, n_hashes=3)
    assert claimed.where(~F.col("claimed")).count() == 0
    # dense 256-bit filter over 120 items: false positives must exist
    fp = SK.bloom_probe(others, bl, n_bits=256, n_hashes=3)
    assert fp.where(F.col("claimed")).count() > 0
    # filter union == build over union (bit_or merge)
    merged = (
        bl.unionAll(SK.bloom_build(others, n_bits=256, n_hashes=3))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    full = SK.bloom_build(members.unionAll(others), n_bits=256, n_hashes=3)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }
    # only 32 low bits per word are ever used
    assert full.where(
        (F.col("bits") < 0) | (F.col("bits") >= F.lit(1 << 32))
    ).count() == 0


def test_sketch_plans_no_python_single_shuffle_broadcast_probe(spark):
    items = _items(spark, 0, 100)
    build = SK.cms_build(items, depth=4, width=32)
    plan = build._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan
    assert plan.count("Exchange") <= 1, plan

    probe = SK.cms_estimate(
        items.select("item").distinct(), build, depth=4, width=32
    )
    pplan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pplan, pplan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in pplan, pplan

    bl = SK.bloom_build(items, n_bits=256, n_hashes=3)
    bplan = bl._jdf.queryExecution().executedPlan().toString()
    assert bplan.count("Exchange") <= 1, bplan
    bprobe = SK.bloom_probe(items.select("item").distinct(), bl,
                            n_bits=256, n_hashes=3)
    bpplan = bprobe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bpplan, bpplan


def test_streaming_sketch_maintenance_equals_batch(spark, tmp_path):
    """Sketches maintained INCREMENTALLY over a stream equal the batch
    build over the full corpus: each foreachBatch merges its micro-batch's
    cells into the persisted sketch (bit_or for Bloom, cell-wise sum for
    CMS) — the sketch merge operator IS the streaming increment, the same
    batch-kernel-reuse pattern as the extraction and frontier streams."""
    import os

    src = os.path.join(str(tmp_path), "items_src")
    bl_out = os.path.join(str(tmp_path), "bloom")
    cm_out = os.path.join(str(tmp_path), "cms")

    batches = [
        [f"it-{i}" for i in range(0, 40)],
        [f"it-{i}" for i in range(30, 80)],   # overlap re-adds (CMS weights)
        [f"it-{i}" for i in range(80, 120)],
    ]
    for rows in batches:
        spark.createDataFrame([(x,) for x in rows], "item string").write.mode(
            "append"
        ).parquet(src)

    def handle(batch_df, batch_id):
        bl = SK.bloom_build(batch_df, n_bits=256, n_hashes=3)
        if os.path.isdir(bl_out) and any(
            f.endswith(".parquet") for f in os.listdir(bl_out)
        ):
            bl = (
                bl.unionByName(spark.read.parquet(bl_out))
                .groupBy("word_idx")
                .agg(F.expr("bit_or(bits)").alias("bits"))
            )
        bl.write.mode("overwrite").parquet(bl_out + ".tmp")
        spark.read.parquet(bl_out + ".tmp").write.mode("overwrite").parquet(bl_out)
        cm = SK.cms_build(batch_df, depth=4, width=32)
        if os.path.isdir(cm_out) and any(
            f.endswith(".parquet") for f in os.listdir(cm_out)
        ):
            cm = (
                cm.unionByName(spark.read.parquet(cm_out))
                .groupBy("row", "col")
                .agg(F.sum("n").alias("n"))
            )
        cm.write.mode("overwrite").parquet(cm_out + ".tmp")
        spark.read.parquet(cm_out + ".tmp").write.mode("overwrite").parquet(cm_out)

    stream = spark.readStream.schema("item string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(handle).trigger(
        availableNow=True
    ).option(
        "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
    ).start()
    q.awaitTermination(120)

    allitems = spark.createDataFrame(
        [(x,) for rows in batches for x in rows], "item string"
    )
    full_bl = SK.bloom_build(allitems, n_bits=256, n_hashes=3)
    got_bl = spark.read.parquet(bl_out)
    assert {tuple(r) for r in got_bl.collect()} == {
        tuple(r) for r in full_bl.collect()
    }
    full_cm = SK.cms_build(allitems, depth=4, width=32)
    got_cm = spark.read.parquet(cm_out)
    assert {tuple(r) for r in got_cm.collect()} == {
        tuple(r) for r in full_cm.collect()
    }


def test_build_ledger_cli_full_then_increment(spark, tmp_path):
    """jobs/build_ledger.py: full build, then an --increment merge that
    reads ONLY the increment — the result must equal the full build over
    the union, probes must have zero false negatives, and the fp estimate
    must come from the live filter's fill ratio."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    from build_ledger import build_ledger

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame(
        [(f"https://h{i % 7}.com/p{i}",) for i in range(150)], "url string"
    ).write.parquet(a)
    spark.createDataFrame(
        [(f"https://h{i % 7}.com/p{i}",) for i in range(150, 300)],
        "url string",
    ).write.parquet(b)
    out = str(tmp_path / "ledger")

    rep = build_ledger(
        spark, a, out, n_bits=2048, n_hashes=3,
        probe="https://h0.com/p0,https://never.example/x",
    )
    assert rep["n_keys"] == 150 and rep["probes"]["https://h0.com/p0"]
    assert 0 < rep["bits_set"] <= 450
    assert 0 <= rep["fp_est"] < 0.05

    rep2 = build_ledger(
        spark, a, out, n_bits=2048, n_hashes=3, increment=b,
        probe="https://h1.com/p211",
    )
    assert rep2["merged_increment"] and rep2["n_keys"] == 150
    assert rep2["probes"]["https://h1.com/p211"]
    assert rep2["bits_set"] >= rep["bits_set"]

    # merged ledger == full build over the union
    full = SK.bloom_build(
        spark.read.parquet(a).unionByName(spark.read.parquet(b))
        .select(F.col("url").alias("item")),
        n_bits=2048, n_hashes=3,
    )
    got = spark.read.parquet(out)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in full.collect()
    }
    # no false negatives over every key ever added
    allk = spark.read.parquet(a).unionByName(spark.read.parquet(b)).select(
        F.col("url").alias("item")
    )
    claims = SK.bloom_probe(allk, got, n_bits=2048, n_hashes=3)
    assert claims.where(~F.col("claimed")).count() == 0

    # shape guard: an increment under different (n_bits, n_hashes) must be
    # rejected — merging incompatible filters silently yields false
    # negatives, the one failure mode a Bloom ledger must never have
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shape mismatch"):
        build_ledger(spark, a, out, n_bits=4096, n_hashes=3, increment=b)
    with _pytest.raises(ValueError, match="shape mismatch"):
        build_ledger(spark, a, out, n_bits=2048, n_hashes=5, increment=b)
    # and the sidecar rides along: a fresh full build overwrites it
    import json as _json

    with open(os.path.join(out, "_meta.json")) as f:
        assert _json.load(f)["n_bits"] == 2048


# ---------------------------------------------------- HyperLogLog


def test_hll_error_bound_and_both_branches(spark):
    from pyspark.sql import functions as F
    from corsearch_project_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from corsearch_project_spark.operators.dedup import word_shingles
    from conftest import SF_CORRECT

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    # low-cardinality keys (31 distinct words): linear-counting branch
    w = docs.select("lang", F.explode(F.split(F.trim("text"), " ")).alias("k"))
    # high-cardinality keys (~900 bigrams/lang): raw-HLL branch
    g = docs.select("lang", F.explode(word_shingles(F.col("text"), 2)).alias("k"))
    for keyed in (w, g):
        est = {
            r["lang"]: r["est_distinct"]
            for r in hll_estimate(
                hll_registers(keyed, "k", ("lang",)), ("lang",)
            ).collect()
        }
        exact = {
            r["lang"]: r["n"]
            for r in keyed.groupBy("lang").agg(
                F.countDistinct("k").alias("n")
            ).collect()
        }
        for lang, ex in exact.items():
            # 3 sigma of the standard 1.04/sqrt(m) HLL error
            assert abs(est[lang] - ex) / ex <= 3 * 1.04 / (256 ** 0.5), (
                lang, est[lang], ex,
            )


def test_hll_merge_equals_whole_build(spark):
    from pyspark.sql import functions as F
    from corsearch_project_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )
    from conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    w = docs.select("lang", F.explode(F.split(F.trim("text"), " ")).alias("k"))
    whole = hll_registers(w, "k", ("lang",))
    halves = [
        hll_registers(w.where(f"doc_id % 2 = {i}"), "k", ("lang",))
        for i in (0, 1)
    ]
    merged = hll_merge(halves, ("lang",))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_registers_single_shuffle_no_python(spark):
    from pyspark.sql import functions as F
    from corsearch_project_spark.operators.sketches import hll_registers
    from conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    w = docs.select("lang", F.explode(F.split(F.trim("text"), " ")).alias("k"))
    regs = hll_registers(w, "k", ("lang",))
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan
