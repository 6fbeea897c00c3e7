"""Unit + plan gates for the corpus-selection operators (queries/curation.py
registrations): rule cascade, bigram-LM perplexity, bitext margin mining.
Parity vs DuckDB is covered by tests/test_queries.py over REGISTRY; these
tests pin the semantics on crafted rows and the physical-plan invariants."""

import math

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.operators.lm import (
    bigram_counts,
    lm_perplexity,
    score_nll,
)
from corsearch_project_spark.operators.simsearch import bitext_margin_pairs
from conftest import SF_SMOKE


# ------------------------------------------------------------- cascade


def _verdicts(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id", X.cascade_verdict(F.col("text")).alias("v")
        ).collect()
    }


def test_cascade_each_rule_fires_and_order_wins(spark):
    long_word = "x" * 9
    rows = [
        (1, "the quick dog"),                                   # too_short
        (2, " ".join(f"w{i%7}ord the" for i in range(60))),      # too_long (120 tokens)
        (3, " ".join(["a the of to"] * 6)),                      # word_len_low (mwl 2.0, 24 tokens)
        (4, " ".join([long_word] * 10 + ["the of and stopword padding here now ok yes more"])),  # word_len_high
        (5, " ".join(["house"] * 30)),                           # repetitive (mwl 5.0 in band, 1 distinct token)
        (6, " ".join(f"tok{i}word" for i in range(30))),         # no_stopwords (distinct, mwl ok?)
        (7, " ".join(f"the tok{i}b" for i in range(15))),        # keep
    ]
    v = _verdicts(spark, rows)
    assert v[1] == "too_short"
    assert v[2] == "too_long"
    assert v[3] == "word_len_low"
    assert v[5] == "repetitive"  # fires before the stopword rule gets a say
    assert v[7] == "keep"


def test_cascade_word_len_high_and_no_stopwords(spark):
    # 25 distinct 9-char words -> mwl 9.0 > 5.2 -> word_len_high
    rows = [(1, " ".join(f"abcdefgh{chr(97 + i)}" for i in range(25)))]
    assert _verdicts(spark, rows)[1] == "word_len_high"
    # distinct short-ish words, no stopword from the probe set
    rows = [(2, " ".join(f"tk{i:02d}" for i in range(25)))]
    assert _verdicts(spark, rows)[2] == "no_stopwords"


def test_cascade_plan_is_pure_projection(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", X.cascade_verdict(F.col("text")).alias("v")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# ------------------------------------------------------- LM perplexity


def test_lm_counts_and_nll_tiny_corpus(spark):
    # doc 100 trains (any doc_id hashing to 'train' would; we force the
    # slice by calling the count/score stages directly).
    train = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    c12, c1, vocab = bigram_counts(train)
    counts = {r["g"]: r["c12"] for r in c12.collect()}
    # bigrams: a b, b a, a b, b c
    assert counts == {"a b": 2, "b a": 1, "b c": 1}
    heads = {r["h"]: r["c1"] for r in c1.collect()}
    assert heads == {"a": 2, "b": 2}
    assert vocab.first()["v"] == 3

    # score a doc: 'a b c' -> terms: p(b|a)=(2+1)/(2+3), p(c|b)=(1+1)/(2+3)
    doc = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    scored = score_nll(doc, c12, c1, vocab).collect()[0]
    expect = round(-math.log(3 / 5) * 1e6) + round(-math.log(2 / 5) * 1e6)
    assert scored["n_bigrams"] == 2
    assert scored["nll_micro"] == expect


def test_lm_unseen_bigram_gets_add_one_mass(spark):
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    c12, c1, vocab = bigram_counts(train)
    doc = spark.createDataFrame([(9, "z q")], "doc_id long, text string")
    scored = score_nll(doc, c12, c1, vocab).collect()[0]
    # unseen head: p = (0+1)/(0+2) = 1/2
    assert scored["nll_micro"] == round(-math.log(0.5) * 1e6)


def test_lm_buckets_are_terciles(spark):
    out = lm_perplexity(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    sizes = {r["ppl_bucket"]: r["n"] for r in out.groupBy("ppl_bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # head tercile has strictly lower mean NLL than tail
    m = {
        r["ppl_bucket"]: r["m"]
        for r in out.groupBy("ppl_bucket").agg(F.avg("avg_nll").alias("m")).collect()
    }
    assert m["head"] < m["middle"] < m["tail"]


def test_lm_scoring_has_no_python_stage(spark):
    out = lm_perplexity(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# ------------------------------------------------------- bitext mining


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_bitext_mutual_nn_and_margin(spark):
    # pool A (label 0): 1, 3; pool B (label 1): 2, 4.
    # vec 1 ~ vec 2 (aligned), vec 3 ~ vec 4 (aligned), cross pairs weak.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.1], 0),
        (3, [0.0, 1.0, 0.1, 0.0], 0),
        (2, [1.0, 0.05, 0.0, 0.1], 1),
        (4, [0.05, 1.0, 0.1, 0.0], 1),
    ]
    got = {
        (r["src"], r["dst"]): r
        for r in bitext_margin_pairs(_emb(spark, rows), k=2, dim=4).collect()
    }
    assert set(got) == {(1, 2), (3, 4)}
    for r in got.values():
        assert r["cos"] > 0.9
        assert r["margin"] > 1.0  # NN cosine above the local top-k mean


def test_bitext_non_mutual_pair_excluded(spark):
    # B vector 2 is everyone's NN, but 2's own NN is vec 1 — so only
    # (1, 2) is mined; A vector 3 gets nothing.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (3, [0.9, 0.1, 0.0, 0.0], 0),
        (2, [1.0, 0.01, 0.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    got = {
        (r["src"], r["dst"])
        for r in bitext_margin_pairs(_emb(spark, rows), k=2, dim=4).collect()
    }
    assert got == {(1, 2)}


def test_bitext_plan_broadcasts_small_pool(spark):
    # checkpoint=False exposes the pair-generation plan (the default
    # localCheckpoint renders as Scan ExistingRDD and would hide it)
    out = bitext_margin_pairs(
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet"), checkpoint=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan
    # default path: checkpointed pairs, same result, cache released with
    # the result's lifetime (no CacheManager pin) — verify equivalence
    chk = bitext_margin_pairs(
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    )
    assert sorted(map(tuple, chk.collect())) == sorted(map(tuple, out.collect()))


# ------------------------------------------------------- DSIR weights


def test_dsir_target_docs_outrank_offtarget(spark):
    from corsearch_project_spark.operators.lm import dsir_weights

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = dsir_weights(docs, F.col("lang") == "en", top_k=125)
    assert out.where("selected").count() == 125
    langs = dict(
        out.where("selected")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .count()
        .collect()
    )
    # the target-language docs must dominate the selected set
    assert langs.get("en", 0) > sum(v for k, v in langs.items() if k != "en")


def test_dsir_hand_computed_tiny(spark):
    from corsearch_project_spark.operators.lm import dsir_weights, hashed_features

    # two docs: target doc repeats 'aa', raw-only doc repeats 'bb'.
    docs = spark.createDataFrame(
        [(1, "aa aa aa", "t"), (2, "bb bb bb", "r")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in dsir_weights(docs, F.col("lang") == "t", m=4096, top_k=1).collect()}
    # features per doc: 3 unigrams + 2 bigrams = 5
    assert out[1]["n_feats"] == 5 and out[2]["n_feats"] == 5
    # target doc's features are in the target model; raw-only doc's are not
    assert out[1]["logw_micro"] > out[2]["logw_micro"]
    assert out[1]["selected"] and not out[2]["selected"]
    m = 4096
    # hand check: target totals T=5, raw totals R=10.
    # 'aa' unigram bucket: t=3, r=3; 'aa aa' bigram bucket: t=2, r=2
    lam_u1 = round((math.log(4 / (5 + m)) - math.log(4 / (10 + m))) * 1e6)
    lam_u2 = round((math.log(3 / (5 + m)) - math.log(3 / (10 + m))) * 1e6)
    assert out[1]["logw_micro"] == 3 * lam_u1 + 2 * lam_u2


def test_dsir_plan_broadcasts_lambda_no_python(spark):
    from corsearch_project_spark.operators.lm import dsir_weights

    out = dsir_weights(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet"),
        F.col("lang") == "en",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


# --------------------------------------- content-defined chunking


def test_cdc_chunks_partition_the_doc(spark):
    from corsearch_project_spark.operators.dedup import cdc_chunk_texts

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(60)))], "doc_id long, text string"
    )
    chunks = df.select(cdc_chunk_texts(F.col("text")).alias("c")).first()["c"]
    # chunks reassemble to the original word sequence, none empty
    assert " ".join(chunks) == df.first()["text"]
    assert all(c for c in chunks)
    assert len(chunks) >= 2  # 60 words, divisor 16 -> boundaries expected


def test_cdc_shift_resistance(spark):
    from corsearch_project_spark.operators.dedup import cdc_chunk_texts

    base = " ".join(f"tok{i}x" for i in range(200))
    edited = "INSERTED " + base  # one word prepended
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", cdc_chunk_texts(F.col("text")).alias("c")).collect()
    }
    shared = set(got[1]) & set(got[2])
    # a prefix edit must leave the vast majority of chunks byte-identical
    # (fixed-offset windows would shift EVERY window)
    assert len(shared) >= len(got[1]) - 2


def test_cdc_stats_flag_only_cross_doc_chunks(spark):
    from corsearch_project_spark.operators.dedup import cdc_dup_stats

    a = " ".join(f"aa{i}q" for i in range(100))
    rows = [(1, a), (2, a), (3, " ".join(f"zz{i}k" for i in range(100)))]
    out = {
        r["doc_id"]: r
        for r in cdc_dup_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["dup_word_permille"] == 1000  # exact twin: all shared
    assert out[2]["dup_word_permille"] == 1000
    assert out[3]["dup_chunks"] == 0 and out[3]["dup_word_permille"] == 0
    assert out[1]["total_words"] == 100


def test_cdc_chunking_is_shuffle_free_projection(spark):
    from corsearch_project_spark.operators.dedup import cdc_chunk_texts

    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", cdc_chunk_texts(F.col("text")).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


def test_lm_threshold_mode_matches_ntile_buckets(spark):
    """The 10^12-doc threshold path and the exact ntile path must agree on
    every doc whose score is not tied at a cut value; plan-wise the
    threshold mode must not contain a single-partition window."""
    from corsearch_project_spark.operators.lm import lm_perplexity

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = {r["doc_id"]: r["ppl_bucket"] for r in lm_perplexity(docs).collect()}
    out_t = lm_perplexity(docs, mode="threshold")
    b = {r["doc_id"]: r["ppl_bucket"] for r in out_t.collect()}
    assert set(a) == set(b)
    disagree = [k for k in a if a[k] != b[k]]
    # only tie-at-cut docs may differ; on this corpus that is a tiny tail
    assert len(disagree) <= len(a) * 0.02, (len(disagree), len(a))
    plan = out_t._jdf.queryExecution().executedPlan().toString()
    # no unpartitioned window stage anywhere in the threshold plan
    assert "Window" not in plan, plan


# ------------------------------------------------ winnowing (MOSS)


def test_winnow_guarantee_shared_run_surfaces_fingerprint(spark):
    """SIGMOD'03 guarantee: any shared word run of length >= w + k - 1
    (= 7 here) yields at least one COMMON selected fingerprint."""
    run = " ".join(f"shared{i}tok" for i in range(12))  # 12-word common run
    rows = [
        (1, " ".join(f"aa{i}x" for i in range(30)) + " " + run),
        (2, run + " " + " ".join(f"zz{i}y" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: {(f["pos"], f["h"]) for f in r["f"]}
        for r in df.select(
            "doc_id", X.winnow_fingerprints(F.col("text")).alias("f")
        ).collect()
    }
    h1 = {h for _, h in got[1]}
    h2 = {h for _, h in got[2]}
    assert h1 & h2, "shared 12-word run must surface a common fingerprint"


def test_winnow_density_and_short_doc(spark):
    rows = [
        (1, " ".join(f"w{i}q" for i in range(100))),
        (2, "a b c"),  # 3 words < k: zero grams, empty selection
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", X.winnow_fingerprints(F.col("text")).alias("f")
        ).collect()
    }
    assert got[2] == []
    n_grams = 100 - 3
    density = len(got[1]) / (n_grams - 3)
    # expected 2/(w+1) = 0.4; generous band for one sample
    assert 0.2 <= density <= 0.6, density
    # every selected position is in range and hashes match the gram count
    assert all(1 <= f["pos"] <= n_grams for f in got[1])


def test_winnow_selection_is_shuffle_free_projection(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", X.winnow_fingerprints(F.col("text")).alias("f")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan
