"""BPE merge training / segmentation — operators/bpe.py.

The oracle here is an INDEPENDENT pure-Python Sennrich (ACL 2016)
implementation: symbol tuples, per-round pair Counter, total-order
argmax (count desc, left asc, right asc), left-to-right non-overlapping
merge. The Spark operator must reproduce its merge table bit-for-bit —
that is the determinism contract the engine promises for tokenizer
training.
"""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import bpe as B


# ------------------------------------------------ pure-Python reference

def ref_train(texts, n_merges):
    """Sennrich BPE on symbol TUPLES — structurally unlike the string
    encoding the Spark operator uses, so agreement is evidence."""
    vocab = {}
    for t in texts:
        for w in t.split():
            vocab[w] = vocab.get(w, 0) + 1
    seqs = {w: tuple(w) + (B.EOW,) for w in vocab}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, n))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs, vocab


def ref_census(seqs, vocab):
    c = Counter()
    for w, syms in seqs.items():
        for s in syms:
            c[s] += vocab[w]
    return dict(c)


# ------------------------------------------------------------- fixtures

CORPUS = [
    "low lower lowest low low",
    "new newer newest new wider wide",
    "the the the then there these",
    "aaa aa a aaaa",  # adjacent-overlap arm: merge (a,a) inside runs
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


# ----------------------------------------------------------------- tests

def test_word_dict(spark, docs):
    got = {r["word"]: r["cnt"] for r in B.bpe_word_dict(docs).collect()}
    want = Counter(w for t in CORPUS for w in t.split())
    assert got == dict(want)


def test_train_matches_reference_exactly(spark, docs):
    merges, dic = B.bpe_train(docs, n_merges=12)
    want, _, _ = ref_train(CORPUS, 12)
    assert merges == want
    dic.unpersist()


def test_overlap_is_left_to_right(spark):
    """'aaaa' + merge (a,a): left-to-right gives (aa, aa) — never the
    overlapping (a, aa, a) split. The 'aaaaa' arm weights (aa,aa) above
    the (aa,</w>) tie so round 2 merges it, collapsing 'aaaa' to one
    symbol while odd-length runs keep their trailing 'a'."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaa aaaa aaaaa")], "doc_id long, text string"
    )
    merges, dic = B.bpe_train(docs, n_merges=2)
    want, _, _ = ref_train(["aaaa aaa aaaa aaaaa"], 2)
    assert merges == want
    assert [(m[1], m[2]) for m in merges] == [("a", "a"), ("aa", "aa")]
    seqs = {
        r["word"]: r["seq"]
        for r in dic.select("word", "seq").collect()
    }
    assert seqs["aaaa"] == " aaaa  </w> "
    assert seqs["aaa"] == " aa  a  </w> "
    assert seqs["aaaaa"] == " aaaa  a  </w> "
    dic.unpersist()


def test_eow_merges_are_learned(spark, docs):
    """With enough budget the trainer must absorb </w> into subwords —
    and agree with the reference while doing it."""
    merges, dic = B.bpe_train(docs, n_merges=30)
    want, _, _ = ref_train(CORPUS, 30)
    assert merges == want
    assert any(m[2] == B.EOW or m[1].endswith(">") for m in merges)
    dic.unpersist()


def test_census_matches_reference(spark, docs):
    merges, dic = B.bpe_train(docs, n_merges=8)
    got = {r["token"]: r["n"] for r in B.token_census(dic).collect()}
    _, seqs, vocab = ref_train(CORPUS, 8)
    assert got == ref_census(seqs, vocab)
    dic.unpersist()


def test_apply_replays_training(spark, docs):
    """Segmentation with the learned merge list reproduces the training
    dict's final sequences — apply is a pure replay."""
    merges, dic = B.bpe_train(docs, n_merges=10)
    replay = B.bpe_apply(docs, [(m[1], m[2]) for m in merges])
    a = {r["word"]: r["seq"] for r in dic.collect()}
    b = {r["word"]: r["seq"] for r in replay.collect()}
    assert a == b
    dic.unpersist()


def test_encoding_invariant(spark, docs):
    """Every seq stays ' sym(  sym)* ' — 1-space wrapped, 2-space gapped,
    no empty symbols — after any number of merges."""
    _, dic = B.bpe_train(docs, n_merges=15)
    bad = dic.where(
        ~F.col("seq").rlike(r"^ [^ ]+(  [^ ]+)* $")
    ).count()
    assert bad == 0
    dic.unpersist()


def test_plan_pure_jvm(spark, docs):
    """Pair counting and merge application never leave codegen: no
    Python stage anywhere in BPE training's per-round plan."""
    dic = B.bpe_word_dict(docs).withColumn(
        "seq", B._initial_seq(F.col("word"))
    )
    plan = B._pair_counts(B._with_syms(dic))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    applied = B.bpe_apply(docs, [("a", "a"), ("t", "h")])
    plan2 = applied._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEval" not in plan2


def test_fuzz_random_corpora_match_reference(spark):
    """Seeded fuzz: random corpora over a tiny alphabet (dense ties,
    heavy overlaps) — merge tables must match the reference exactly."""
    rng = random.Random(0xB9E)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(
                    rng.choice("abc") for _ in range(rng.randint(1, 5))
                )
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(4)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        merges, dic = B.bpe_train(docs, n_merges=6)
        want, _, _ = ref_train(texts, 6)
        assert merges == want, f"trial {trial}: {texts}"
        dic.unpersist()


def test_bpe_round_plan_no_python_bounded_exchanges(spark):
    """One training round's pair-count plan must stay pure-JVM (the bigram
    fan-out is a codegen zip_with projection, never a Python stage) with
    exactly the partial/final agg exchange, and the argmax must compile to
    TakeOrderedAndProject — the 1-row driver collect the operator's scale
    contract promises."""
    docs = spark.range(60).selectExpr(
        "concat('alpha beta gamma word', id % 9) AS text"
    )
    dic = B.bpe_word_dict(docs).withColumn(
        "seq", B._initial_seq(F.col("word"))
    )
    top1 = (
        B._pair_counts(B._with_syms(dic))
        .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
        .limit(1)
    )
    plan = top1._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # word-dict agg (1 exchange) + pair-count agg (1 exchange); the
    # TakeOrderedAndProject limit is exchange-free.
    assert plan.count("Exchange") <= 2, plan


def test_merge_table_round_trip_segments_identically(spark, tmp_path):
    """train → persist merges → load_merges → bpe_apply must reproduce the
    training dict's final symbol sequences exactly (the artifact lifecycle
    export_corpus ships)."""
    docs = spark.createDataFrame(
        [("low lower lowest", ), ("new newer newest low", )], "text string"
    )
    merges, dic = B.bpe_train(docs, 5)
    path = str(tmp_path / "merges")
    B.merges_df(spark, merges).write.parquet(path)
    loaded = B.load_merges(spark, path)
    assert loaded == [(m[1], m[2]) for m in merges]
    reseg = B.bpe_apply(docs, loaded)
    a = {(r["word"], r["seq"]) for r in dic.collect()}
    b = {(r["word"], r["seq"]) for r in reseg.collect()}
    assert a == b
