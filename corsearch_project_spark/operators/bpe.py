"""Corpus-scale BPE (byte-pair-encoding) merge training + segmentation.

The subword vocabulary is THE training-data artifact a corpus engine is
asked for right after dedup and quality filtering: tokenizer training is
a corpus-wide counting problem, and at 10^12 documents it has exactly one
viable distributed shape (Sennrich et al., ACL 2016, the algorithm every
BPE trainer implements):

1. **One corpus scan** reduces the corpus to the word-frequency dict
   ``(word, cnt)`` — vocab-sized (millions of rows at web scale, not
   trillions), cacheable, and every training round iterates on IT, never
   on the corpus again.
2. Each merge round is: count adjacent symbol pairs weighted by word
   count (one explode + one partial-agg shuffle over the dict), take the
   global argmax (ONE row to the driver — the only driver data, bounded
   by construction), rewrite the symbol sequences (a pure codegen
   projection). K merges = K linear passes over the vocab relation.

Determinism contract (the engine-wide rule): counts are exact BIGINTs
and the argmax tie-break is total — ``count DESC, left ASC, right ASC``
(binary string order, identical in Spark and DuckDB for the ASCII symbol
alphabet) — so the learned merge table is bit-identical across engines,
partition counts, and row orders.

Symbol-sequence encoding — why plain ``replace`` IS the BPE merge step:
a word's symbols are joined with TWO spaces and the whole sequence is
wrapped in single spaces (``"the"`` → ``" t  h  e  </w> "``). A merge of
(a, b) is then the literal string replacement ``' a  b ' → ' ab '``:
the pattern consumes one space from each neighboring gap and the
replacement puts one back, so every gap stays 2 spaces and the wrap
stays 1 — the encoding is invariant under merging — while adjacent
occurrences (``a b a b``) still match left-to-right without overlap
(each neighboring gap donates a different space to each match).
Left-to-right non-overlapping replacement is exactly the merge
order reference BPE implementations use (``"a a a"`` + merge (a,a) →
``"aa a"``), and plain string replace — no regex, no escaping, bitwise
identical between Spark's ``replace`` and DuckDB's ``replace`` — has
those semantics in both engines.

``</w>`` is the end-of-word symbol (it cannot collide: corpus tokens
are whitespace-split, so no word contains ``<``-space sequences that
produce it). Merges that absorb it (``e + </w>``) are legal and learned
like any other.

Lineage: each round chains one ``replace`` projection onto the dict
plan; every ``checkpoint_every`` rounds the dict is localCheckpoint-ed
(vocab-sized — cheap) so the plan never grows past a few rounds deep.
On a cluster use reliable checkpoints (same seam as
operators/dedup.connected_components).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def bpe_word_dict(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the one corpus-wide shuffle of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _initial_seq(word) -> "F.Column":
    """' c1  c2  ...  </w> ' — chars 2-space-joined, 1-space wrapped."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(word, "(.)", "$1  "),
        F.lit(EOW + " "),
    )


def _pair_counts(dic: DataFrame) -> DataFrame:
    """(a, b, n) — adjacent-symbol pairs weighted by word count. The
    bigram fan-out happens INSIDE a codegen projection (zip_with over
    two slices of the split sequence); the only shuffle is the (a, b)
    partial agg."""
    return (
        dic.select(
            "cnt",
            F.explode(
                F.expr(
                    "zip_with(slice(syms, 1, size(syms) - 1), "
                    "slice(syms, 2, size(syms) - 1), "
                    "(x, y) -> struct(x as a, y as b))"
                )
            ).alias("p"),
        )
        .select("cnt", "p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )


def _with_syms(dic: DataFrame) -> DataFrame:
    return dic.withColumn("syms", F.split(F.trim(F.col("seq")), "  "))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> Tuple[List[Tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, dict_df)`` where ``merges`` is the ordered list
    ``(step, left, right, merged, pair_count)`` — driver-side by nature
    (the global argmax is one row per round; K rounds = K rows) — and
    ``dict_df`` is the word dict carrying the final symbol sequences
    (input to vocabulary extraction / segmentation checks). Stops early
    if no pair is left (every word fully merged).
    """
    base = (
        bpe_word_dict(docs, text_col=text_col)
        .withColumn("seq", _initial_seq(F.col("word")))
        .persist()
    )
    dic = base
    merges: List[Tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(_with_syms(dic))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((step, a, b, a + b, int(n)))
        dic = dic.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f" {a}  {b} "),
                F.lit(f" {a}{b} "),
            ),
        )
        if step % checkpoint_every == 0:
            dic = dic.localCheckpoint()
    # Materialize the final dict off the cached base, then release the
    # cache: training persists exactly one vocab-sized relation and hands
    # back a self-contained (checkpointed) one — repeated trains in a
    # bench or job loop cannot accumulate cached partitions.
    dic = dic.localCheckpoint()
    base.unpersist()
    return merges, dic


def merges_df(spark, merges) -> DataFrame:
    """The learned merge table as a DataFrame (the persistable artifact;
    ordered by step, the application order segmentation must follow)."""
    return spark.createDataFrame(
        merges, "step long, left string, right string, merged string, "
        "pair_count long"
    )


def bpe_apply(
    dic_or_docs: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    is_dict: bool = False,
) -> DataFrame:
    """Apply an ordered merge list to a corpus (or a prebuilt word
    dict), returning the word dict with final symbol sequences — the
    segmentation step of BPE: K chained codegen ``replace`` projections,
    zero shuffles beyond the word-dict build."""
    if is_dict:
        dic = dic_or_docs
    else:
        dic = bpe_word_dict(dic_or_docs, text_col=text_col).withColumn(
            "seq", _initial_seq(F.col("word"))
        )
    for a, b in merges:
        dic = dic.withColumn(
            "seq",
            F.replace(
                F.col("seq"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
            ),
        )
    return dic


def token_census(dic: DataFrame, k: Optional[int] = None) -> DataFrame:
    """(token, n) — corpus subword-token frequencies from a segmented
    word dict (``n`` = word count x occurrences in the word): the
    vocabulary coverage / fertility report that decides whether the
    merge budget was enough. One explode + one shuffle over the
    vocab-sized dict."""
    out = (
        _with_syms(dic)
        .select("cnt", F.explode(F.col("syms")).alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    if k is not None:
        return out.orderBy(F.desc("n"), F.asc("token")).limit(k)
    return out


def load_merges(spark, path: str) -> List[Tuple[str, str]]:
    """Reload a shipped merge table (``jobs/export_corpus.py`` writes it
    at ``<shards>/_tokenizer/merges``) as the ordered (left, right) list
    ``bpe_apply`` consumes — K rows to the driver, bounded by the merge
    budget by construction."""
    rows = spark.read.parquet(path).orderBy("step").collect()
    return [(r["left"], r["right"]) for r in rows]
