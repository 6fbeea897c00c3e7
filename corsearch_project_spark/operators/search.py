"""Distributed inverted index + conjunctive ranked search.

A corpus engine needs a search path over its own holdings (finding every
document containing a set of terms — dedup forensics, contamination
audits, eyeballing curation decisions). The distributed form of an
inverted index is not a per-node posting-list file but a *posting
relation* (term, doc_id, tf): building it is one explode + partial-agg
shuffle, and every classic index operation becomes relational algebra —
document frequency is a groupBy, conjunctive AND is a group-count filter,
ranking is an aggregate. At 10^12 documents the posting relation is
persisted bucketed by term (sources/io.py's bucketed-sink shape), so a
query's term filter prunes straight to the matching buckets and the
fan-in join never rescans the corpus; here the relation is built inline
and the same plan applies.

Ranking weight: ``tf * (n_docs - df)`` — exact-integer rarity weighting
(monotone in idf; a document-frequency-rare term outweighs a common one)
chosen over float ``tf*log(n/df)`` so ranking is bit-deterministic across
engines and partition orders, with doc_id as the total-order tiebreak.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, functions as F


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) posting relation — one explode + one shuffle.

    Whitespace tokenization (the corpus contract); empty tokens from
    runs of spaces are dropped. Map-side combine absorbs within-document
    term repeats, so the shuffle carries (term, doc_id) keys, not tokens.
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_doc_freq(postings: DataFrame) -> DataFrame:
    """(term, df) — document frequency; re-aggregates the posting keys."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )


def search_conjunctive(
    docs: DataFrame,
    terms: List[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) — top-k documents containing ALL query terms.

    Shape: posting relation filtered to the query terms FIRST (with a
    persisted term-bucketed index this is the bucket prune; inline it
    cuts the aggregation to |terms| keys), document frequencies of those
    terms broadcast back onto the postings, per-document fold requiring
    all |terms| distinct terms (conjunctive AND as HAVING count = n),
    integer rarity score ``sum(tf * (n_docs - df))``, top-k via
    TakeOrderedAndProject with doc_id tiebreak. No cartesian anywhere:
    the two scalar/tiny sides (corpus size, per-term df) are broadcast.
    """
    post = build_postings(docs, id_col=id_col, text_col=text_col).where(
        F.col("term").isin(list(terms))
    )
    stats = term_doc_freq(post)
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    scored = (
        post.join(F.broadcast(stats), "term")
        .join(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.col("tf") * (F.col("n_docs") - F.col("df"))
            ).cast("long").alias("score"),
        )
        .where(F.col("n_terms") == len(terms))
    )
    return (
        scored.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def update_postings(
    postings: DataFrame,
    changed_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incrementally maintain a posting relation after a re-crawl merge:
    drop every posting of a changed/new document (LEFT ANTI on doc_id —
    stale terms must go, not just be overwritten), then union the
    freshly built postings of the changed docs. Equivalent to rebuilding
    from the merged corpus (pinned by test), but the anti-join + build
    touch only |changed| documents — the same incremental shape as the
    merge pipeline's bucket rewrite (plans/merge_pipeline.py). With the
    relation persisted bucketed by term, the union lands as a per-bucket
    append + compaction.
    """
    changed_ids = changed_docs.select(F.col(id_col).alias("doc_id"))
    kept = postings.join(changed_ids, "doc_id", "left_anti")
    fresh = build_postings(changed_docs, id_col=id_col, text_col=text_col)
    # the join moved its key first; restore the posting-relation contract
    return kept.select("term", "doc_id", "tf").unionByName(fresh)


def search_snippets(
    docs: DataFrame,
    terms: List[str],
    k: int = 10,
    width: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, snippet) — top-k conjunctive hits with a codegen
    excerpt around the FIRST occurrence of the first query term.

    The ranked doc_ids come from :func:`search_conjunctive`; the snippet
    join back to the corpus is a broadcast of the k-row result onto the
    docs relation (never the reverse), and the excerpt itself is
    locate + substring — no Python. ``width`` chars starting up to 20
    before the hit, whitespace-trimmed.
    """
    top = search_conjunctive(
        docs, terms, k=k, id_col=id_col, text_col=text_col
    )
    joined = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).join(F.broadcast(top), "doc_id")
    pos = F.locate(terms[0], F.col("text"))
    start = F.greatest(F.lit(1), pos - F.lit(20))
    return joined.select(
        "doc_id",
        "score",
        F.trim(F.substring(F.col("text"), start, F.lit(width)))
        .alias("snippet"),
    )


def write_postings(
    postings: DataFrame, path: str, n_buckets: int = 64
) -> None:
    """Persist the posting relation term-bucketed: ``term_bucket =
    pmod(xxhash64(term), n_buckets)`` as a partition column, so a query's
    term filter becomes PARTITION PRUNING — the scan opens only the
    matching bucket directories, never the corpus-wide index. The same
    layout contract as the pages table (url_bucket, sources/io.py): at
    10^12 docs the index is far larger than any single query's slice, and
    pruning is what keeps lookup cost ~|matching postings|.
    """
    (
        postings.withColumn(
            "term_bucket",
            F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)).cast("int"),
        )
        .repartition(F.col("term_bucket"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )


def lookup_postings(
    spark, path: str, terms: List[str], n_buckets: int = 64
) -> DataFrame:
    """Read only the buckets covering ``terms`` — the explicit
    bucket-prune companion to :func:`write_postings`. The term_bucket
    predicate is computed driver-side from the same hash, so Catalyst
    prunes partitions statically; the residual term filter lands as a
    parquet pushed filter inside the surviving buckets.
    """
    probe = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = [
        r["b"]
        for r in probe.select(
            F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets))
            .cast("int").alias("b")
        ).distinct().collect()
    ]
    return (
        spark.read.parquet(path)
        .where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(list(terms)))
        .select("term", "doc_id", "tf")
    )
