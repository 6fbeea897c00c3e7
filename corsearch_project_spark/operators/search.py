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


# --------------------------------------------------------------- BM25


def search_bm25(
    docs: DataFrame,
    terms: List[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """(doc_id, score) — top-k by exact-integer BM25 over ANY query term.

    The disjunctive (OR) complement of :func:`search_conjunctive`, adding
    the two signals rarity weighting alone lacks — term-frequency
    SATURATION (the 40th repeat of a term is worth less than the 2nd;
    Robertson et al., TREC-3 Okapi) and DOCUMENT-LENGTH normalization (a
    hit in a 50-token page outranks the same hit diluted in a 5 000-token
    one). Classic BM25 with k1 = 1.2, b = 0.75 is float arithmetic twice
    over (log idf, avgdl division); this engine's ranking contract is
    bit-determinism across engines and partition orders, so both factors
    are restated exactly over integers:

    - k1 = 6/5 and b = 3/4 clear to an integer ratio. Multiplying the
      saturation term ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
      through by ``10*avgdl`` gives ``22*tf*avgdl / (10*avgdl*tf +
      3*avgdl + 9*dl)`` — every quantity integral once ``avgdl`` is
      pinned to milli-token precision: ``avgdl_milli = (1000*total_tokens)
      DIV n_docs`` (one corpus-wide scalar, broadcast).
    - the per-(doc, term) saturation becomes the fixed-point
      ``sat = (scale * 22 * tf * avgdl_milli) DIV (10*avgdl_milli*tf +
      3*avgdl_milli + 9000*dl)`` — integer DIV agrees between Spark and
      any ANSI engine for the positive operands here; ``sat`` is bounded
      by ``2.2 * scale`` regardless of corpus size.
    - idf keeps the module's exact-rarity form ``(n_docs - df)``
      (monotone in ``log(n/df)``), so ``score = sum_t (n_docs - df_t) *
      sat_t`` with ``doc_id`` as the total-order tiebreak.

    Overflow envelope: the widest intermediate is ``scale * 22 * tf *
    avgdl_milli`` — at 10^6-token documents and milli-precision avgdl
    that is ~2e19/tf-free, so keep ``scale`` at 1e6 and documents under
    ~4e5 tokens (true of any curated web corpus; chunk first otherwise,
    operators/textstats.chunk_sentences). ``n_docs - df`` times ``sat``
    stays under 2^62 up to ~2e12 documents — the design point.

    Plan shape (one corpus scan): ``dl`` is a pure codegen projection
    (``size(filter(split(text), x -> x <> ''))``) that RIDES the posting
    explode — no second scan, no doc-length join; the corpus scalars
    (n_docs, total tokens) are one tiny agg broadcast; per-term df is
    |terms| rows broadcast. Exactly the q_search_conjunctive topology
    plus two broadcast scalars.
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(toks).alias("term"),
        F.size(toks).cast("long").alias("dl"),
    )
    post = (
        base.where(F.col("term").isin(list(terms)))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scalars = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks).cast("long")).alias("total_tokens"),
    ).select(
        "n_docs",
        F.expr("(1000 * total_tokens) DIV n_docs").alias("avgdl_milli"),
    )
    scored = (
        post.join(F.broadcast(stats), "term")
        .join(F.broadcast(scalars))
        .select(
            "doc_id",
            (
                (F.col("n_docs") - F.col("df"))
                * F.expr(
                    f"({scale}L * 22 * tf * avgdl_milli) DIV "
                    "(10 * avgdl_milli * tf + 3 * avgdl_milli + 9000 * dl)"
                )
            ).cast("long").alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").cast("long").alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    )


# ------------------------------------------------------ phrase search


def build_positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, pos) positional posting relation; pos is 1-based
    over the WHOLE token stream (empty tokens from space runs occupy no
    position: they are filtered before numbering, so positions are dense
    and adjacency means textual adjacency). Unlike the tf relation this
    one does not aggregate — position lists are the rows themselves, and
    the persisted form term-buckets exactly like write_postings.
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks)
    ).select(
        F.col("col").alias("term"),
        "doc_id",
        (F.col("pos") + F.lit(1)).cast("long").alias("pos"),
    )


def search_phrase(
    docs: DataFrame,
    phrase: List[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, first_pos) — documents containing the exact
    token phrase, top-k by occurrence count (doc_id tiebreak).

    The classic positional-index phrase query, shaped for a CONSTANT
    two shuffles regardless of phrase length m (a naive m-way self-join
    is m-1 shuffles and rescans the postings m times): every posting whose term
    matches slot i of the phrase emits ``(doc_id, anchor = pos - i,
    slot = i)`` — a term appearing at several slots ("buffalo buffalo")
    emits one row per slot — and a phrase occurrence at position p is
    exactly a ``(doc_id, anchor = p)`` group covering ALL m DISTINCT
    slots. The slot fan-out is computed in the same codegen projection
    as the posting filter (transform+filter over the literal phrase
    array), so the whole query is: scan → posexplode → slot-project →
    one groupBy(doc_id, anchor) → one groupBy(doc_id) → top-k. With a
    persisted positional index the first scan is the term-bucket prune.
    """
    m = len(phrase)
    post = build_positional_postings(docs, id_col=id_col, text_col=text_col)
    lit_phrase = ", ".join("'" + t.replace("'", "\\'") + "'" for t in phrase)
    slots = post.where(F.col("term").isin(list(phrase))).select(
        "doc_id",
        "pos",
        F.explode(
            F.expr(
                f"filter(transform(array({lit_phrase}), "
                "(t, i) -> IF(t = term, i, -1)), x -> x >= 0)"
            )
        ).alias("slot"),
    ).select(
        "doc_id", (F.col("pos") - F.col("slot")).alias("anchor"), "slot"
    )
    occurrences = (
        slots.where(F.col("anchor") >= 1)
        .groupBy("doc_id", "anchor")
        .agg(F.countDistinct("slot").alias("n_slots"))
        .where(F.col("n_slots") == m)
    )
    return (
        occurrences.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("anchor").cast("long").alias("first_pos"),
        )
        .orderBy(F.desc("n_hits"), F.asc("doc_id"))
        .limit(k)
    )


# -------------------------------------------------- proximity search


def search_proximity(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    k: int = 10,
    max_dist: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, min_dist, n_pairs) — documents where ``term_a`` and
    ``term_b`` co-occur, top-k by smallest token distance (then more
    co-occurrences, then doc_id): "near each other" beats "both present
    somewhere", the relevance signal conjunctive AND cannot see.

    The naive plan joins a's position list against b's per document —
    |pos_a| x |pos_b| fan-out, quadratic on common terms. This one uses
    the two-pointer fact that the minimum distance between elements of
    two sorted lists is realized by a pair ADJACENT in the merged sort
    order: filter positional postings to the two terms, one window over
    (doc_id ORDER BY pos), keep rows whose lag-term differs, and the
    per-doc min of (pos - lag_pos) IS min_dist. Linear rows, one shuffle
    (the window repartitions by doc_id), no self-join. n_pairs counts
    the adjacent different-term pairs at distance <= max_dist (all
    co-occurring adjacencies when unset) as the density tiebreak.

    Per-document position lists share a partition (window semantics);
    a single document's postings always fit — positions are longs, the
    widest real page is ~1e6 tokens (chunk first otherwise).
    """
    from pyspark.sql.window import Window

    post = build_positional_postings(
        docs, id_col=id_col, text_col=text_col
    ).where(F.col("term").isin([term_a, term_b]))
    w = Window.partitionBy("doc_id").orderBy("pos")
    adj = (
        post.select(
            "doc_id",
            "pos",
            "term",
            F.lag("term").over(w).alias("prev_term"),
            F.lag("pos").over(w).alias("prev_pos"),
        )
        .where(
            F.col("prev_term").isNotNull()
            & (F.col("term") != F.col("prev_term"))
        )
        .select("doc_id", (F.col("pos") - F.col("prev_pos")).alias("dist"))
    )
    if max_dist is not None:
        adj = adj.where(F.col("dist") <= max_dist)
    return (
        adj.groupBy("doc_id")
        .agg(
            F.min("dist").cast("long").alias("min_dist"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .orderBy(F.asc("min_dist"), F.desc("n_pairs"), F.asc("doc_id"))
        .limit(k)
    )


# --------------------------------------------------- more-like-this


def more_like_this(
    docs: DataFrame,
    query_doc: str | int,
    k: int = 10,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, n_shared) — top-k documents most similar to
    ``query_doc`` by shared-term weighted dot product ("find me more
    pages like this one" — the relevance-feedback primitive, and the
    forensic follow-up to every dedup hit that ISN'T byte-identical).

    Weighting is the module's exact-integer rarity form: term weight in
    a document is ``tf * (n_docs - df)``, score is the dot product over
    shared terms — all BIGINT, bit-deterministic, doc_id tiebreak.

    Plan: the query document's posting vector is tiny (<= its distinct
    terms) and is BROADCAST onto the corpus posting relation — an equi-
    join on term, never a similarity self-join; then one groupBy(doc).
    ``max_df`` drops terms with document frequency above the cap BEFORE
    the join (df is computed on the |query terms|-sized slice): stop-
    words pair the query doc with everything — quadratic fan-out, zero
    signal — the same cap-the-hubs move as dedup.mirror_hosts. With the
    persisted term-bucketed index the posting filter is the bucket
    prune, so cost ~ |postings of the query's rare terms|.
    """
    post = build_postings(docs, id_col=id_col, text_col=text_col)
    qvec = post.where(F.col("doc_id") == query_doc).select(
        "term", F.col("tf").alias("q_tf")
    )
    # df over postings of the query's terms only (semi-join prune first)
    cand = post.join(F.broadcast(qvec.select("term")), "term")
    stats = cand.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    if max_df is not None:
        stats = stats.where(F.col("df") <= max_df)
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        cand.where(F.col("doc_id") != query_doc)
        .join(F.broadcast(qvec), "term")
        .join(F.broadcast(stats), "term")
        .join(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("q_tf") * F.col("tf")
                * (F.col("n_docs") - F.col("df"))
                * (F.col("n_docs") - F.col("df"))
            ).cast("long").alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_shared"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
