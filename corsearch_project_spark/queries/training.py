"""Training-corpus assembly queries: reproducible splits, sequence packing,
vocabulary statistics — the operations between curation (dedup/quality) and
the tokenizer in a large-scale training-data pipeline. All pure JVM Column
programs with exact DuckDB oracle twins (portable md5 hash, identical word
split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.operators.dedup import words
from corsearch_project_spark.queries.base import query, t
from corsearch_project_spark.queries.textsim import SQL_PHASH, SQL_WORDS


@query(
    "q_sample_hash_split",
    f"""
    SELECT doc_id,
           CASE WHEN {SQL_PHASH.format(s="CAST(doc_id AS VARCHAR)")} % 100 < 80
                    THEN 'train'
                WHEN {SQL_PHASH.format(s="CAST(doc_id AS VARCHAR)")} % 100 < 90
                    THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Reproducible train/valid/test split by portable hash of the stable "
    "key — membership is a pure function of doc_id, so reruns, increments "
    "and any cluster size agree; no rand(), no sampling state. At 10^12 "
    "docs this is a narrow projection, no shuffle (operators/textstats.py "
    "hash_split).",
)
def q_sample_hash_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.hash_split(F.col("doc_id").cast("string")).alias("split"),
    )


@query(
    "q_pack_sequences",
    f"""
    WITH tok AS (
        SELECT doc_id, lang, CAST(len({SQL_WORDS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM tok
    )
    SELECT doc_id, lang, n_tokens,
           CAST(floor(CAST(cum_before AS DOUBLE) / 512.0) AS BIGINT) AS bin_id
    FROM c
    """,
    doc="Sequence packing for training batches: contiguous docs (doc_id "
    "order within each lang shard) are packed into 512-token bins by "
    "token cumsum — bin = floor(cum_before/budget). The shard key bounds "
    "window state per task at scale (operators/textstats.py pack_bins).",
)
def q_pack_sequences(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tok = X.token_count(F.col("text"))
    d = d.select("doc_id", "lang", n_tok.alias("n_tokens"))
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        X.pack_bins(
            F.col("n_tokens"), 512, order=[F.col("doc_id")],
            partition=[F.col("lang")],
        ).alias("bin_id"),
    )


@query(
    "q_boilerplate_lines",
    """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               CAST(ceil(len(string_split(text, ' ')) / 3.0) AS BIGINT) AS n_seg
        FROM documents
    ),
    pos AS (
        SELECT doc_id, ws, unnest(range(n_seg)) AS pos FROM w
    ),
    seg AS (
        SELECT doc_id, pos,
               array_to_string(ws[(pos * 3 + 1):(pos * 3 + 3)], ' ') AS line
        FROM pos
    ),
    cnt AS (
        SELECT line, count(DISTINCT doc_id) AS line_docs FROM seg GROUP BY line
    )
    SELECT s.doc_id,
           count(*) AS n_segs,
           CAST(sum(CASE WHEN c.line_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           string_agg(CASE WHEN c.line_docs < 2 THEN s.line END, chr(10)
                      ORDER BY s.pos) AS cleaned_text
    FROM seg s JOIN cnt c USING (line)
    GROUP BY s.doc_id
    """,
    doc="Inter-document boilerplate removal (CCNet/C4-style): drop every "
    "'line' that appears in >=2 distinct documents, keep document-local "
    "repetition, reassemble the survivors in order. The documents table "
    "carries no newlines, so lines are deterministic 3-word windows "
    "(operators/boilerplate.segment_words); over extracted web text the "
    "same operator runs on real newline blocks "
    "(operators/boilerplate.remove_boilerplate_lines). Two content-keyed "
    "partial-agg shuffles + one per-doc reassembly — linear at 10^12 docs, "
    "common-line skew handled by AQE skew-join.",
)
def q_boilerplate_lines(spark, sf_dir):
    from corsearch_project_spark.operators import boilerplate as B

    d = t(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id",
        F.posexplode(B.segment_words(F.col("text"), 3)).alias("pos", "line"),
    )
    out = B.dedup_lines(lines, id_col="doc_id", sep="\n", min_docs=2)
    return out.withColumnRenamed("n_lines", "n_segs")



@query(
    "q_ngram_topk",
    f"""
    WITH w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i + 1])) AS gram
        FROM w
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM bg GROUP BY gram
    ORDER BY n DESC, gram ASC LIMIT 20
    """,
    doc="Vocabulary statistics: top-20 bigrams by corpus frequency with "
    "document frequency — explode adjacent word pairs, partial-agg count, "
    "TakeOrderedAndProject top-k (no global sort). The n-gram relation "
    "shuffles only (gram, counts) keys at scale.",
)
def q_ngram_topk(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    grams = F.expr(
        "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))"
    )
    return (
        d.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(20)
    )
