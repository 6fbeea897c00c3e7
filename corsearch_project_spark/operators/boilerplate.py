"""Inter-document boilerplate line removal (CCNet / C4-style curation).

Web-crawl extractions repeat nav/footer/cookie-banner lines across millions
of pages; training-data pipelines drop a line when it appears in >=
``min_docs`` distinct documents while keeping document-local repetition
(CCNet's paragraph dedup, C4's line filters). Pure DataFrame program — no
Python in the hot path:

  1. posexplode(split(text)) — narrow, no shuffle;
  2. per-line distinct-document counts — one partial-agg shuffle keyed by
     line content (two-phase: map-side partial distinct first);
  3. join counts back onto the exploded lines — second shuffle, same key,
     so AQE plans it off the already-partitioned exchange;
  4. per-document reassembly — collect_list of kept (pos, line) structs,
     array_sort, join — bounded by the document's own line count.

Shuffle volume is linear in corpus size; at 10^12 docs the only skew risk
is a pathologically common line (e.g. ""), which the AQE skew-join confs
split. The per-line count uses an exact distinct (needed by the oracle
twin); swap for approx_count_distinct when a +-2% threshold is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """-> (id_col, n_lines, n_dropped, cleaned_text) per input row.

    ``cleaned_text`` is the kept lines re-joined with ``sep`` in original
    order, NULL when every line was dropped (mirrors SQL string_agg over
    zero rows, so oracle twins compare exactly).
    """
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    )
    return dedup_lines(lines, id_col=id_col, sep=sep, min_docs=min_docs)


def dedup_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Core of remove_boilerplate_lines over pre-segmented (id, pos, line)
    rows — callers with their own segmentation (e.g. fixed word windows
    over newline-less corpora) enter here."""
    counts = lines.groupBy("line").agg(
        F.countDistinct(id_col).alias("line_docs")
    )
    tagged = lines.join(counts, "line").withColumn(
        "is_bp", F.col("line_docs") >= F.lit(min_docs)
    )
    kept_struct = F.when(~F.col("is_bp"), F.struct("pos", "line"))
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("is_bp").cast("long")).alias("n_dropped"),
            # collect_list drops the NULLs the when() leaves for boilerplate
            # rows; struct sort orders by pos (first field, unique per doc)
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .select(
            id_col,
            "n_lines",
            "n_dropped",
            F.when(
                F.size("_kept") > 0,
                F.concat_ws(sep, F.transform("_kept", lambda s: s["line"])),
            ).alias("cleaned_text"),
        )
    )


def segment_words(text: F.Column, seg_words: int) -> F.Column:
    """array<string> of fixed-size word windows (the deterministic
    'paragraph' segmentation used when a corpus carries no newlines —
    e.g. the synthetic documents table). Segment i covers words
    [i*seg_words, (i+1)*seg_words); the tail segment may be shorter."""
    w = F.split(text, " ")
    n_seg = F.ceil(F.size(w) / F.lit(float(seg_words))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(w, i * seg_words + 1, seg_words), " "
        ),
    )
