"""Corpus-curation decision queries: the rule cascade, the LM perplexity
filter, and margin-based bitext mining — the three canonical *selection*
stages of a web-scale training pipeline (heuristic gate → LM score →
cross-lingual pairing), each with an exact DuckDB oracle twin.

All three follow the house exactness rules (queries/base.py): integer
cross-multiplication instead of ratio comparisons, integer micro-nat
quantization immediately after the single ``ln``, DECIMAL(18,6) sums for
top-k cosine means, and the one double division per query performed with
identical operand order on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.operators.lm import lm_perplexity
from corsearch_project_spark.operators.simsearch import (
    bitext_margin_pairs,
    bitext_margin_pairs_lsh,
)
from corsearch_project_spark.queries.base import REGISTRY, query, t
from corsearch_project_spark.queries.textsim import (
    SQL_PHASH,
    SQL_QUANT,
    SQL_WORDS,
    _sql_lsh_buckets,
    _sql_shingles,
)


# ---------------------------------------------------------- filter cascade

_SQL_STOP = "('" + "', '".join(X.CASCADE_STOPWORDS) + "')"

@query(
    "q_filter_cascade",
    f"""
    WITH s AS (
        SELECT doc_id,
               CAST(len({SQL_WORDS}) AS BIGINT) AS n,
               CAST(len(list_distinct({SQL_WORDS})) AS BIGINT) AS d,
               CAST(len(trim(text)) - (len({SQL_WORDS}) - 1) AS BIGINT)
                   AS letters,
               CAST(len(list_filter({SQL_WORDS}, x -> x IN {_SQL_STOP}))
                    AS BIGINT) AS stop
        FROM documents
    )
    SELECT doc_id, n AS n_tokens,
           CASE WHEN n < 20 THEN 'too_short'
                WHEN n > 80 THEN 'too_long'
                WHEN letters * 10 < n * 40 THEN 'word_len_low'
                WHEN letters * 10 > n * 52 THEN 'word_len_high'
                WHEN (n - d) * 100 > n * 60 THEN 'repetitive'
                WHEN stop = 0 THEN 'no_stopwords'
                ELSE 'keep' END AS verdict
    FROM s
    """,
    doc="C4/Gopher-style rule cascade with first-failing-reason attribution "
    "(token band, mean-word-length band by integer cross-multiplication, "
    "duplicate-token fraction, stopword sanity) — the auditable keep/drop "
    "decision stage; one narrow JVM projection per row, no explode, no "
    "shuffle, no Python (operators/textstats.py cascade_verdict).",
)
def q_filter_cascade(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tokens"),
        X.cascade_verdict(F.col("text")).alias("verdict"),
    )


# ------------------------------------------------------- LM perplexity

_SQL_TRAIN = SQL_PHASH.format(s="CAST(doc_id AS VARCHAR)") + " % 100 < 80"

@query(
    "q_lm_perplexity",
    f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    train AS (SELECT * FROM wt WHERE {_SQL_TRAIN}),
    tg AS (SELECT unnest({_sql_shingles(2)}) AS g FROM train),
    c12 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c12 FROM tg GROUP BY 1),
    c1 AS (SELECT string_split(g, ' ')[1] AS h,
                  CAST(COUNT(*) AS BIGINT) AS c1
           FROM tg GROUP BY 1),
    vocab AS (SELECT CAST(COUNT(DISTINCT u.w1) AS BIGINT) AS v
              FROM (SELECT unnest(w) AS w1 FROM train) u),
    dg AS (
        SELECT doc_id, g, string_split(g, ' ')[1] AS h
        FROM (SELECT doc_id, unnest({_sql_shingles(2)}) AS g FROM wt)
    ),
    terms AS (
        SELECT dg.doc_id,
               CAST(round(-ln(CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE)
                              / CAST(COALESCE(c1.c1, 0) + vocab.v AS DOUBLE))
                          * 1000000, 0) AS BIGINT) AS term_u
        FROM dg LEFT JOIN c12 ON dg.g = c12.g
                LEFT JOIN c1 ON dg.h = c1.h
                CROSS JOIN vocab
    ),
    scored AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(term_u) AS BIGINT) AS nll_micro
        FROM terms GROUP BY 1
    ),
    avgd AS (
        SELECT doc_id, n_bigrams, nll_micro,
               round(CAST(nll_micro AS DOUBLE)
                     / (CAST(n_bigrams AS DOUBLE) * 1000000.0), 6) AS avg_nll
        FROM scored
    )
    SELECT doc_id, n_bigrams, nll_micro, avg_nll,
           CASE ntile(3) OVER (ORDER BY avg_nll, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM avgd
    """,
    doc="CCNet-style perplexity filter (Wenzek et al., LREC 2020): add-one "
    "bigram LM trained on the deterministic hash-split slice, every doc "
    "scored by per-token NLL, corpus bucketed into head/middle/tail "
    "terciles. Counts are one explode + two partial-agg groupBys; scoring "
    "is two left joins (sort-merge on the bigram string at scale) + one "
    "per-doc agg; surprisal is quantized to integer micro-nats right after "
    "the single ln, so all sums are exact integers. The ntile tercile is "
    "the oracle surface; the 10^12-doc seam swaps it for two broadcast "
    "percentile_approx thresholds, no global sort (operators/lm.py).",
)
def q_lm_perplexity(spark, sf_dir):
    return lm_perplexity(t(spark, sf_dir, "documents"))


# ------------------------------------------------------- bitext mining

@query(
    "q_bitext_mine",
    f"""
    WITH e AS (
        SELECT vec_id, label, {SQL_QUANT} AS qe,
               list_inner_product({SQL_QUANT}, {SQL_QUANT}) AS nrm
        FROM embeddings
    ),
    a AS (SELECT vec_id AS src, qe AS qa, nrm AS na FROM e WHERE label % 2 = 0),
    b AS (SELECT vec_id AS dst, qe AS qb, nrm AS nb FROM e WHERE label % 2 = 1),
    p AS (
        SELECT src, dst,
               round(list_inner_product(qa, qb)
                     / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cos
        FROM a CROSS JOIN b
    ),
    f AS (SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst)
                     AS rn
          FROM p),
    fa AS (
        SELECT src,
               max(CASE WHEN rn = 1 THEN dst END) AS nn_dst,
               max(CASE WHEN rn = 1 THEN cos END) AS nn_cos,
               sum(CASE WHEN rn <= 4 THEN CAST(cos AS DECIMAL(18,6)) END)
                   AS sk_a,
               CAST(count(*) FILTER (WHERE rn <= 4) AS BIGINT) AS k_a
        FROM f GROUP BY 1
    ),
    r AS (SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY dst ORDER BY cos DESC, src)
                     AS rn
          FROM p),
    ra AS (
        SELECT dst,
               max(CASE WHEN rn = 1 THEN src END) AS nn_src,
               sum(CASE WHEN rn <= 4 THEN CAST(cos AS DECIMAL(18,6)) END)
                   AS sk_b,
               CAST(count(*) FILTER (WHERE rn <= 4) AS BIGINT) AS k_b
        FROM r GROUP BY 1
    )
    SELECT fa.src, ra.dst, fa.nn_cos AS cos,
           round(fa.nn_cos / (CAST(fa.sk_a + ra.sk_b AS DOUBLE)
                              / CAST(fa.k_a + ra.k_b AS DOUBLE)), 6) AS margin
    FROM fa JOIN ra ON fa.nn_dst = ra.dst AND ra.nn_src = fa.src
    """,
    doc="CCMatrix/WikiMatrix margin-based bitext mining (Artetxe & Schwenk, "
    "ACL 2019): mutual nearest neighbors across the label-parity vector "
    "pools, scored by the ratio margin cos(a,b) / mean(top-4 cos of both "
    "sides) — hubness-normalized pairing. Exact control arm: one cross "
    "join with the smaller pool broadcast + two window ranks; top-4 means "
    "are DECIMAL sums of the quantized cosines. At 10^12 rows the cross "
    "join is replaced by LSH/IVF candidate generation feeding the same "
    "rank + margin tail (operators/simsearch.py bitext_margin_pairs).",
)
def q_bitext_mine(spark, sf_dir):
    return bitext_margin_pairs(t(spark, sf_dir, "embeddings"))


@query(
    "q_bitext_mine_lsh",
    f"""
    WITH {_sql_lsh_buckets(48)},
    lab AS (SELECT vec_id, label FROM embeddings),
    banded AS (
        SELECT b.vec_id, l.label, bd.bd AS band,
               (b.bucket >> (bd.bd * 4)) & 15 AS bv
        FROM buckets b JOIN lab l USING (vec_id)
        CROSS JOIN range(0, 12) bd(bd)
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
        FROM banded a JOIN banded b ON a.band = b.band AND a.bv = b.bv
        WHERE a.label % 2 = 0 AND b.label % 2 = 1
    ),
    e AS (SELECT vec_id, qe, list_inner_product(qe, qe) AS nrm FROM qv),
    p AS (
        SELECT c.src, c.dst,
               round(list_inner_product(sa.qe, sb.qe)
                     / sqrt(CAST(sa.nrm AS DOUBLE) * CAST(sb.nrm AS DOUBLE)),
                     6) AS cos
        FROM cands c
        JOIN e sa ON sa.vec_id = c.src
        JOIN e sb ON sb.vec_id = c.dst
    ),
    f AS (SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst)
                     AS rn
          FROM p),
    fa AS (
        SELECT src,
               max(CASE WHEN rn = 1 THEN dst END) AS nn_dst,
               max(CASE WHEN rn = 1 THEN cos END) AS nn_cos,
               sum(CASE WHEN rn <= 4 THEN CAST(cos AS DECIMAL(18,6)) END)
                   AS sk_a,
               CAST(count(*) FILTER (WHERE rn <= 4) AS BIGINT) AS k_a
        FROM f GROUP BY 1
    ),
    r AS (SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY dst ORDER BY cos DESC, src)
                     AS rn
          FROM p),
    ra AS (
        SELECT dst,
               max(CASE WHEN rn = 1 THEN src END) AS nn_src,
               sum(CASE WHEN rn <= 4 THEN CAST(cos AS DECIMAL(18,6)) END)
                   AS sk_b,
               CAST(count(*) FILTER (WHERE rn <= 4) AS BIGINT) AS k_b
        FROM r GROUP BY 1
    )
    SELECT fa.src, ra.dst, fa.nn_cos AS cos,
           round(fa.nn_cos / (CAST(fa.sk_a + ra.sk_b AS DOUBLE)
                              / CAST(fa.k_a + ra.k_b AS DOUBLE)), 6) AS margin
    FROM fa JOIN ra ON fa.nn_dst = ra.dst AND ra.nn_src = fa.src
    """,
    doc="The 10^12-row bitext arm (q_bitext_mine's scale twin): sign-LSH "
    "banded candidate generation — 48 md5-parity hyperplanes, 12 bands × "
    "4 bits, narrower bands than near-dup because mined pairs live at "
    "moderate cosine (8-bit bands recall 0.18 of exact pairs here, 4-bit "
    "0.93, measured sf0.01) — cross-pool band equi-join instead of the "
    "control arm's broadcast cross join, exact quantized cosine on "
    "candidates only, then the SAME rank + margin tail. Top-k/NN are over "
    "each vector's candidates, so the mined set is recall-gated vs the "
    "exact arm; every emitted cosine and margin is exact. The oracle "
    "replays the identical sign matrix in SQL, so Spark and DuckDB agree "
    "bit-for-bit on candidates AND scores. No CartesianProduct anywhere "
    "(plan-gated); shuffle volume is bucket-bounded "
    "(operators/simsearch.py bitext_margin_pairs_lsh).",
)
def q_bitext_mine_lsh(spark, sf_dir):
    return bitext_margin_pairs_lsh(
        t(spark, sf_dir, "embeddings"), k=4, n_planes=48, band_planes=4
    )


# ------------------------------------------------- DSIR data selection

@query(
    "q_dsir_weights",
    f"""
    WITH wt AS (SELECT doc_id, lang, {SQL_WORDS} AS w FROM documents),
    fx AS (SELECT doc_id, lang,
                  list_concat(w, {_sql_shingles(2)}) AS feats
           FROM wt),
    f AS (
        SELECT doc_id, {SQL_PHASH.format(s="g")} % 4096 AS b
        FROM (SELECT doc_id, unnest(feats) AS g FROM fx)
    ),
    tf AS (
        SELECT {SQL_PHASH.format(s="g")} % 4096 AS b
        FROM (SELECT unnest(feats) AS g FROM fx WHERE lang = 'en')
    ),
    tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t_b FROM tf GROUP BY 1),
    rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r_b FROM f GROUP BY 1),
    tot AS (SELECT (SELECT CAST(SUM(r_b) AS BIGINT) FROM rc) AS r_tot,
                   (SELECT CAST(SUM(t_b) AS BIGINT) FROM tc) AS t_tot),
    lam AS (
        SELECT rc.b,
               CAST(round((ln(CAST(COALESCE(tc.t_b, 0) + 1 AS DOUBLE)
                              / CAST(tot.t_tot + 4096 AS DOUBLE))
                           - ln(CAST(rc.r_b + 1 AS DOUBLE)
                                / CAST(tot.r_tot + 4096 AS DOUBLE)))
                          * 1000000, 0) AS BIGINT) AS lam_u
        FROM rc LEFT JOIN tc ON rc.b = tc.b CROSS JOIN tot
    ),
    scored AS (
        SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
               CAST(SUM(lam.lam_u) AS BIGINT) AS logw_micro
        FROM f JOIN lam ON f.b = lam.b GROUP BY 1
    ),
    avgd AS (
        SELECT doc_id, n_feats, logw_micro,
               round(CAST(logw_micro AS DOUBLE)
                     / (CAST(n_feats AS DOUBLE) * 1000000.0), 6) AS avg_logw
        FROM scored
    )
    SELECT doc_id, n_feats, logw_micro, avg_logw,
           (row_number() OVER (ORDER BY avg_logw DESC, doc_id) <= 125)
               AS selected
    FROM avgd
    """,
    doc="DSIR data selection (Xie et al., NeurIPS 2023): per-doc log "
    "importance ratio between add-one bag-of-hashed-ngrams models of the "
    "target slice (lang='en' here) and the raw corpus, hashed into 4096 "
    "buckets so both model tables broadcast; λ quantized to integer "
    "micro-nats after the two lns — doc sums are exact BIGINTs; top-k by "
    "mean per-feature weight marks `selected` (row_number oracle surface, "
    "broadcast quantile threshold at 10^12 docs). Two explode+partial-agg "
    "bucket counts (shuffle ≤ #tasks×4096) + a broadcast-join scoring "
    "pass, no Python (operators/lm.py dsir_weights).",
)
def q_dsir_weights(spark, sf_dir):
    from corsearch_project_spark.operators.lm import dsir_weights

    return dsir_weights(t(spark, sf_dir, "documents"), F.col("lang") == "en")


# ------------------------------------- content-defined chunk dedup

_P_WI = SQL_PHASH.format(s="w[i]")
_P_WLAST = SQL_PHASH.format(s="w[len(w)]")

def _sql_cdc_chunks_cte(src: str, sfx: str, idc: str = "url") -> str:
    """Chained CTEs producing ({idc}, chunk_text) CDC chunk rows for one
    source CTE — the SINGLE SQL-side replay of cdc_chunk_relation, shared
    by the q_cdc_chunks census and q_change_rate's two snapshot sides so
    the chunking rule cannot silently diverge between oracles."""
    return f"""
    wt{sfx} AS (SELECT {idc}, {SQL_WORDS} AS w FROM {src}),
    b0{sfx} AS (
        SELECT {idc}, w,
               list_filter(generate_series(1, len(w)),
                           i -> {_P_WI} % 16 = 0) AS bpos
        FROM wt{sfx}
    ),
    b1{sfx} AS (
        SELECT {idc}, w,
               list_concat(bpos,
                   CASE WHEN len(w) > 0 AND {_P_WLAST} % 16 <> 0
                        THEN [CAST(len(w) AS BIGINT)]
                        ELSE CAST([] AS BIGINT[]) END) AS bx
        FROM b0{sfx}
    ),
    ch{sfx} AS (
        SELECT {idc},
               array_to_string(
                   w[(CASE WHEN k = 1 THEN 0 ELSE bx[k - 1] END) + 1
                     : bx[k]], ' ') AS chunk_text
        FROM (SELECT {idc}, w, bx,
                     unnest(generate_series(1, len(bx))) AS k
              FROM b1{sfx})
    )"""



@query(
    "q_cdc_chunks",
    f"""
    WITH src0 AS (SELECT doc_id, text FROM documents),
    {_sql_cdc_chunks_cte('src0', '', 'doc_id')},
    hs AS (
        SELECT doc_id, {SQL_PHASH.format(s="chunk_text")} AS h,
               CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_words
        FROM ch
    ),
    shared AS (SELECT h FROM hs GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    fl AS (SELECT hs.*, (hs.h IN (SELECT h FROM shared)) AS dup FROM hs)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE dup) AS BIGINT) AS dup_chunks,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(COALESCE(SUM(n_words) FILTER (WHERE dup), 0) AS BIGINT)
               AS dup_words,
           CAST((COALESCE(SUM(n_words) FILTER (WHERE dup), 0) * 1000)
                // greatest(SUM(n_words), 1) AS BIGINT) AS dup_word_permille
    FROM fl GROUP BY doc_id
    """,
    doc="Content-defined chunk dedup census (LBFS/rsync boundaries, "
    "Muthitacharoen et al. SOSP 2001, at word granularity): a word whose "
    "portable hash ≡ 0 mod 16 closes the chunk, so chunking is shift-"
    "resistant — an edit re-chunks only its neighborhood, unlike fixed "
    "windows — and emits O(n/16) chunks where shingle schemes emit O(n). "
    "Chunking is pure array expressions in ONE projection (no shuffle, no "
    "Python); the census is one partial-agg groupBy on the chunk hash + "
    "an equi-join of shared hashes. Complements q_dedup_substring: same "
    "duplicated-content question, storage-dedup chunk relation "
    "(operators/dedup.py cdc_dup_stats).",
)
def q_cdc_chunks(spark, sf_dir):
    from corsearch_project_spark.operators.dedup import cdc_dup_stats

    return cdc_dup_stats(t(spark, sf_dir, "documents"))


# ------------------------------------------------- winnowing census

_P_G = SQL_PHASH.format(s="g")
# rightmost-min selection for the window starting at i (w=4), inlined twice
# (no let-bindings in SQL lambdas): absolute 1-based gram position
_W_SEL = ("i - 1 + (5 - list_position(list_reverse(hs[i:i+3]), "
          "list_min(hs[i:i+3])))")

@query(
    "q_winnow_spans",
    f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    hsx AS (
        SELECT doc_id,
               list_transform({_sql_shingles(4)}, g -> {_P_G}) AS hs
        FROM wt
    ),
    fp0 AS (
        SELECT doc_id, hs, CAST(len(hs) AS BIGINT) AS n_grams,
               CASE WHEN len(hs) >= 4 THEN
                   list_distinct(list_transform(
                       generate_series(1, len(hs) - 3), i -> {_W_SEL}))
               ELSE CAST([] AS BIGINT[]) END AS ps
        FROM hsx
    ),
    fe AS (
        SELECT doc_id, hs[p] AS h
        FROM (SELECT doc_id, hs, unnest(ps) AS p FROM fp0)
    ),
    shared AS (SELECT h FROM fe GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    per AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
               CAST(COUNT(*) FILTER (WHERE h IN (SELECT h FROM shared))
                    AS BIGINT) AS shared_fps
        FROM fe GROUP BY 1
    )
    SELECT g.doc_id, g.n_grams,
           CAST(COALESCE(per.n_fps, 0) AS BIGINT) AS n_fps,
           CAST(COALESCE(per.shared_fps, 0) AS BIGINT) AS shared_fps
    FROM fp0 g LEFT JOIN per ON g.doc_id = per.doc_id
    """,
    doc="Winnowing fingerprint census (Schleimer/Wilkerson/Aiken SIGMOD "
    "2003, the MOSS algorithm): min-hash of each sliding w=4 window over "
    "word 4-gram hashes, rightmost on ties — guarantees any shared run of "
    "≥ w+k-1 words surfaces a common fingerprint at expected density "
    "2/(w+1), and positions localize matches to spans (the plagiarism/"
    "attribution primitive the global-min fingerprint lacks). Selection "
    "is pure array expressions in ONE projection (no shuffle, no Python); "
    "the cross-doc census is one groupBy + semi-join "
    "(operators/textstats.py winnow_fingerprints).",
)
def q_winnow_spans(spark, sf_dir):
    from corsearch_project_spark.operators.dedup import word_shingles

    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(word_shingles(F.col("text"), 4)).cast("long").alias("n_grams"),
    )
    fe = d.select(
        "doc_id",
        F.explode(X.winnow_fingerprints(F.col("text"))).alias("fp"),
    ).select("doc_id", F.col("fp.h").alias("h"))
    shared = (
        fe.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h", F.lit(True).alias("sh"))
    )
    per = (
        fe.join(shared, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum(F.when(F.col("sh"), 1).otherwise(0)).cast("long").alias("shared_fps"),
        )
    )
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_fps", F.lit(0)).cast("long").alias("n_fps"),
        F.coalesce("shared_fps", F.lit(0)).cast("long").alias("shared_fps"),
    )


# ------------------------------------------------- snapshot change rate

def _sql_cdc_side(src: str, sfx: str) -> str:
    """One snapshot side for q_change_rate: the shared chunk CTEs plus a
    (url, h, c) multiset count."""
    return f"""{_sql_cdc_chunks_cte(src, sfx)},
    cnt{sfx} AS (
        SELECT url, {SQL_PHASH.format(s="chunk_text")} AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM ch{sfx} GROUP BY 1, 2
    )"""


_SQL_NEW_TEXT = (
    "CASE WHEN doc_id % 3 = 0 THEN 'edited ' || text "
    "WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END"
)


@query(
    "q_change_rate",
    f"""
    WITH old_side AS (
        SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, text FROM documents
    ),
    new_side AS (
        SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
               {_SQL_NEW_TEXT} AS text
        FROM documents
    ),
    {_sql_cdc_side('old_side', '_o')},
    {_sql_cdc_side('new_side', '_n')},
    j AS (
        SELECT COALESCE(o.url, n.url) AS url,
               COALESCE(o.c, 0) AS c_old, COALESCE(n.c, 0) AS c_new
        FROM cnt_o o FULL OUTER JOIN cnt_n n
          ON o.url = n.url AND o.h = n.h
    ),
    per AS (
        SELECT url,
               CAST(SUM(c_old) AS BIGINT) AS n_chunks_old,
               CAST(SUM(c_new) AS BIGINT) AS n_chunks_new,
               CAST(SUM(least(c_old, c_new)) AS BIGINT) AS common_chunks
        FROM j GROUP BY 1
    )
    SELECT url, n_chunks_old, n_chunks_new, common_chunks,
           CAST(1000 - (2000 * common_chunks)
                // (n_chunks_old + n_chunks_new) AS BIGINT)
               AS change_permille
    FROM per
    WHERE n_chunks_old > 0 AND n_chunks_new > 0
    """,
    doc="Graded snapshot change rate (operators/dedup.cdc_change_stats): "
    "CDC-chunk multiset Dice distance per url between two crawl "
    "snapshots — the HOW-MUCH-changed magnitude the binary digest diff "
    "(q_snapshot_diff) cannot give, feeding Cho-Garcia-Molina recrawl "
    "budgeting. Shift-resistant boundaries credit untouched chunks after "
    "an insertion (the 'edited '-prepend arm scores low, the upper() "
    "rewrite arm scores ~1000). Chunking is projection-only; one "
    "(url, h) partial-agg count per side + a url-keyed join + rollup, "
    "all integer math — exact cross-engine.",
)
def q_change_rate(spark, sf_dir):
    from corsearch_project_spark.operators.dedup import cdc_change_stats

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(F.lit("u"), did.cast("string")).alias("url")
    old = d.select(url, F.col("text"))
    new = d.select(
        url,
        F.when(did % 3 == 0, F.concat(F.lit("edited "), F.col("text")))
        .when(did % 5 == 0, F.upper(F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return cdc_change_stats(old, new)


# --------------------------------------------------- host scorecard

def _sql_host_scorecard() -> str:
    """Composition oracle: the four component queries' own oracle strings
    nested verbatim as subqueries — the scorecard cannot drift from its
    inputs because it IS its inputs. PageRank's host set is a superset
    (external sink hosts have rank but no fetched pages), so LEFT JOINs
    from it cover every host; page-less hosts read as is_external."""
    pr = REGISTRY["q_link_pagerank"].oracle
    sp = REGISTRY["q_link_spam"].oracle
    s4 = REGISTRY["q_soft404"].oracle
    tc = REGISTRY["q_template_census"].oracle
    return f"""
    WITH pr AS ({pr}), sp AS ({sp}), s4 AS ({s4}), tc AS ({tc}),
    j AS (
        SELECT pr.host, pr.rank,
               s4.n_pages,
               COALESCE((s4.n_soft404 * 1000) // s4.n_pages, 0) AS soft404_pm,
               COALESCE(sp.self_permille, 0) AS self_pm,
               COALESCE(sp.recip_permille, 0) AS recip_pm,
               COALESCE((tc.top_template_n * 1000) // tc.n_pages, 0)
                   AS template_pm,
               (s4.host IS NULL) AS is_external
        FROM pr
        LEFT JOIN sp ON pr.host = sp.host
        LEFT JOIN s4 ON pr.host = s4.host
        LEFT JOIN tc ON pr.host = tc.host
    )
    SELECT host, rank, CAST(COALESCE(n_pages, 0) AS BIGINT) AS n_pages,
           CAST(soft404_pm AS BIGINT) AS soft404_pm,
           CAST(self_pm AS BIGINT) AS self_pm,
           CAST(recip_pm AS BIGINT) AS recip_pm,
           CAST(template_pm AS BIGINT) AS template_pm,
           CAST(soft404_pm + self_pm + recip_pm + template_pm // 2
                AS BIGINT) AS risk_points,
           is_external
    FROM j
    """


@query(
    "q_host_scorecard",
    _sql_host_scorecard(),
    doc="Multi-signal host reputation scorecard: PageRank authority, "
    "nepotistic-link permilles (C41), soft-404 share (C38), and "
    "template-dominance share (C35) joined on host into one integer "
    "risk_points column — the relation a crawl scheduler or curation "
    "domain-cap consults. Composition by construction: both engines run "
    "the COMPONENT queries' own definitions (the oracle nests their "
    "oracle strings as subqueries; the Spark side joins their registered "
    "DataFrames), so the scorecard cannot drift from its inputs. "
    "PageRank's host set is the superset (external sinks rank but carry "
    "no pages -> is_external); three host-keyed LEFT JOINs, exact "
    "integer permilles.",
)
def q_host_scorecard(spark, sf_dir):
    pr = REGISTRY["q_link_pagerank"].fn(spark, sf_dir)
    sp = REGISTRY["q_link_spam"].fn(spark, sf_dir)
    s4 = REGISTRY["q_soft404"].fn(spark, sf_dir)
    tc = REGISTRY["q_template_census"].fn(spark, sf_dir)
    j = (
        pr.join(sp.select("host", "self_permille", "recip_permille"),
                "host", "left")
        .join(s4.select("host", "n_pages", "n_soft404"), "host", "left")
        .join(tc.select(
            "host", F.col("n_pages").alias("tc_pages"), "top_template_n"
        ), "host", "left")
    )
    soft404_pm = F.coalesce(
        F.expr("(n_soft404 * 1000) div n_pages"), F.lit(0)
    )
    self_pm = F.coalesce(F.col("self_permille"), F.lit(0))
    recip_pm = F.coalesce(F.col("recip_permille"), F.lit(0))
    template_pm = F.coalesce(
        F.expr("(top_template_n * 1000) div tc_pages"), F.lit(0)
    )
    return j.select(
        "host",
        "rank",
        F.coalesce(F.col("n_pages"), F.lit(0)).cast("long").alias("n_pages"),
        soft404_pm.cast("long").alias("soft404_pm"),
        self_pm.cast("long").alias("self_pm"),
        recip_pm.cast("long").alias("recip_pm"),
        template_pm.cast("long").alias("template_pm"),
        (soft404_pm + self_pm + recip_pm
         + F.expr(
             "coalesce((top_template_n * 1000) div tc_pages, 0) div 2"
         ))
        .cast("long")
        .alias("risk_points"),
        F.col("n_pages").isNull().alias("is_external"),
    )
