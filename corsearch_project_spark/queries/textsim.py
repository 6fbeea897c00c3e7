"""Training-data pipeline queries: deduplication, similarity search, and
text analysis over the `documents` / `embeddings` tables — the operators a
100 TB pretraining-data pipeline runs after extraction (SURVEY training-data
mandate). Spark implementations live in ``operators/{dedup,simsearch,
textstats}.py``; the oracle SQL here replays the identical arithmetic in
DuckDB (portable md5-derived hashes, quantized integer vector math).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corsearch_project_spark.operators import dedup as D
from corsearch_project_spark.operators import simsearch as S
from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.queries.base import query, t

# Shared SQL fragments -----------------------------------------------------

SQL_WORDS = "string_split(trim(text), ' ')"
SQL_PHASH = "CAST('0x' || substr(md5({s}), 1, 8) AS BIGINT)"
SQL_QUANT = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))"
)


def _sql_shingles(n: int) -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))
    return (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_transform(generate_series(1, len(w) - {n - 1}), i -> {gram}) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


# ------------------------------------------------------------------- dedup

@query(
    "q_dedup_exact",
    """
    SELECT md5(text) AS text_md5, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on content digest; canonical = min id.",
)
def q_dedup_exact(spark, sf_dir):
    return D.exact_dup_groups(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "q_dedup_jaccard",
    f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    sh0 AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM wt
        )
    ),
    freq AS (SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY 1),
    sh AS (SELECT s.doc_id, s.shingle FROM sh0 s JOIN freq f USING (shingle)
           WHERE f.df <= 50),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    pair_inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
    FROM pair_inter
    JOIN (SELECT doc_id AS doc_a, n_sh AS na FROM sizes) USING (doc_a)
    JOIN (SELECT doc_id AS doc_b, n_sh AS nb FROM sizes) USING (doc_b)
    WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.2
    """,
    doc="Exact word-3-gram Jaccard near-dup pairs with a document-frequency "
    "cap on shingles to bound the self-join.",
)
def q_dedup_jaccard(spark, sf_dir):
    return D.jaccard_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.2
    )


def _sql_minhash_lsh() -> str:
    """Oracle twin of operators.dedup.minhash_sig / lsh_candidate_pairs /
    minhash_lsh_pairs — identical affine-permutation arithmetic."""
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {D.MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(zip(D.PERM_A, D.PERM_B))
    )
    n_bands = D.DEFAULT_PERMS // D.DEFAULT_BAND_ROWS
    band_rows = []
    for bd in range(n_bands):
        cols = " || ',' || ".join(
            f"CAST(mh{bd * D.DEFAULT_BAND_ROWS + j} AS VARCHAR)"
            for j in range(D.DEFAULT_BAND_ROWS)
        )
        band_rows.append(f"SELECT doc_id, {bd} AS band, {cols} AS sig FROM sig")
    bands = " UNION ALL ".join(band_rows)
    matches = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(D.DEFAULT_PERMS)
    )
    return f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM wt
        )
    ),
    hashed AS (SELECT doc_id, {SQL_PHASH.format(s="shingle")} AS h FROM sh),
    sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    banded AS ({bands}),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST({matches} AS DOUBLE) / 12.0 AS est_jaccard
    FROM cands
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    """


@query(
    "q_dedup_minhash_lsh",
    _sql_minhash_lsh(),
    doc="MinHash(12 perms) + LSH banding (4 bands × 3 rows): the linear-cost "
    "near-dup path for 10^12 docs; est similarity = matching-minhash frac.",
)
def q_dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=3, perms=12, band_rows=3
    )


@query(
    "q_dedup_simhash",
    f"""
    WITH w AS (
        SELECT DISTINCT doc_id, word FROM (
            SELECT doc_id, unnest({SQL_WORDS}) AS word FROM documents
        )
    ),
    wh AS (SELECT doc_id, {SQL_PHASH.format(s="word")} AS wh FROM w),
    bits AS (
        SELECT doc_id, b.b AS b,
               CAST(SUM(CASE WHEN (wh >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
        FROM wh CROSS JOIN range(0, 32) b(b) GROUP BY 1, 2
    ),
    sims AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        FROM bits GROUP BY 1
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash(32-bit) near-dup pairs at Hamming ≤ 3; scale path = "
    "pigeonhole chunk banding (operators.dedup.simhash_pairs docstring).",
)
def q_dedup_simhash(spark, sf_dir):
    sims = D.simhash(t(spark, sf_dir, "documents"), "doc_id", "text")
    pairs = D.simhash_pairs(sims, max_hamming=3)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "q_dedup_embed",
    f"""
    WITH qv AS (
        SELECT vec_id, {SQL_QUANT} AS qe FROM embeddings WHERE vec_id < 300
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_inner_product(a.qe, b.qe)
                 / sqrt(list_inner_product(a.qe, a.qe) * list_inner_product(b.qe, b.qe)),
                 6) AS cos_sim
    FROM qv a JOIN qv b ON a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.qe, b.qe)
                / sqrt(list_inner_product(a.qe, a.qe) * list_inner_product(b.qe, b.qe)),
                6) >= 0.35
    """,
    doc="Embedding-cosine near-dup pairs (quantized exact math), the "
    "verification stage after LSH candidate generation at scale.",
)
def q_dedup_embed(spark, sf_dir):
    return S.near_dup_pairs(t(spark, sf_dir, "embeddings"), threshold=0.35, max_id=300)


# -------------------------------------------------------- similarity search

@query(
    "q_sim_topk",
    f"""
    WITH q AS (SELECT {SQL_QUANT} AS q_qe FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, {SQL_QUANT} AS qe FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_inner_product(qe, q_qe)
                 / sqrt(list_inner_product(qe, qe) * list_inner_product(q_qe, q_qe)),
                 6) AS cos_sim
    FROM c CROSS JOIN q
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    doc="Brute-force cosine top-k (the ANN baseline): broadcast query vector "
    "+ HOF dot product + TakeOrderedAndProject.",
)
def q_sim_topk(spark, sf_dir):
    return S.brute_force_topk(t(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


# Shared oracle fragment: sign-random-projection LSH buckets over the
# quantized embeddings — the exact SQL twin of simsearch.with_lsh_bucket
# (same md5-parity sign matrix, same integer projections). The 8-plane
# instance serves the ANN probes; q_dedup_embed_lsh instantiates 48 planes
# (6 bands x 8 bits) to match lsh_near_dup_pairs' banding defaults.
def _sql_lsh_buckets(n_planes: int = 8) -> str:
    return f"""
    qv AS (SELECT vec_id, {SQL_QUANT} AS qe FROM embeddings),
    pos AS (
        SELECT vec_id, qe, unnest(generate_series(0, len(qe) - 1)) AS i FROM qv
    ),
    dims AS (SELECT vec_id, i, qe[i + 1] AS x FROM pos),
    proj AS (
        SELECT d.vec_id, pl.p AS p,
               CAST(SUM(CASE WHEN {SQL_PHASH.format(s="CAST(pl.p AS VARCHAR) || ':' || CAST(d.i AS VARCHAR)")} % 2 = 1
                             THEN 1 ELSE -1 END * d.x) AS BIGINT) AS proj
        FROM dims d CROSS JOIN range(0, {n_planes}) pl(p) GROUP BY 1, 2
    ),
    buckets AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        FROM proj GROUP BY 1
    )"""


_SQL_LSH_BUCKETS = _sql_lsh_buckets(8)


@query(
    "q_sim_lsh_ann",
    f"""
    WITH {_SQL_LSH_BUCKETS},
    qb AS (
        SELECT qv.qe AS q_qe, b.bucket AS q_bucket
        FROM qv JOIN buckets b USING (vec_id) WHERE vec_id = 0
    )
    SELECT v.vec_id,
           round(list_inner_product(v.qe, q_qe)
                 / sqrt(list_inner_product(v.qe, v.qe) * list_inner_product(q_qe, q_qe)),
                 6) AS cos_sim
    FROM qv v JOIN buckets b USING (vec_id) CROSS JOIN qb
    WHERE b.bucket = q_bucket AND v.vec_id <> 0
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
    """,
    doc="LSH-bucketed ANN (8 sign-random-projection planes): search only the "
    "query's bucket — at scale the bucket is the table partition key, so "
    "this is a partition-pruned scan.",
)
def q_sim_lsh_ann(spark, sf_dir):
    return S.lsh_topk(t(spark, sf_dir, "embeddings"), query_vec_id=0, k=5)


@query(
    "q_sim_lsh_multiprobe",
    f"""
    WITH {_SQL_LSH_BUCKETS},
    qb AS (
        SELECT qv.qe AS q_qe, b.bucket AS q_bucket
        FROM qv JOIN buckets b USING (vec_id) WHERE vec_id = 0
    )
    SELECT v.vec_id,
           round(list_inner_product(v.qe, q_qe)
                 / sqrt(list_inner_product(v.qe, v.qe) * list_inner_product(q_qe, q_qe)),
                 6) AS cos_sim
    FROM qv v JOIN buckets b USING (vec_id) CROSS JOIN qb
    WHERE bit_count(xor(b.bucket, q_bucket)) <= 1 AND v.vec_id <> 0
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
    """,
    doc="Multi-probe LSH ANN: probe the query's bucket plus every Hamming-1 "
    "neighbor bucket (one plane-bit flip each) — recovers neighbors that "
    "fell just across one hyperplane. The probe set is still n_planes+1 "
    "bucket ids joined on equality → partition-pruned at scale.",
)
def q_sim_lsh_multiprobe(spark, sf_dir):
    return S.lsh_topk(
        t(spark, sf_dir, "embeddings"), query_vec_id=0, k=5, multiprobe=True
    )


@query(
    "q_dedup_embed_lsh",
    f"""
    WITH {_sql_lsh_buckets(48)},
    banded AS (
        SELECT vec_id, bd.bd AS band,
               (bucket >> (bd.bd * 8)) & 255 AS bv
        FROM buckets CROSS JOIN range(0, 6) bd(bd)
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           round(list_inner_product(sa.qe, sb.qe)
                 / sqrt(list_inner_product(sa.qe, sa.qe) * list_inner_product(sb.qe, sb.qe)),
                 6) AS cos_sim
    FROM cands
    JOIN qv sa ON sa.vec_id = vec_a
    JOIN qv sb ON sb.vec_id = vec_b
    WHERE round(list_inner_product(sa.qe, sb.qe)
                / sqrt(list_inner_product(sa.qe, sa.qe) * list_inner_product(sb.qe, sb.qe)),
                6) >= 0.35
    """,
    doc="Composed embedding dedup, the scale path: banded sign-LSH candidate "
    "generation (6 bands x 8 planes, equi-join on band value) -> exact "
    "quantized-cosine verification of candidates only. The all-pairs "
    "q_dedup_embed is the bounded control arm; this is the plan a 100 TB "
    "curation run calls (operators.simsearch.lsh_near_dup_pairs).",
)
def q_dedup_embed_lsh(spark, sf_dir):
    return S.lsh_near_dup_pairs(t(spark, sf_dir, "embeddings"), threshold=0.35)


# ------------------------------------------------------------ text analysis

@query(
    "q_text_tokens",
    f"""
    SELECT doc_id,
           CAST(len({SQL_WORDS}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(length(text) AS DOUBLE) / CAST(len({SQL_WORDS}) AS DOUBLE)
               AS chars_per_token
    FROM documents
    """,
    doc="Token counting (whitespace tokens) + chars-per-token.",
)
def q_text_tokens(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tok = X.token_count(F.col("text"))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        X.char_count(F.col("text")).alias("n_chars_measured"),
        (X.char_count(F.col("text")).cast("double") / n_tok.cast("double")).alias(
            "chars_per_token"
        ),
    )


@query(
    "q_text_quality",
    f"""
    WITH m AS (
        SELECT doc_id,
               CAST(len({SQL_WORDS}) AS BIGINT) AS n_tok,
               CAST(length(text) AS BIGINT) AS n_chr,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g'))
                    AS BIGINT) AS n_punct,
               CAST(len(list_filter(string_split(trim(lower(text)), ' '),
                    x -> x IN ('the', 'and', 'with', 'for'))) AS BIGINT) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_tok, n_punct, n_stop,
           round(0.5 * least(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
               + 0.3 * least(CAST(n_stop AS DOUBLE) / CAST(greatest(n_tok, 1) AS DOUBLE) * 5.0, 1.0)
               + 0.2 * (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(greatest(n_chr, 1) AS DOUBLE) * 10.0, 1.0)),
               6) AS quality
    FROM m
    """,
    doc="Quality scoring: length / punctuation-density / stopword-ratio "
    "composite (C4/Gopher-style rules), deterministic double math.",
)
def q_text_quality(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    text = F.col("text")
    return d.select(
        "doc_id",
        X.token_count(text).alias("n_tok"),
        X.punct_chars(text).alias("n_punct"),
        X.stopword_hits(text, X.LANG_MARKERS["en"]).alias("n_stop"),
        X.quality_score(text).alias("quality"),
    )


@query(
    "q_readability",
    f"""
    WITH m AS (
        SELECT doc_id,
               CAST(len({SQL_WORDS}) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
                   AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
                   AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / CAST(greatest(n_sentences, 1) AS DOUBLE))
                 - 84.6 * (CAST(n_syllables AS DOUBLE)
                           / CAST(greatest(n_words, 1) AS DOUBLE)),
                 4) AS flesch,
           round(0.39 * (CAST(n_words AS DOUBLE)
                         / CAST(greatest(n_sentences, 1) AS DOUBLE))
                 + 11.8 * (CAST(n_syllables AS DOUBLE)
                           / CAST(greatest(n_words, 1) AS DOUBLE))
                 - 15.59,
                 4) AS fk_grade
    FROM m
    """,
    doc="Readability metrics (Flesch reading-ease + Flesch-Kincaid grade): "
    "sentence runs [.!?]+, vowel-group syllable approximation, fixed-order "
    "double math — pure codegen projection, no shuffle, no Python "
    "(operators/textstats.py:readability).",
)
def q_readability(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    r = X.readability(F.col("text"))
    return d.select(
        "doc_id",
        r["n_words"].alias("n_words"),
        r["n_sentences"].alias("n_sentences"),
        r["n_syllables"].alias("n_syllables"),
        r["flesch"].alias("flesch"),
        r["fk_grade"].alias("fk_grade"),
    )


_LANG_SQL_HITS = {
    lg: (
        "CAST(len(list_filter(string_split(trim(lower(text)), ' '), "
        f"x -> x IN {tuple(m)!r})) AS BIGINT)".replace('"', "'")
    )
    for lg, m in X.LANG_MARKERS.items()
}


@query(
    "q_text_langid",
    f"""
    WITH s AS (
        SELECT doc_id,
               {_LANG_SQL_HITS['en']} AS s_en,
               {_LANG_SQL_HITS['fr']} AS s_fr,
               {_LANG_SQL_HITS['es']} AS s_es,
               {_LANG_SQL_HITS['de']} AS s_de
        FROM documents
    )
    SELECT doc_id, s_en, s_fr, s_es, s_de,
           CASE WHEN s_en = greatest(s_en, s_fr, s_es, s_de) AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'en'
                WHEN s_fr = greatest(s_en, s_fr, s_es, s_de) AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'fr'
                WHEN s_es = greatest(s_en, s_fr, s_es, s_de) AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'es'
                WHEN s_de = greatest(s_en, s_fr, s_es, s_de) AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'de'
                ELSE 'und' END AS pred_lang
    FROM s
    """,
    doc="Language ID by stopword-marker hit counts with fixed-priority "
    "tie-break (n-gram-heuristic langid).",
)
def q_text_langid(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    text = F.col("text")
    scores = X.lang_scores(text)
    return d.select(
        "doc_id",
        scores["en"].alias("s_en"),
        scores["fr"].alias("s_fr"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
        X.lang_id(text).alias("pred_lang"),
    )


@query(
    "q_text_fingerprint",
    f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    g AS (SELECT doc_id, {_sql_shingles(4)} AS grams FROM wt)
    SELECT doc_id,
           list_min(list_transform(grams, s -> {SQL_PHASH.format(s='s')})) AS fp
    FROM g
    """,
    doc="Document fingerprint: min portable hash over word-4-gram shingles "
    "(1-perm MinHash / winnowing primitive).",
)
def q_text_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", X.fingerprint(F.col("text"), 4).alias("fp"))


@query(
    "q_sim_ivf_ann",
    f"""
    WITH qv AS (SELECT vec_id, {SQL_QUANT} AS qe FROM embeddings),
    cents AS (
        SELECT vec_id AS cent_id, qe AS cent_qe FROM qv WHERE vec_id % 25 = 0
    ),
    scored AS (
        SELECT v.vec_id, v.qe, c.cent_id,
               round(list_inner_product(v.qe, c.cent_qe)
                     / sqrt(list_inner_product(v.qe, v.qe)
                            * list_inner_product(c.cent_qe, c.cent_qe)),
                     6) AS cent_sim
        FROM qv v CROSS JOIN cents c
    ),
    cells AS (
        SELECT vec_id, qe, CAST(cent_id AS INTEGER) AS cell
        FROM scored
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY cent_sim DESC, cent_id ASC
        ) = 1
    ),
    q AS (SELECT qe AS q_qe FROM qv WHERE vec_id = 7),
    probe AS (
        SELECT CAST(cent_id AS INTEGER) AS cell
        FROM cents CROSS JOIN q
        ORDER BY round(list_inner_product(cent_qe, q_qe)
                       / sqrt(list_inner_product(cent_qe, cent_qe)
                              * list_inner_product(q_qe, q_qe)), 6) DESC,
                 cent_id ASC
        LIMIT 3
    )
    SELECT v.vec_id,
           round(list_inner_product(v.qe, q_qe)
                 / sqrt(list_inner_product(v.qe, v.qe)
                        * list_inner_product(q_qe, q_qe)), 6) AS cos_sim
    FROM cells v JOIN probe USING (cell) CROSS JOIN q
    WHERE v.vec_id <> 7
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
    """,
    doc="IVF ANN: deterministic coarse quantizer (centroids = vec_id %% 25), "
    "argmax cell assignment via partial max(struct) (no window over the big "
    "side), top-3-cell probe — at scale `cell` is the partition key and a "
    "probe is a partition-pruned scan (operators.simsearch.ivf_topk).",
)
def q_sim_ivf_ann(spark, sf_dir):
    return S.ivf_topk(t(spark, sf_dir, "embeddings"), query_vec_id=7, k=5, nprobe=3)


def _sql_dedup_components() -> str:
    """Recursive-CTE oracle for connected components over the MinHash-LSH
    candidate graph: component = min doc_id in each transitive closure."""
    base = _sql_minhash_lsh()
    # reuse the full pairs query as a CTE body
    return f"""
    WITH RECURSIVE pairs AS ({base}),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(v, u) AS (
        SELECT a AS v, b AS u FROM edges
        UNION
        SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a
    )
    SELECT v AS doc_id,
           CAST(LEAST(v, MIN(u)) AS BIGINT) AS component
    FROM reach GROUP BY v
    """


@query(
    "q_dedup_components",
    _sql_dedup_components(),
    doc="Iterative connected components over the near-dup candidate graph "
    "(canonical-document grouping): min-label propagation with pointer-jump "
    "shortcutting (O(log diameter) rounds), convergence-checked-or-raise, "
    "checkpointed lineage (reliable-dir seam for clusters) — checked "
    "against a DuckDB recursive-CTE transitive closure (an iterative "
    "distributed algorithm with an exact SQL oracle).",
)
def q_dedup_components(spark, sf_dir):
    pairs = D.minhash_lsh_pairs(t(spark, sf_dir, "documents"), "doc_id", "text")
    return D.connected_components(pairs)


# ----------------------------------------------- repetition / url canonical

def _sql_dup_frac(arr: str) -> str:
    return (
        f"CASE WHEN len({arr}) = 0 THEN 0.0 ELSE "
        f"round(1.0 - CAST(len(list_distinct({arr})) AS DOUBLE) "
        f"/ CAST(greatest(len({arr}), 1) AS DOUBLE), 6) END"
    )


@query(
    "q_text_repetition",
    f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    m AS (SELECT doc_id, w, {_sql_shingles(2)} AS bi FROM wt),
    base AS (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tok,
               {_sql_dup_frac('w')} AS dup_word_frac,
               {_sql_dup_frac('bi')} AS dup_bigram_frac
        FROM m
    ),
    tb AS (
        SELECT doc_id, MAX(c) AS top_bigram_n
        FROM (
            SELECT doc_id, gram, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(bi) AS gram FROM m)
            GROUP BY doc_id, gram
        )
        GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tok, b.dup_word_frac, b.dup_bigram_frac,
           CAST(COALESCE(tb.top_bigram_n, 0) AS BIGINT) AS top_bigram_n
    FROM base b LEFT JOIN tb ON b.doc_id = tb.doc_id
    """,
    doc="Gopher/MassiveText repetition filters: duplicate-word and "
    "duplicate-bigram fractions as narrow array_distinct projections (no "
    "shuffle), plus the most-repeated-bigram count via explode -> partial "
    "agg on (doc_id, gram) -> per-doc max -> left join. The explode path "
    "shuffles linear-in-corpus gram rows with map-side combine absorbing "
    "repeats — the 100-TB shape for per-doc mode statistics (an O(n^2) "
    "per-row higher-order-lambda mode would stay narrow but not scale in "
    "doc length).",
)
def q_text_repetition(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = D.words(F.col("text"))
    bi = D.word_shingles(F.col("text"), 2)
    base = d.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tok"),
        X.dup_fraction(w).alias("dup_word_frac"),
        X.dup_fraction(bi).alias("dup_bigram_frac"),
    )
    top = (
        d.select("doc_id", F.explode(bi).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        "dup_word_frac",
        "dup_bigram_frac",
        F.coalesce("top_bigram_n", F.lit(0)).cast("long").alias("top_bigram_n"),
    )


# Deterministic messy-URL synthesis shared by both engines: mixed-case
# scheme/host, explicit default port, tracking param, unsorted params, and a
# fragment. doc_id % k collapses distinct docs onto shared canonical urls so
# the dedup groupBy actually groups.
_SQL_MESSY_URL = (
    "'HTTPS://WWW.' || upper(source) || '.EXample.com:443/p/' || "
    "CAST(doc_id % 10 AS VARCHAR) || '?zz=1&utm_campaign=c' || "
    "CAST(doc_id AS VARCHAR) || '&a=' || CAST(doc_id % 5 AS VARCHAR) || '#frag'"
)


@query(
    "q_url_canonical",
    f"""
    WITH u0 AS (SELECT doc_id, {_SQL_MESSY_URL} AS url FROM documents),
    s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u0),
    s2 AS (
        SELECT doc_id,
               lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+)', 1)) AS sh,
               regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+', '') AS rest
        FROM s1
    ),
    s3 AS (
        SELECT doc_id,
               CASE WHEN sh LIKE 'https://%' THEN regexp_replace(sh, ':443$', '')
                    ELSE regexp_replace(sh, ':80$', '') END AS sh,
               CASE WHEN strpos(rest, '?') > 0
                    THEN substr(rest, 1, strpos(rest, '?') - 1) ELSE rest END AS path,
               CASE WHEN strpos(rest, '?') > 0
                    THEN substr(rest, strpos(rest, '?') + 1) ELSE '' END AS qs
        FROM s2
    ),
    s4 AS (
        SELECT doc_id, sh, path,
               list_sort(list_filter(string_split(qs, '&'),
                   p -> NOT (substr(p, 1, 4) = 'utm_' OR substr(p, 1, 4) = 'ref='
                             OR p = ''))) AS params
        FROM s3
    ),
    c AS (
        SELECT doc_id,
               sh || path || CASE WHEN len(params) > 0
                   THEN '?' || array_to_string(params, '&') ELSE '' END AS canonical_url
        FROM s4
    )
    SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM c GROUP BY 1
    """,
    doc="URL canonicalization + dedup (the pre-content-hash dedup step of "
    "every crawl pipeline): fragment strip, scheme/host lowercase, default "
    "port drop, utm_*/ref= tracking-param strip, and param sort — all pure "
    "JVM regexp/higher-order-array expressions (functions/urlnorm.py), so "
    "the canonical form is a narrow codegen projection and the dedup is "
    "one hash aggregation on it. No Python, no extra shuffle at 10^12 rows.",
)
def q_url_canonical(spark, sf_dir):
    from corsearch_project_spark.functions.urlnorm import canonicalize_url

    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.lit(".EXample.com:443/p/"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("?zz=1&utm_campaign=c"),
        F.col("doc_id").cast("string"),
        F.lit("&a="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("#frag"),
    )
    return (
        d.select(canonicalize_url(url).alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


@query(
    "q_embed_pca",
    """
    WITH q AS (
        SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS e
        FROM embeddings
    ),
    g AS (
        SELECT CAST(ri.i AS INTEGER) AS i, CAST(rj.j AS INTEGER) AS j,
               CAST(SUM(e[CAST(ri.i AS INTEGER) + 1]
                        * e[CAST(rj.j AS INTEGER) + 1]) AS BIGINT) AS value
        FROM q, range(64) ri(i), range(64) rj(j)
        WHERE rj.j >= ri.i
        GROUP BY 1, 2
    ),
    s AS (
        SELECT CAST(r.i AS INTEGER) AS i, CAST(-1 AS INTEGER) AS j,
               CAST(SUM(e[CAST(r.i AS INTEGER) + 1]) AS BIGINT) AS value
        FROM q, range(64) r(i)
        GROUP BY 1, 2
    ),
    c AS (
        SELECT CAST(-1 AS INTEGER) AS i, CAST(-1 AS INTEGER) AS j,
               CAST(COUNT(*) AS BIGINT) AS value
        FROM q
    )
    SELECT i, j, value FROM g
    UNION ALL SELECT i, j, value FROM s
    UNION ALL SELECT i, j, value FROM c
    """,
    doc="Distributed PCA sufficient statistics (operators/pca.py): quantized "
    "Gramian upper triangle + column sums + count in ONE Arrow matmul pass "
    "whose per-batch numpy reduce IS the map-side combine, then a single "
    "~2k-key partial/final BIGINT agg — shuffle volume is #tasks x 2145 "
    "rows at any input size; all-integer math makes the DuckDB twin exact. "
    "The driver-side eigh finish + broadcast projection (pca_components / "
    "pca_project) are pytest-verified (not SQL-expressible).",
)
def q_embed_pca(spark, sf_dir):
    from corsearch_project_spark.operators.pca import embedding_stats

    return embedding_stats(t(spark, sf_dir, "embeddings"))


@query(
    "q_char_entropy",
    """
    WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    cnt AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM ch GROUP BY 1, 2
    ),
    tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_chars
        FROM cnt GROUP BY 1
    ),
    per AS (
        SELECT cnt.doc_id,
               CAST(SUM(c * CAST(round(-ln(CAST(c AS DOUBLE)
                                       / CAST(n AS DOUBLE)) * 1000000.0, 0)
                                 AS BIGINT)) AS BIGINT) AS entropy_micro
        FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
        GROUP BY 1
    )
    SELECT t.doc_id, t.n AS n_chars, t.n_distinct_chars,
           p.entropy_micro,
           round(CAST(p.entropy_micro AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * 1000000.0), 6) AS entropy
    FROM tot t JOIN per p ON t.doc_id = p.doc_id
    """,
    doc="Character-distribution Shannon entropy per doc (the low-entropy "
    "template/base64 alarm): one ln per distinct character quantized to "
    "integer micro-nats immediately (operators/lm.py recipe) so the doc "
    "sum is order-free BIGINT math; two id-keyed shuffles, no Python "
    "(operators/textstats.py:char_entropy_stats).",
)
def q_char_entropy(spark, sf_dir):
    return X.char_entropy_stats(t(spark, sf_dir, "documents"))
