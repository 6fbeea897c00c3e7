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
from corsearch_project_spark.queries.textsim import (
    SQL_PHASH,
    SQL_WORDS,
    _LANG_SQL_HITS,
)


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


_SQL_PII_TEXT = """
        'contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
        || CASE WHEN doc_id % 3 <> 0
                THEN ' call +1 (555) 010-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
        || CASE WHEN doc_id % 2 = 0
                THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                ELSE '' END
        || ' ' || text
"""


@query(
    "q_pii_scrub",
    f"""
    WITH p AS (SELECT doc_id, {_SQL_PII_TEXT} AS pii_text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS INT)
               AS n_emails,
           CAST(len(regexp_extract_all(pii_text,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS INT)
               AS n_ips,
           CAST(len(regexp_extract_all(pii_text,
               '\\+?[0-9][0-9()\\- ]{{6,}}[0-9]')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(pii_text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
               '\\+?[0-9][0-9()\\- ]{{6,}}[0-9]', '<PHONE>', 'g') AS scrubbed
    FROM p
    """,
    doc="PII redaction (emails -> IPv4 -> phone-shaped runs, typed "
    "placeholders) — the pre-training scrub pass every published LLM "
    "pipeline runs. The synthetic corpus is PII-free word soup, so the "
    "query deterministically injects doc_id-derived PII (an email always; "
    "phone/IP on doc_id mod arms) and then redacts it — both engines build "
    "and scrub the SAME text with the SAME RE2∩Java-dialect regexes "
    "(operators/textstats.scrub_pii). Narrow codegen projection, no "
    "shuffle at any scale.",
)
def q_pii_scrub(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com"),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(
                F.lit(" call +1 (555) 010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" "),
        F.col("text"),
    )
    ne, ni, np_ = X.pii_counts(pii_text)
    return d.select(
        "doc_id",
        ne.alias("n_emails"),
        ni.alias("n_ips"),
        np_.alias("n_phones"),
        X.scrub_pii(pii_text).alias("scrubbed"),
    )


@query(
    "q_decontaminate",
    f"""
    WITH ev AS (
        SELECT DISTINCT unnest({{shingles}}) AS shingle
        FROM documents WHERE doc_id % 50 = 0
    ),
    cand AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
    cs AS (
        SELECT DISTINCT doc_id, unnest({{shingles}}) AS shingle FROM cand
    ),
    hits AS (
        SELECT cs.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM cs JOIN ev USING (shingle) GROUP BY cs.doc_id
    )
    SELECT c.doc_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM cand c LEFT JOIN hits h USING (doc_id)
    """.format(shingles="list_transform(generate_series(1, len("
               f"{SQL_WORDS}) - 2), i -> {SQL_WORDS}[i] || ' ' || "
               f"{SQL_WORDS}[i + 1] || ' ' || {SQL_WORDS}[i + 2])"),
    doc="Benchmark decontamination (GPT-3 appendix-C style): flag any "
    "training document sharing a word n-gram with the held-out eval set "
    "(here: doc_id % 50 == 0 as the deterministic eval slice; n=3 to "
    "match this corpus's ~30-word vocabulary — production uses 8-13). "
    "Eval shingles are tiny relative to the corpus, so they BROADCAST "
    "to every executor: per-doc distinct-shingle explode, broadcast "
    "semi-style join, partial-agg count — no all-pairs, linear at "
    "10^12 docs (operators/dedup.word_shingles).",
)
def q_decontaminate(spark, sf_dir):
    from corsearch_project_spark.operators.dedup import word_shingles

    d = t(spark, sf_dir, "documents")
    sh = word_shingles(F.col("text"), 3)
    ev = (
        d.where(F.col("doc_id") % 50 == 0)
        .select(F.explode(sh).alias("shingle"))
        .distinct()
    )
    cand = d.where(F.col("doc_id") % 50 != 0)
    cs = cand.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )
    hits = (
        cs.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    return cand.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("h"), F.lit(0).cast("long")).alias("n_hits"),
        (F.coalesce(F.col("h"), F.lit(0).cast("long")) > 0).alias("contaminated"),
    )


# -------------------------------------------- link graph / canonical docs

_SQL_HOST = "lower(regexp_extract({u}, '^https?://([^/?#]+)', 1))"

_SQL_ANCHOR = (
    "'<a href=\"https://h' || CAST((doc_id * 7 + {k}) % 37 AS VARCHAR)"
    " || '.example.com/x/' || CAST(doc_id + {k} AS VARCHAR) || '\">t{k}</a>'"
)

# External sink anchor (hosts that never host a page themselves -> pure
# sinks -> the dangling branch of PageRank is exercised).
_SQL_SINK = (
    "'<a href=\"https://sink' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.external.net/s\">e</a>'"
)


def _sql_page(external: bool = False) -> str:
    # every 11th page declares a <base href> on a CDN host: its relative
    # /about anchor must resolve there, not to the page's own host (the
    # mirror/CDN-hosted-page shape host_edges honors)
    ext = f" || {_SQL_SINK}" if external else ""
    return f"""
        SELECT doc_id,
               'https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               '<html>'
                   || CASE WHEN doc_id % 11 = 0
                           THEN '<base href="https://cdn'
                                || CAST(doc_id % 3 AS VARCHAR)
                                || '.static-park.net/">' ELSE '' END
                   || '<body><a href="/about">About</a>'
                   || {_SQL_ANCHOR.format(k=1)}
                   || {_SQL_ANCHOR.format(k=2)}
                   || CASE WHEN doc_id % 5 <> 0
                           THEN {_SQL_ANCHOR.format(k=3)} ELSE '' END{ext}
                   || '</body></html>' AS html
        FROM documents
"""


_SQL_PAGE = _sql_page()


def _sql_edges(page_sql: str) -> str:
    """The shared pages -> host-edge-relation CTE chain (lk, e0, edges)."""
    base_expr = _SQL_HOST.format(
        u="regexp_extract(html, '(?i)<base\\s[^>]*href=\"([^\"]*)\"', 1)"
    )
    return f"""p AS ({page_sql}),
    lk AS (
        SELECT {_SQL_HOST.format(u='url')} AS src_host,
               {base_expr} AS base_host,
               unnest(regexp_extract_all(
                   html, '(?i)<a\\s[^>]*href="([^"]*)"', 1)) AS href
        FROM p
    ),
    e0 AS (
        SELECT src_host,
               CASE WHEN {_SQL_HOST.format(u='href')} = ''
                    THEN (CASE WHEN base_host <> '' THEN base_host
                               ELSE src_host END)
                    ELSE {_SQL_HOST.format(u='href')} END AS dst_host
        FROM lk
    ),
    edges AS (
        SELECT src_host, dst_host, COUNT(*) AS n_links FROM e0 GROUP BY 1, 2
    )"""


def _pages_df(spark, sf_dir, external: bool = False):
    """The Spark twin of ``_sql_page``: deterministic anchor corpus."""
    did = F.col("doc_id")

    def anchor(k: int):
        return F.concat(
            F.lit('<a href="https://h'),
            ((did * 7 + k) % 37).cast("string"),
            F.lit(".example.com/x/"),
            (did + k).cast("string"),
            F.lit(f'">t{k}</a>'),
        )

    body = [
        F.lit("<html>"),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit('<base href="https://cdn'),
                (did % 3).cast("string"),
                F.lit('.static-park.net/">'),
            ),
        ).otherwise(F.lit("")),
        F.lit('<body><a href="/about">About</a>'),
        anchor(1),
        anchor(2),
        F.when(did % 5 != 0, anchor(3)).otherwise(F.lit("")),
    ]
    if external:
        body.append(
            F.concat(
                F.lit('<a href="https://sink'),
                (did % 7).cast("string"),
                F.lit('.external.net/s">e</a>'),
            )
        )
    body.append(F.lit("</body></html>"))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (did % 37).cast("string"),
            F.lit(".example.com/p/"),
            did.cast("string"),
        ).alias("url"),
        F.concat(*body).alias("html"),
    )


@query(
    "q_link_hostgraph",
    f"""
    WITH {_sql_edges(_SQL_PAGE)},
    o AS (
        SELECT src_host AS host, COUNT(*) AS out_hosts,
               SUM(n_links) AS n_out_links
        FROM edges GROUP BY 1
    ),
    i AS (
        SELECT dst_host AS host, COUNT(*) AS in_hosts,
               SUM(n_links) AS n_in_links
        FROM edges GROUP BY 1
    )
    SELECT COALESCE(o.host, i.host) AS host,
           CAST(COALESCE(out_hosts, 0) AS BIGINT) AS out_hosts,
           CAST(COALESCE(in_hosts, 0) AS BIGINT) AS in_hosts,
           CAST(COALESCE(n_out_links, 0) AS BIGINT) AS n_out_links,
           CAST(COALESCE(n_in_links, 0) AS BIGINT) AS n_in_links
    FROM o FULL OUTER JOIN i ON o.host = i.host
    """,
    doc="Host-level link graph from raw page HTML (C4/RefinedWeb host "
    "quality priors): combined-regex anchor extraction (pure codegen, no "
    "DOM pass), relative hrefs resolve to the page's own host, explode -> "
    "partial-agg on (src_host, dst_host) so map-side combine absorbs "
    "repeated nav-bar targets, then two direction aggs full-outer-joined "
    "into per-host degree/volume rows. The edge relation is persisted "
    "before the degree pass — at 100 TB it is a written table, and without "
    "materialization the full-outer join's two branches each re-derive it "
    "(two extra scans). Pages synthesized deterministically from doc_id in "
    "BOTH engines (same formula in the oracle) (operators/linkgraph.py).",
)
def q_link_hostgraph(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    edges = L.host_edges(_pages_df(spark, sf_dir)).persist()
    return L.host_degrees(edges)


_PR_ITERS = 4
_PR_SCALE = 10**9
_PR_DAMP = 85


def _sql_pagerank() -> str:
    """The PageRank recurrence unrolled to exactly _PR_ITERS rounds —
    integer arithmetic throughout, so the oracle is bit-exact (see
    operators/linkgraph.pagerank)."""
    teleport = ((100 - _PR_DAMP) * _PR_SCALE) // 100
    ctes = [
        _sql_edges(_sql_page(external=True)),
        """hosts AS (
        SELECT src_host AS host FROM edges
        UNION SELECT dst_host AS host FROM edges
    )""",
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts FROM hosts)",
        """ot AS (
        SELECT src_host, CAST(SUM(n_links) AS BIGINT) AS out_total
        FROM edges GROUP BY 1
    )""",
        f"r0 AS (SELECT host, CAST({_PR_SCALE} AS BIGINT) AS rank FROM hosts)",
    ]
    for i in range(1, _PR_ITERS + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""c{i} AS (
        SELECT e.dst_host AS host,
               SUM((r.rank * e.n_links) // o.out_total) AS in_sum
        FROM edges e
        JOIN {prev} r ON e.src_host = r.host
        JOIN ot o ON o.src_host = e.src_host
        GROUP BY 1
    )"""
        )
        ctes.append(
            f"""d{i} AS (
        SELECT COALESCE(SUM(r.rank), 0) // (SELECT n_hosts FROM n) AS share
        FROM {prev} r LEFT JOIN ot o ON r.host = o.src_host
        WHERE o.src_host IS NULL
    )"""
        )
        ctes.append(
            f"""r{i} AS (
        SELECT h.host,
               CAST({teleport} + ({_PR_DAMP} * (COALESCE(c.in_sum, 0)
                    + (SELECT share FROM d{i}))) // 100 AS BIGINT) AS rank
        FROM hosts h LEFT JOIN c{i} c ON h.host = c.host
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT host, rank FROM r{_PR_ITERS}
    """


@query(
    "q_link_pagerank",
    _sql_pagerank(),
    doc="Host PageRank over the link graph — the curation quality prior "
    "(C4/RefinedWeb-style host weighting, spam-host isolation). "
    "Deterministic INTEGER power iteration (scaled ranks, per-edge floor "
    "division, integer damping) so BIGINT-sum associativity makes Spark's "
    "partial/final aggregation bit-identical to the sequential oracle; "
    "the oracle is the same recurrence unrolled to 4 rounds. The corpus "
    "adds external sink hosts (pages link out to hosts that host no "
    "pages), exercising the dangling-mass redistribution branch in both "
    "engines. Each round: one equi-join on the pre-aggregated edge "
    "relation + one partial-agg groupBy + a broadcast 1-row dangling "
    "aggregate; rank state localCheckpoint'd per round "
    "(operators/linkgraph.py pagerank).",
)
def q_link_pagerank(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    edges = L.host_edges(_pages_df(spark, sf_dir, external=True))
    return L.pagerank(
        edges, iterations=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE
    )


_SQL_QUALITY_EXPR = """
        round(0.5 * least(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
            + 0.3 * least(CAST(n_stop AS DOUBLE)
                          / CAST(greatest(n_tok, 1) AS DOUBLE) * 5.0, 1.0)
            + 0.2 * (1.0 - least(CAST(n_punct AS DOUBLE)
                                 / CAST(greatest(n_chr, 1) AS DOUBLE) * 10.0,
                                 1.0)),
            6)
"""


def _sql_dedup_canonical() -> str:
    """Recursive-CTE components (same construction as q_dedup_components)
    + quality scoring (same arithmetic as q_text_quality) + per-component
    argmax window — the oracle for the keep/drop decision."""
    from corsearch_project_spark.queries.textsim import _sql_minhash_lsh

    return f"""
    WITH RECURSIVE pairs AS ({_sql_minhash_lsh()}),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(v, u) AS (
        SELECT a AS v, b AS u FROM edges
        UNION
        SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a
    ),
    comp AS (
        SELECT v AS doc_id, CAST(LEAST(v, MIN(u)) AS BIGINT) AS component
        FROM reach GROUP BY v
    ),
    m AS (
        SELECT doc_id,
               CAST(len({SQL_WORDS}) AS BIGINT) AS n_tok,
               CAST(length(text) AS BIGINT) AS n_chr,
               CAST(length(text) - length(regexp_replace(text,
                    '[.,;:!?''"()-]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(len(list_filter(string_split(trim(lower(text)), ' '),
                    x -> x IN ('the', 'and', 'with', 'for'))) AS BIGINT)
                   AS n_stop
        FROM documents
    ),
    q AS (SELECT doc_id, {_SQL_QUALITY_EXPR} AS quality FROM m),
    j AS (
        SELECT q.doc_id,
               CAST(COALESCE(c.component, q.doc_id) AS BIGINT) AS component,
               q.quality
        FROM q LEFT JOIN comp c ON q.doc_id = c.doc_id
    )
    SELECT doc_id, component, quality,
           (ROW_NUMBER() OVER (PARTITION BY component
                               ORDER BY quality DESC, doc_id ASC) = 1) AS keep
    FROM j
    """


@query(
    "q_dedup_canonical",
    _sql_dedup_canonical(),
    doc="Canonical-representative selection — the dedup pipeline's actual "
    "keep/drop materialization: MinHash-LSH candidate pairs -> pointer-jump "
    "connected components -> left join back onto ALL docs (singletons are "
    "their own component) -> per-component argmax by quality score "
    "(row_number window, doc_id tiebreak). One extra shuffle on component "
    "beyond the components job itself; the window partitions by component "
    "so state is bounded by cluster size, not corpus size. Checked against "
    "a recursive-CTE + window oracle.",
)
def q_dedup_canonical(spark, sf_dir):
    from pyspark.sql import Window

    from corsearch_project_spark.operators import dedup as D

    d = t(spark, sf_dir, "documents")
    comp = D.connected_components(D.minhash_lsh_pairs(d, "doc_id", "text"))
    scored = d.select("doc_id", X.quality_score(F.col("text")).alias("quality"))
    j = scored.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).cast("long").alias("component"),
        "quality",
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return j.select(
        "doc_id", "component", "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# -------------------------------------------- model-based quality filter


def _sql_quality_classifier() -> str:
    from corsearch_project_spark.queries.textsim import (
        SQL_PHASH,
        SQL_WORDS,
        _sql_shingles,
    )

    wt = SQL_PHASH.format(s="x")
    return f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    f AS (
        SELECT doc_id, list_concat(w, {_sql_shingles(2)}) AS feats FROM wt
    ),
    s AS (
        SELECT doc_id,
               CAST(len(feats) AS BIGINT) AS n_feats,
               CAST(COALESCE(list_sum(list_transform(
                   feats, x -> ({wt} % 2001) - 1000)), 0) AS BIGINT)
                   AS score_raw
        FROM f
    )
    SELECT doc_id, n_feats, score_raw,
           round(CAST(score_raw AS DOUBLE)
                 / (CAST(greatest(n_feats, 1) AS DOUBLE) * 1000.0), 6)
               AS score,
           (score_raw > 0) AS keep
    FROM s
    """


@query(
    "q_quality_classifier",
    _sql_quality_classifier(),
    doc="Model-based quality filter — fastText-style linear classifier "
    "over hashed unigram+bigram features (the CCNet/GPT-3/LLaMA wiki-vs-"
    "crawl scoring stage). The hashing trick makes scoring vocabulary-free: "
    "each doc folds integer feature weights (pure function of the portable "
    "hash) with F.aggregate inside ONE narrow projection — no explode, no "
    "shuffle, no Python, plan-gated. Integer weights keep the score an "
    "exact BIGINT sum, so the oracle (same hash, same arithmetic) is "
    "bit-identical; a trained model drops in as a broadcast bucket array "
    "without changing the plan (operators/classifier.py).",
)
def q_quality_classifier(spark, sf_dir):
    from corsearch_project_spark.operators.classifier import classify

    return classify(t(spark, sf_dir, "documents"))


# -------------------------------------------- exact-substring dedup


def _sql_dedup_substring(window: int = 8) -> str:
    from corsearch_project_spark.queries.textsim import (
        SQL_PHASH,
        SQL_WORDS,
        _sql_shingles,
    )

    return f"""
    WITH wt AS (SELECT doc_id, {SQL_WORDS} AS w FROM documents),
    base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM wt),
    shingled AS (SELECT doc_id, {_sql_shingles(window)} AS sh FROM wt),
    g0 AS (
        SELECT doc_id, sh,
               unnest(generate_series(1, len(sh))) AS idx
        FROM shingled
    ),
    grams AS (
        SELECT doc_id, idx - 1 AS pos,
               {SQL_PHASH.format(s="sh[idx]")} AS g
        FROM g0
    ),
    shared AS (
        SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    matched AS (
        SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM shared)
    ),
    cov AS (
        SELECT doc_id,
               greatest(0, (pos + {window})
                   - greatest(pos, COALESCE(max(pos + {window}) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), pos))) AS c
        FROM matched
    ),
    per_doc AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup_tokens
        FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
                 / CAST(greatest(b.n_tokens, 1) AS DOUBLE), 6) AS dup_fraction
    FROM base b LEFT JOIN per_doc p ON b.doc_id = p.doc_id
    """


@query(
    "q_dedup_substring",
    _sql_dedup_substring(),
    doc="Exact-substring duplication stats (Lee et al. 2022 suffix-array "
    "dedup, re-expressed distributed): a token span is duplicated if its "
    "8-word shingle appears in >=2 DISTINCT documents; dup_tokens is the "
    "interval-UNION of matched [pos, pos+8) windows per doc (running-max "
    "window, overlaps not double-counted). Three linear shuffles "
    "(gram-hash partial agg, semi-join back, per-doc window) — no "
    "self-join, no all-pairs; viral boilerplate shingles are the AQE "
    "skew case. Within-doc repetition deliberately excluded "
    "(q_text_repetition covers it) (operators/dedup.py "
    "substring_dup_stats).",
)
def q_dedup_substring(spark, sf_dir):
    from corsearch_project_spark.operators.dedup import substring_dup_stats

    return substring_dup_stats(t(spark, sf_dir, "documents"))


# -------------------------------------------- sitemap crawl frontier

_SQL_SITEMAP = """
        SELECT doc_id,
               '<?xml version="1.0"?><urlset>'
                   || '<loc>https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) || '</loc>'
                   || '<loc> https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/new/' || CAST(doc_id AS VARCHAR)
                   || ' </loc>'
                   || CASE WHEN doc_id % 4 = 0
                           THEN '<loc>https://h'
                                || CAST((doc_id + 1) % 37 AS VARCHAR)
                                || '.example.com/p/'
                                || CAST(doc_id + 1 AS VARCHAR) || '</loc>'
                           ELSE '' END
                   || '</urlset>' AS xml
        FROM documents
"""


@query(
    "q_crawl_frontier",
    f"""
    WITH sm AS ({_SQL_SITEMAP}),
    p AS ({_SQL_PAGE}),
    locs AS (
        SELECT DISTINCT trim(loc) AS url FROM (
            SELECT unnest(regexp_extract_all(xml,
                '<loc>\\s*([^<\\s][^<]*?)\\s*</loc>', 1)) AS loc
            FROM sm
        )
    ),
    tagged AS (
        SELECT {_SQL_HOST.format(u='l.url')} AS host,
               CASE WHEN c.url IS NULL THEN 1 ELSE 0 END AS is_new
        FROM locs l LEFT JOIN (SELECT DISTINCT url FROM p) c
            ON l.url = c.url
    )
    SELECT host,
           CAST(SUM(1 - is_new) AS BIGINT) AS n_known,
           CAST(SUM(is_new) AS BIGINT) AS n_new
    FROM tagged GROUP BY host
    """,
    doc="Sitemap-driven crawl-frontier discovery: extract <loc> URLs "
    "(pure-codegen regex — sitemaps are flat XML), dedupe, LEFT-ANTI join "
    "against the crawled url set for never-fetched URLs, per-host "
    "known/new counts. The anti-join shuffles on url (the crawled side is "
    "the 10^12-row table — same resume-anti-join shape as P5); known "
    "pages and every-4th cross-references land on the known side, the "
    "/new/ paths on the frontier side, so both branches carry rows "
    "(operators/linkgraph.py crawl_frontier).",
)
def q_crawl_frontier(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    crawled = _pages_df(spark, sf_dir).select("url")
    return L.crawl_frontier(_sitemaps_df(spark, sf_dir), crawled)


def _sitemaps_df(spark, sf_dir):
    """Spark twin of _SQL_SITEMAP."""
    did = F.col("doc_id")
    own = F.concat(
        F.lit("<loc>https://h"), (did % 37).cast("string"),
        F.lit(".example.com/p/"), did.cast("string"), F.lit("</loc>"),
    )
    new = F.concat(
        F.lit("<loc> https://h"), (did % 37).cast("string"),
        F.lit(".example.com/new/"), did.cast("string"), F.lit(" </loc>"),
    )
    xref = F.when(
        did % 4 == 0,
        F.concat(
            F.lit("<loc>https://h"), ((did + 1) % 37).cast("string"),
            F.lit(".example.com/p/"), (did + 1).cast("string"),
            F.lit("</loc>"),
        ),
    ).otherwise(F.lit(""))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'), own, new, xref,
            F.lit("</urlset>"),
        ).alias("xml"),
    )


# -------------------------------------------------- robots.txt politeness

_SQL_ROBOTS = """
        SELECT 'h' || CAST(hid AS VARCHAR) || '.example.com' AS host,
               'User-agent: googlebot' || chr(10) || 'Disallow: /' || chr(10)
               || CASE WHEN hid % 5 = 0 THEN ''
                  ELSE 'User-agent: *' || chr(10)
                       || 'Disallow: /p/1' || chr(10)
                       || 'Allow: /p/1' || CAST(hid % 10 AS VARCHAR) || chr(10)
                       || 'Disallow: ' || chr(10)
                       || CASE WHEN hid % 3 = 0
                               THEN 'Disallow: /p/2' || chr(10) ELSE '' END
                       || CASE WHEN hid % 4 = 1
                               THEN 'Allow: /p/3' || chr(10)
                                    || 'Disallow: /p/3' || chr(10)
                               ELSE '' END
                  END AS robots
        FROM (SELECT DISTINCT doc_id % 37 AS hid FROM documents)
"""


@query(
    "q_robots_politeness",
    f"""
    WITH rb AS ({_SQL_ROBOTS}),
    g AS (
        SELECT host,
               CASE WHEN strpos(robots, 'User-agent: *') = 0 THEN ''
                    ELSE substr(robots, strpos(robots, 'User-agent: *') + 13)
               END AS seg0
        FROM rb
    ),
    sg AS (
        SELECT host,
               CASE WHEN strpos(seg0, 'User-agent:') > 0
                    THEN substr(seg0, 1, strpos(seg0, 'User-agent:') - 1)
                    ELSE seg0 END AS seg
        FROM g
    ),
    rules AS (
        SELECT host, path, allow FROM (
            SELECT host,
                   unnest(regexp_extract_all(seg, 'Disallow: ([^\n]*)', 1))
                       AS path,
                   FALSE AS allow
            FROM sg
            UNION ALL
            SELECT host,
                   unnest(regexp_extract_all(seg, 'Allow: ([^\n]*)', 1))
                       AS path,
                   TRUE AS allow
            FROM sg
        ) WHERE path <> ''
    ),
    u AS (
        SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS host,
               'https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               '/p/' || CAST(doc_id AS VARCHAR) AS path
        FROM documents
    ),
    m AS (
        SELECT u.url, r.path AS rule_path, r.allow,
               ROW_NUMBER() OVER (
                   PARTITION BY u.url
                   ORDER BY length(r.path) DESC, r.allow DESC, r.path
               ) AS rn
        FROM u JOIN rules r
            ON u.host = r.host AND starts_with(u.path, r.path)
    )
    SELECT u.url, u.host,
           COALESCE(m.allow, TRUE) AS allowed,
           COALESCE(m.rule_path, '') AS rule_path
    FROM u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON u.url = m.url
    """,
    doc="robots.txt politeness filter (RFC 9309 prefix subset): parse the "
    "wildcard-group Disallow/Allow rules per host (pure-codegen segment "
    "slice + regex pull — the googlebot group must never leak), LEFT "
    "equi-join the url relation on host, decide longest-match with "
    "allow-wins-ties via one F.aggregate fold over the per-host rule "
    "array. Hosts hid%5=0 carry no wildcard group (all-allowed branch), "
    "empty Disallow values are dropped per the RFC, hid%4=1 hosts carry "
    "an exact-length Allow/Disallow tie. Zero Python stages; the only "
    "shuffle is the host equi-join (operators/linkgraph.py "
    "crawl_permissions).",
)
def q_robots_politeness(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    hid = F.col("hid")
    nl = F.lit("\n")
    wildcard_group = F.concat(
        F.lit("User-agent: *"), nl,
        F.lit("Disallow: /p/1"), nl,
        F.lit("Allow: /p/1"), (hid % 10).cast("string"), nl,
        F.lit("Disallow: "), nl,
        F.when(hid % 3 == 0, F.concat(F.lit("Disallow: /p/2"), nl))
        .otherwise(F.lit("")),
        F.when(
            hid % 4 == 1,
            F.concat(F.lit("Allow: /p/3"), nl, F.lit("Disallow: /p/3"), nl),
        ).otherwise(F.lit("")),
    )
    robots = (
        t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 37).alias("hid"))
        .distinct()
        .select(
            F.concat(
                F.lit("h"), hid.cast("string"), F.lit(".example.com")
            ).alias("host"),
            F.concat(
                F.lit("User-agent: googlebot"), nl, F.lit("Disallow: /"), nl,
                F.when(hid % 5 == 0, F.lit("")).otherwise(wildcard_group),
            ).alias("robots"),
        )
    )
    urls = _pages_df(spark, sf_dir).select("url")
    return L.crawl_permissions(urls, robots)


# ------------------------------------------------- page metadata / canonical

_SQL_META_PAGE = """
        SELECT doc_id,
               'https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               '<html lang="'
                   || CASE WHEN doc_id % 2 = 0 THEN 'EN' ELSE 'de' END
                   || '"><head><title> Doc  ' || CAST(doc_id AS VARCHAR)
                   || ' &amp; &lt;Co&gt; </title>'
                   || CASE WHEN doc_id % 3 <> 0
                           THEN '<meta name="description" content="d &quot;'
                                || CAST(doc_id AS VARCHAR) || '&quot;">'
                           ELSE '' END
                   || CASE WHEN doc_id % 2 = 0
                           THEN '<meta property="og:title" content="OG '
                                || CAST(doc_id AS VARCHAR) || '">'
                           ELSE '' END
                   || CASE WHEN doc_id % 5 <> 0
                           THEN '<link rel="canonical" href="https://h'
                                || CAST((doc_id - doc_id % 4) % 37 AS VARCHAR)
                                || '.example.com/p/'
                                || CAST(doc_id - doc_id % 4 AS VARCHAR)
                                || '">'
                           ELSE '' END
                   || '</head><body>b</body></html>' AS html
        FROM documents
"""

_SQL_UNESC = (
    "replace(replace(replace(replace(replace({x}, '&lt;', '<'), "
    "'&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), '&amp;', '&')"
)


def _sql_meta_cols() -> str:
    title_raw = (
        "trim(regexp_replace(regexp_extract(html, "
        "'(?s)<title[^>]*>\\s*(.*?)\\s*</title>', 1), '\\s+', ' ', 'g'))"
    )
    desc_raw = (
        "regexp_extract(html, "
        "'<meta name=\"description\" content=\"([^\"]*)\"', 1)"
    )
    og_raw = (
        "regexp_extract(html, "
        "'<meta property=\"og:title\" content=\"([^\"]*)\"', 1)"
    )
    canon = (
        "regexp_extract(html, '<link rel=\"canonical\" href=\"([^\"]*)\"', 1)"
    )
    return f"""
        SELECT url,
               {_SQL_UNESC.format(x=title_raw)} AS title,
               {_SQL_UNESC.format(x=desc_raw)} AS description,
               CASE WHEN {canon} = '' THEN url ELSE {canon} END AS canonical,
               {_SQL_UNESC.format(x=og_raw)} AS og_title,
               lower(regexp_extract(html, '<html[^>]*\\slang=\"([^\"]*)\"', 1))
                   AS lang
        FROM mp
"""


def _meta_pages_df(spark, sf_dir):
    """Spark twin of _SQL_META_PAGE."""
    did = F.col("doc_id")
    base = did - (did % 4)
    html = F.concat(
        F.lit('<html lang="'),
        F.when(did % 2 == 0, F.lit("EN")).otherwise(F.lit("de")),
        F.lit('"><head><title> Doc  '), did.cast("string"),
        F.lit(" &amp; &lt;Co&gt; </title>"),
        F.when(
            did % 3 != 0,
            F.concat(
                F.lit('<meta name="description" content="d &quot;'),
                did.cast("string"), F.lit('&quot;">'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<meta property="og:title" content="OG '),
                did.cast("string"), F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 != 0,
            F.concat(
                F.lit('<link rel="canonical" href="https://h'),
                (base % 37).cast("string"), F.lit(".example.com/p/"),
                base.cast("string"), F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body>b</body></html>"),
    )
    return t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://h"), (did % 37).cast("string"),
            F.lit(".example.com/p/"), did.cast("string"),
        ).alias("url"),
        html.alias("html"),
    )


@query(
    "q_page_metadata",
    f"""
    WITH mp AS ({_SQL_META_PAGE})
    {_sql_meta_cols()}
    """,
    doc="HTML head-metadata extraction (trafilatura-style head fields, "
    "pure codegen): title (entity-unescaped incl. the &amp;/&lt;/&gt; "
    "chain with &amp; resolved last, whitespace-normalized), meta "
    "description (absent on doc_id%3=0 — empty branch exercised), "
    "rel=canonical with own-url fallback (doc_id%5=0 declares none), "
    "og:title, and declared <html lang> lowercased. All six columns are "
    "one narrow projection fused into the scan — no shuffle, no Python "
    "(operators/pagemeta.py page_metadata).",
)
def q_page_metadata(spark, sf_dir):
    from corsearch_project_spark.operators import pagemeta as M

    return M.page_metadata(_meta_pages_df(spark, sf_dir))


@query(
    "q_canonical_groups",
    f"""
    WITH mp AS ({_SQL_META_PAGE}),
    meta AS ({_sql_meta_cols()})
    SELECT canonical,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
           CAST(SUM(CASE WHEN url = canonical THEN 1 ELSE 0 END) AS BIGINT)
               AS n_self
    FROM meta GROUP BY canonical
    """,
    doc="rel=canonical URL consolidation: group crawled urls by declared "
    "canonical target (own url when undeclared); n_variants counts "
    "distinct urls collapsing onto each target, n_self whether the "
    "target itself was fetched (0 -> frontier candidate). Groups of ~4 "
    "urls per base target plus self-groups from the no-declaration arm; "
    "one partial-agg shuffle on the canonical key "
    "(operators/pagemeta.py canonical_groups).",
)
def q_canonical_groups(spark, sf_dir):
    from corsearch_project_spark.operators import pagemeta as M

    return M.canonical_groups(_meta_pages_df(spark, sf_dir))


# --------------------------------------------- inverted-index search

_SEARCH_TERMS = ["merge", "window", "scan"]


@query(
    "q_search_conjunctive",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
        FROM documents
    ),
    post AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok WHERE term <> ''
          AND term IN ('merge', 'window', 'scan')
        GROUP BY 1, 2
    ),
    stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT p.doc_id,
               COUNT(*) AS n_terms,
               CAST(SUM(p.tf * (n.n_docs - s.df)) AS BIGINT) AS score
        FROM post p
        JOIN stats s ON p.term = s.term
        CROSS JOIN n
        GROUP BY p.doc_id
        HAVING COUNT(*) = 3
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    doc="Conjunctive ranked search over the corpus's own inverted index: "
    "posting relation (term, doc_id, tf) built in one explode+partial-agg "
    "shuffle, filtered to the query terms FIRST (the bucket-prune step of "
    "a persisted term-bucketed index), per-term document frequencies "
    "broadcast back, AND-semantics as HAVING count=|terms|, and an "
    "exact-integer rarity score sum(tf*(n_docs-df)) — bit-deterministic "
    "across engines, unlike float tf-idf — with top-k via "
    "TakeOrderedAndProject and doc_id tiebreak "
    "(operators/search.py search_conjunctive).",
)
def q_search_conjunctive(spark, sf_dir):
    from corsearch_project_spark.operators.search import search_conjunctive

    return search_conjunctive(
        t(spark, sf_dir, "documents"), _SEARCH_TERMS, k=10
    )


# ------------------------------------------------- crawl fetch scheduling

_SQL_ROBOTS_DELAY = """
        SELECT 'h' || CAST(hid AS VARCHAR) || '.example.com' AS host,
               'User-agent: googlebot' || chr(10) || 'Crawl-delay: 99'
               || chr(10) || 'Disallow: /' || chr(10)
               || CASE WHEN hid % 5 = 0 THEN ''
                  ELSE 'User-agent: *' || chr(10)
                       || CASE WHEN hid % 2 = 0
                               THEN 'Crawl-delay: '
                                    || CAST(1 + hid % 7 AS VARCHAR) || chr(10)
                               ELSE '' END
                       || 'Disallow: /p/1' || chr(10)
                  END AS robots
        FROM (SELECT DISTINCT doc_id % 37 AS hid FROM documents)
"""


@query(
    "q_fetch_plan",
    f"""
    WITH sm AS ({_SQL_SITEMAP}),
    p AS ({_SQL_PAGE}),
    locs AS (
        SELECT DISTINCT trim(loc) AS url FROM (
            SELECT unnest(regexp_extract_all(xml,
                '<loc>\\s*([^<\\s][^<]*?)\\s*</loc>', 1)) AS loc
            FROM sm
        )
    ),
    tagged AS (
        SELECT {_SQL_HOST.format(u='l.url')} AS host,
               CASE WHEN c.url IS NULL THEN 1 ELSE 0 END AS is_new
        FROM locs l LEFT JOIN (SELECT DISTINCT url FROM p) c
            ON l.url = c.url
    ),
    fr AS (
        SELECT host, CAST(SUM(is_new) AS BIGINT) AS n_new
        FROM tagged GROUP BY host
    ),
    rb AS ({_SQL_ROBOTS_DELAY}),
    g AS (
        SELECT host,
               CASE WHEN strpos(robots, 'User-agent: *') = 0 THEN ''
                    ELSE substr(robots, strpos(robots, 'User-agent: *') + 13)
               END AS seg0
        FROM rb
    ),
    sg AS (
        SELECT host,
               CASE WHEN strpos(seg0, 'User-agent:') > 0
                    THEN substr(seg0, 1, strpos(seg0, 'User-agent:') - 1)
                    ELSE seg0 END AS seg
        FROM g
    ),
    delays AS (
        SELECT host,
               COALESCE(TRY_CAST(NULLIF(
                   regexp_extract(seg, 'Crawl-delay: ([0-9]+)', 1), ''
               ) AS INTEGER), 1) AS crawl_delay_s
        FROM sg
    )
    SELECT fr.host, fr.n_new,
           COALESCE(d.crawl_delay_s, 1) AS crawl_delay_s,
           CAST(fr.n_new * COALESCE(d.crawl_delay_s, 1) AS BIGINT)
               AS est_fetch_s
    FROM fr LEFT JOIN delays d ON fr.host = d.host
    """,
    doc="Politeness-bounded crawl scheduling: sitemap frontier (n_new per "
    "host) joined with the wildcard-group Crawl-delay (googlebot's "
    "Crawl-delay: 99 must never leak; hid%5=0 hosts carry no wildcard "
    "group and hid%2=1 hosts no delay line — both fall to the 1 s "
    "default). est_fetch_s = n_new * delay is the per-host SERIAL fetch "
    "bound: politeness serializes each host's queue regardless of "
    "cluster size, so a crawl round's wall-clock is max over hosts — the "
    "relation a scheduler splits rounds on (operators/linkgraph.py "
    "fetch_plan).",
)
def q_fetch_plan(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    hid = F.col("hid")
    nl = F.lit("\n")
    robots = (
        t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 37).alias("hid"))
        .distinct()
        .select(
            F.concat(
                F.lit("h"), hid.cast("string"), F.lit(".example.com")
            ).alias("host"),
            F.concat(
                F.lit("User-agent: googlebot"), nl,
                F.lit("Crawl-delay: 99"), nl, F.lit("Disallow: /"), nl,
                F.when(hid % 5 == 0, F.lit("")).otherwise(
                    F.concat(
                        F.lit("User-agent: *"), nl,
                        F.when(
                            hid % 2 == 0,
                            F.concat(
                                F.lit("Crawl-delay: "),
                                (hid % 7 + 1).cast("string"), nl,
                            ),
                        ).otherwise(F.lit("")),
                        F.lit("Disallow: /p/1"), nl,
                    )
                ),
            ).alias("robots"),
        )
    )
    crawled = _pages_df(spark, sf_dir).select("url")
    frontier = L.crawl_frontier(_sitemaps_df(spark, sf_dir), crawled)
    return L.fetch_plan(frontier, robots)


# ------------------------------------------------------- anchor-text index

_sql_href_host = _SQL_HOST.format(
    u="regexp_extract(tag, 'href=\"([^\"]*)\"', 1)"
)

@query(
    "q_anchor_text",
    f"""
    WITH p AS ({_SQL_PAGE}),
    tags AS (
        SELECT {_SQL_HOST.format(u='url')} AS src_host,
               unnest(regexp_extract_all(html,
                   '<a href="[^"]*">[^<]*</a>')) AS tag
        FROM p
    ),
    a AS (
        SELECT src_host,
               {_sql_href_host}
                   AS dst0,
               lower(trim(regexp_replace(
                   regexp_extract(tag, '>([^<]*)<', 1), '\\s+', ' ', 'g')))
                   AS anchor
        FROM tags
    ),
    counted AS (
        SELECT CASE WHEN dst0 = '' THEN src_host ELSE dst0 END AS dst_host,
               anchor, CAST(COUNT(*) AS BIGINT) AS n
        FROM a WHERE anchor <> ''
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT dst_host, anchor, n,
               ROW_NUMBER() OVER (
                   PARTITION BY dst_host ORDER BY n DESC, anchor ASC
               ) AS rank
        FROM counted
    )
    SELECT dst_host, anchor, n, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    doc="Anchor-text index: what OTHER pages' link text calls a host — "
    "the classic off-page relevance signal. Full-tag regex pull + "
    "per-element href/text re-extract (pure codegen), relative hrefs "
    "resolve to the linking page's own host (host_edges convention), "
    "lowercase/ws-normalized text, partial-agg count per (dst_host, "
    "anchor), top-3 per host by rank window with (n desc, anchor) total "
    "order. Two dst_host-keyed shuffles, window input already aggregated "
    "(operators/linkgraph.py anchor_text_index).",
)
def q_anchor_text(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    out = L.anchor_text_index(_pages_df(spark, sf_dir), top_k=3)
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------- declared-vs-detected lang QA

@query(
    "q_lang_mismatch",
    f"""
    WITH pg AS (
        SELECT doc_id,
               'h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS host,
               '<html lang="' || lang || '"><body>x</body></html>' AS html,
               text
        FROM documents
    ),
    s AS (
        SELECT host,
               lower(regexp_extract(html, '<html[^>]*\\slang=\"([^\"]*)\"', 1))
                   AS declared,
               {_LANG_SQL_HITS['en']} AS s_en,
               {_LANG_SQL_HITS['fr']} AS s_fr,
               {_LANG_SQL_HITS['es']} AS s_es,
               {_LANG_SQL_HITS['de']} AS s_de
        FROM pg
    ),
    d AS (
        SELECT host, declared,
               CASE WHEN s_en = greatest(s_en, s_fr, s_es, s_de)
                         AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'en'
                    WHEN s_fr = greatest(s_en, s_fr, s_es, s_de)
                         AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'fr'
                    WHEN s_es = greatest(s_en, s_fr, s_es, s_de)
                         AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'es'
                    WHEN s_de = greatest(s_en, s_fr, s_es, s_de)
                         AND greatest(s_en, s_fr, s_es, s_de) > 0 THEN 'de'
                    ELSE 'und' END AS detected
        FROM s
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN declared = detected THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match,
           CAST(SUM(CASE WHEN detected = 'und' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_und,
           CAST(SUM(CASE WHEN declared <> detected AND detected <> 'und'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
    FROM d GROUP BY host
    """,
    doc="Extraction-QA audit: declared <html lang> (pagemeta.html_lang on "
    "the page markup) vs detected language (textstats.lang_id stopword "
    "argmax on the extracted text), aggregated per host — the signal that "
    "catches template-declared languages lying about translated/scraped "
    "bodies (and routes docs to the right curation shard). Pure-codegen "
    "projections + one host-keyed partial-agg shuffle. Both branches "
    "populated: the synthetic corpus declares en/zh/es/de/fr while the "
    "body text skews detectably en.",
)
def q_lang_mismatch(spark, sf_dir):
    from corsearch_project_spark.operators import pagemeta as M
    from corsearch_project_spark.operators import textstats as X

    did = F.col("doc_id")
    pg = t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("h"), (did % 37).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.concat(
            F.lit('<html lang="'), F.col("lang"),
            F.lit('"><body>x</body></html>'),
        ).alias("html"),
        "text",
    )
    d = pg.select(
        "host",
        M.html_lang(F.col("html")).alias("declared"),
        X.lang_id(F.col("text")).alias("detected"),
    )
    return d.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("declared") == F.col("detected"), 1).otherwise(0)
        ).cast("long").alias("n_match"),
        F.sum(
            F.when(F.col("detected") == "und", 1).otherwise(0)
        ).cast("long").alias("n_und"),
        F.sum(
            F.when(
                (F.col("declared") != F.col("detected"))
                & (F.col("detected") != "und"), 1,
            ).otherwise(0)
        ).cast("long").alias("n_mismatch"),
    )


# ------------------------------------------------- hreflang reciprocity

_SQL_U = ("'https://h' || CAST({x} % 37 AS VARCHAR) || '.example.com/p/' "
          "|| CAST({x} AS VARCHAR)")

_SQL_HREFLANG_PAGE = f"""
        SELECT {_SQL_U.format(x='doc_id')} AS url,
               '<html><head>'
                   || '<link rel="alternate" hreflang="FR" href="'
                   || {_SQL_U.format(x='xor(doc_id, 1)')} || '">'
                   || CASE WHEN doc_id % 5 = 0
                           THEN '<link rel="alternate" hreflang="de" href="'
                                || {_SQL_U.format(x='(doc_id + 1000)')} || '">'
                           ELSE '' END
                   || '</head></html>' AS html
        FROM documents
"""


@query(
    "q_hreflang_reciprocity",
    f"""
    WITH pg AS ({_SQL_HREFLANG_PAGE}),
    tags AS (
        SELECT url AS src,
               unnest(regexp_extract_all(html,
                   '<link rel="alternate" hreflang="[^"]*" href="[^"]*"'))
                   AS tag
        FROM pg
    ),
    edges AS (
        SELECT src, regexp_extract(tag, 'href="([^"]*)"', 1) AS dst
        FROM tags
    ),
    recip AS (
        SELECT e.src, e.dst FROM edges e
        WHERE EXISTS (SELECT 1 FROM edges b
                      WHERE b.src = e.dst AND b.dst = e.src)
    ),
    na AS (
        SELECT {_SQL_HOST.format(u='src')} AS host,
               CAST(COUNT(*) AS BIGINT) AS n_alt
        FROM edges GROUP BY 1
    ),
    nr AS (
        SELECT {_SQL_HOST.format(u='src')} AS host,
               CAST(COUNT(*) AS BIGINT) AS n_reciprocal
        FROM recip GROUP BY 1
    )
    SELECT na.host, na.n_alt,
           COALESCE(nr.n_reciprocal, CAST(0 AS BIGINT)) AS n_reciprocal
    FROM na LEFT JOIN nr ON na.host = nr.host
    """,
    doc="hreflang reciprocity audit: declared language alternates are only "
    "valid when the target lists the source back (dangling declarations "
    "are phantom frontier entries for a crawler). Full-tag codegen pull + "
    "per-element re-extract, edge relation (src, dst), LEFT SEMI "
    "self-join on the reversed url pair, host-keyed partial aggs. "
    "Synthesis: every doc declares its XOR-1 partner (reciprocated both "
    "ways); doc_id%5=0 adds a dangling alternate to a never-crawled url "
    "(unreciprocated branch) (operators/pagemeta.py "
    "hreflang_reciprocity).",
)
def q_hreflang_reciprocity(spark, sf_dir):
    from corsearch_project_spark.operators import pagemeta as M

    did = F.col("doc_id")

    def u(x):
        return F.concat(
            F.lit("https://h"), (x % 37).cast("string"),
            F.lit(".example.com/p/"), x.cast("string"),
        )

    pages = t(spark, sf_dir, "documents").select(
        u(did).alias("url"),
        F.concat(
            F.lit("<html><head>"),
            F.lit('<link rel="alternate" hreflang="FR" href="'),
            u(did.bitwiseXOR(F.lit(1))), F.lit('">'),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit('<link rel="alternate" hreflang="de" href="'),
                    u(did + 1000), F.lit('">'),
                ),
            ).otherwise(F.lit("")),
            F.lit("</head></html>"),
        ).alias("html"),
    )
    return M.hreflang_reciprocity(pages)


# ---------------------------------------------------- template census

@query(
    "q_template_census",
    f"""
    WITH mp AS ({_SQL_META_PAGE}),
    tpl AS (
        SELECT {_SQL_HOST.format(u='url')} AS host,
               {SQL_PHASH.format(s=(
                   "array_to_string(list_transform("
                   "regexp_extract_all(html, '<([a-zA-Z][a-zA-Z0-9]*)', 1), "
                   "x -> lower(x)), ' ')"
               ))} AS tpl
        FROM mp
    ),
    per AS (
        SELECT host, tpl, CAST(COUNT(*) AS BIGINT) AS n
        FROM tpl GROUP BY 1, 2
    )
    SELECT host,
           CAST(SUM(n) AS BIGINT) AS n_pages,
           CAST(COUNT(*) AS BIGINT) AS n_templates,
           CAST(MAX(n) AS BIGINT) AS top_template_n
    FROM per GROUP BY host
    """,
    doc="Per-host template census: portable hash of the lowercased "
    "opening-tag sequence (the DOM shape with content stripped — two "
    "pages off one template fingerprint identically), counted per "
    "(host, fingerprint) then rolled up to (n_pages, n_templates, "
    "top_template_n). A template-dominated host is where per-host "
    "extraction configs pay off most (webextract/rules.py dispatch). "
    "The head-synthesis branches (%2/%3/%5) give each host up to 8 "
    "distinct shapes. Scan-fused fingerprint projection + two partial-agg "
    "shuffles (operators/pagemeta.py host_templates).",
)
def q_template_census(spark, sf_dir):
    from corsearch_project_spark.operators import pagemeta as M

    return M.host_templates(_meta_pages_df(spark, sf_dir))


# --------------------------------------------------- search snippets

@query(
    "q_search_snippets",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
        FROM documents
    ),
    post AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok WHERE term <> ''
          AND term IN ('merge', 'window', 'scan')
        GROUP BY 1, 2
    ),
    stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT p.doc_id,
               CAST(SUM(p.tf * (n.n_docs - s.df)) AS BIGINT) AS score
        FROM post p JOIN stats s ON p.term = s.term CROSS JOIN n
        GROUP BY p.doc_id HAVING COUNT(*) = 3
    ),
    top AS (
        SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    )
    SELECT t.doc_id, t.score,
           trim(substr(d.text,
                CAST(greatest(1, strpos(d.text, 'merge') - 20) AS BIGINT),
                60)) AS snippet
    FROM top t JOIN documents d ON t.doc_id = d.doc_id
    """,
    doc="Ranked search with snippets: the q_search_conjunctive top-k "
    "broadcast back onto the corpus (k rows broadcast, never the "
    "corpus), excerpt = locate+substring window around the first query "
    "term — pure codegen, no Python. The serving-layer face of the "
    "inverted index (operators/search.py search_snippets).",
)
def q_search_snippets(spark, sf_dir):
    from corsearch_project_spark.operators.search import search_snippets

    return search_snippets(
        t(spark, sf_dir, "documents"), _SEARCH_TERMS, k=10, width=60
    )


# ------------------------------------------------ BM25 ranked search

@query(
    "q_search_bm25",
    """
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS l
        FROM documents
    ),
    base AS (
        SELECT doc_id, unnest(l) AS term, CAST(len(l) AS BIGINT) AS dl
        FROM tok
    ),
    post AS (
        SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM base WHERE term IN ('merge', 'window', 'scan')
        GROUP BY 1, 2, 3
    ),
    stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM post GROUP BY 1),
    scalars AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               (1000 * CAST(SUM(len(l)) AS BIGINT))
                   // CAST(COUNT(*) AS BIGINT) AS avgdl_milli
        FROM tok
    ),
    scored AS (
        SELECT p.doc_id,
               CAST(SUM((c.n_docs - s.df) *
                   ((1000000 * 22 * p.tf * c.avgdl_milli) //
                    (10 * c.avgdl_milli * p.tf + 3 * c.avgdl_milli
                     + 9000 * p.dl))) AS BIGINT) AS score
        FROM post p JOIN stats s ON p.term = s.term CROSS JOIN scalars c
        GROUP BY p.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    doc="Disjunctive BM25 top-k, exact over integers: tf saturation and "
    "document-length normalization (the two signals rarity weighting "
    "lacks; Robertson et al. TREC-3) with k1=6/5, b=3/4 cleared to the "
    "integer ratio 22*tf*avgdl / (10*avgdl*tf + 3*avgdl + 9*dl), avgdl "
    "pinned at milli-token precision and the per-term factor taken as a "
    "scale-1e6 fixed point via integer DIV — bit-deterministic across "
    "engines where float log-idf/avgdl BM25 is not. Doc length rides "
    "the posting explode as a codegen projection (one corpus scan); "
    "corpus scalars and per-term df broadcast "
    "(operators/search.py search_bm25).",
)
def q_search_bm25(spark, sf_dir):
    from corsearch_project_spark.operators.search import search_bm25

    return search_bm25(t(spark, sf_dir, "documents"), _SEARCH_TERMS, k=10)


# ------------------------------------------------------ phrase search

# Two-term phrase chosen to actually OCCUR in the synthetic documents
# table (~40 hits at sf0.01) so the driver hash checks a ranked top-10,
# not an empty result; tests/test_search.py covers m=3 and the
# repeated-term overlap arm on a purpose-built corpus.
_PHRASE = ["value", "table"]


@query(
    "q_search_phrase",
    """
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS l
        FROM documents
    ),
    post AS (
        SELECT doc_id, unnest(l) AS term,
               unnest(range(1, len(l) + 1)) AS pos
        FROM tok
    ),
    slots AS (
        SELECT doc_id, pos - 0 AS anchor, 0 AS slot
        FROM post WHERE term = 'value'
        UNION ALL
        SELECT doc_id, pos - 1, 1 FROM post WHERE term = 'table'
    ),
    occ AS (
        SELECT doc_id, anchor
        FROM slots WHERE anchor >= 1
        GROUP BY doc_id, anchor
        HAVING COUNT(DISTINCT slot) = 2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(anchor) AS BIGINT) AS first_pos
    FROM occ GROUP BY doc_id
    ORDER BY n_hits DESC, doc_id LIMIT 10
    """,
    doc="Exact-phrase search over a positional posting relation "
    "(term, doc_id, pos): every posting matching slot i of the phrase "
    "emits (doc_id, anchor = pos - i, slot) in the same codegen "
    "projection as the term filter, and a phrase occurrence is an "
    "anchor group covering all m DISTINCT slots — a constant two "
    "shuffles regardless of phrase length, where the naive m-way positional "
    "self-join is m-1 shuffles over m rescans "
    "(operators/search.py search_phrase).",
)
def q_search_phrase(spark, sf_dir):
    from corsearch_project_spark.operators.search import search_phrase

    return search_phrase(t(spark, sf_dir, "documents"), _PHRASE, k=10)


# --------------------------------------------------- proximity search

@query(
    "q_search_proximity",
    """
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS l
        FROM documents
    ),
    post AS (
        SELECT doc_id, unnest(l) AS term,
               unnest(range(1, len(l) + 1)) AS pos
        FROM tok
    ),
    adj AS (
        SELECT doc_id, term, pos,
               lag(term) OVER w AS prev_term,
               lag(pos)  OVER w AS prev_pos
        FROM post WHERE term IN ('spark', 'merge')
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    d AS (
        SELECT doc_id, pos - prev_pos AS dist
        FROM adj WHERE prev_term IS NOT NULL AND term <> prev_term
    )
    SELECT doc_id, CAST(MIN(dist) AS BIGINT) AS min_dist,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM d GROUP BY doc_id
    ORDER BY min_dist ASC, n_pairs DESC, doc_id LIMIT 10
    """,
    doc="Proximity search: documents where two terms co-occur, ranked by "
    "smallest token distance — the relevance signal conjunctive AND "
    "cannot see. Uses the two-pointer fact that the min distance between "
    "two sorted position lists is realized by a pair ADJACENT in the "
    "merged sort order: one window lag over (doc_id, pos), keep "
    "different-term adjacencies, per-doc min — linear rows and ONE "
    "shuffle where the naive position self-join is |pos_a| x |pos_b| "
    "per document (operators/search.py search_proximity).",
)
def q_search_proximity(spark, sf_dir):
    from corsearch_project_spark.operators.search import search_proximity

    return search_proximity(
        t(spark, sf_dir, "documents"), "spark", "merge", k=10
    )


# ---------------------------------------------------- more-like-this

@query(
    "q_more_like_this",
    """
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS l
        FROM documents
    ),
    post AS (
        SELECT doc_id, unnest(l) AS term FROM tok
    ),
    p AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM post GROUP BY 1, 2
    ),
    qvec AS (SELECT term, tf AS q_tf FROM p WHERE doc_id = 7),
    cand AS (SELECT p.* FROM p JOIN qvec USING (term)),
    stats AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM cand GROUP BY 1 HAVING COUNT(*) <= 390
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT c.doc_id,
           CAST(SUM(q.q_tf * c.tf * (n.n_docs - s.df)
                    * (n.n_docs - s.df)) AS BIGINT) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM cand c JOIN qvec q USING (term) JOIN stats s USING (term)
         CROSS JOIN n
    WHERE c.doc_id <> 7
    GROUP BY c.doc_id
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    doc="More-like-this: top-k documents most similar to a query document "
    "by shared-term exact-integer dot product (weight = tf * (n_docs - "
    "df), all BIGINT — bit-deterministic). The query doc's posting "
    "vector is tiny and BROADCAST onto the posting relation (equi-join "
    "on term, never a similarity self-join); max_df=390 drops corpus-"
    "universal terms BEFORE the join — stopwords pair the query with "
    "everything, quadratic fan-out, zero signal: the cap-the-hubs move "
    "(operators/search.py more_like_this).",
)
def q_more_like_this(spark, sf_dir):
    from corsearch_project_spark.operators.search import more_like_this

    return more_like_this(
        t(spark, sf_dir, "documents"), 7, k=10, max_df=390
    )


# ---------------------------------------------------------- HITS

_HITS_ITERS = 3


def _sql_hits() -> str:
    """The HITS recurrence unrolled to _HITS_ITERS rounds — integer
    arithmetic, bit-exact twin of operators/linkgraph.hits."""
    ctes = [
        _sql_edges(_sql_page(external=True)),
        """de AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM edges)""",
        """nodes AS (
        SELECT src AS host FROM de UNION SELECT dst AS host FROM de
    )""",
        "s0 AS (SELECT host, CAST(1 AS BIGINT) AS auth, "
        "CAST(1 AS BIGINT) AS hub FROM nodes)",
    ]
    for i in range(1, _HITS_ITERS + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"""a{i} AS (
        SELECT n.host,
               CAST(COALESCE((SELECT SUM(p.hub) FROM de e
                              JOIN {prev} p ON e.src = p.host
                              WHERE e.dst = n.host), 0) AS BIGINT) AS auth
        FROM nodes n
    )"""
        )
        ctes.append(
            f"""s{i} AS (
        SELECT a.host, a.auth,
               CAST(COALESCE((SELECT SUM(q.auth) FROM de e
                              JOIN a{i} q ON e.dst = q.host
                              WHERE e.src = a.host), 0) AS BIGINT) AS hub
        FROM a{i} a
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT host, auth, hub FROM s{_HITS_ITERS}
    """


@query(
    "q_link_hits",
    _sql_hits(),
    doc="HITS hubs-and-authorities over the host graph — the off-page "
    "ranking pair complementing PageRank (C13): authorities are "
    "link-endorsed content hosts, hubs the directories pointing at them. "
    "Unnormalized INTEGER power iteration over the distinct edge set "
    "(presence, not multiplicity) with the classic update order "
    "(auth from previous hubs, hub from NEW auths), so BIGINT-sum "
    "associativity makes Spark bit-identical to the sequential oracle "
    "(same recurrence unrolled to 3 rounds). External sink hosts "
    "exercise the hub=0/auth-only branch. Each round: two equi-joins on "
    "the pre-aggregated edge relation + two partial-agg groupBys, score "
    "state localCheckpoint'd (operators/linkgraph.py hits).",
)
def q_link_hits(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    edges = L.host_edges(_pages_df(spark, sf_dir, external=True))
    return L.hits(edges, iterations=_HITS_ITERS)


# ------------------------------------------------ redirect resolution

# NB: _SQL_U embeds '{x} % 37', so every composite x MUST be
# parenthesized — 'doc_id - 1 % 37' would bind % first.
_SQL_REDIRECTS = f"""
        SELECT {_SQL_U.format(x='doc_id')} AS src,
               {_SQL_U.format(x='(doc_id - 1)')} AS dst
        FROM documents WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT {_SQL_U.format(x='(doc_id + 100000)')} AS src,
               {_SQL_U.format(x='(doc_id + 200000)')} AS dst
        FROM documents WHERE doc_id % 35 = 0
        UNION ALL
        SELECT {_SQL_U.format(x='(doc_id + 200000)')} AS src,
               {_SQL_U.format(x='(doc_id + 100000)')} AS dst
        FROM documents WHERE doc_id % 35 = 0
"""


@query(
    "q_resolve_redirects",
    f"""
    WITH RECURSIVE r AS ({_SQL_REDIRECTS}),
    chain(src, cur, hops) AS (
        SELECT src, dst, 1 FROM r
        UNION ALL
        SELECT c.src, r.dst, c.hops + 1
        FROM chain c JOIN r ON c.cur = r.src
        WHERE c.hops < 16
    ),
    fin AS (
        SELECT src, cur, hops,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
        FROM chain
    )
    SELECT f.src AS url, f.cur AS final_url,
           (f.cur NOT IN (SELECT src FROM r)) AS resolved
    FROM fin f WHERE f.rn = 1
    """,
    doc="Transitive redirect-chain resolution: pointer DOUBLING over the "
    "functional (src -> Location) graph — ceil(log2(16)) = 4 self-joins "
    "follow up to 16 hops in O(log h) shuffles, terminals absorb, and a "
    "url still pointing at a redirect source after the cap sits on a "
    "cycle (resolved=false — a crawler drops it rather than loop). "
    "Synthesis: doc_id%5 chains of length <= 4 down to %5==0 terminals "
    "(resolved branch) plus 2-cycles on synthetic url pairs for "
    "doc_id%35==0 (cycle branch); the oracle follows the chain "
    "hop-by-hop with the same 16-hop cap "
    "(operators/linkgraph.py resolve_redirects).",
)
def q_resolve_redirects(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    did = F.col("doc_id")

    def u(x):
        return F.concat(
            F.lit("https://h"), (x % 37).cast("string"),
            F.lit(".example.com/p/"), x.cast("string"),
        )

    d = t(spark, sf_dir, "documents")
    chains = d.where(did % 5 != 0).select(
        u(did).alias("src"), u(did - 1).alias("dst")
    )
    cyc_a = d.where(did % 35 == 0).select(
        u(did + 100000).alias("src"), u(did + 200000).alias("dst")
    )
    cyc_b = d.where(did % 35 == 0).select(
        u(did + 200000).alias("src"), u(did + 100000).alias("dst")
    )
    redirects = chains.unionByName(cyc_a).unionByName(cyc_b)
    return L.resolve_redirects(redirects, max_hops=16)


# ---------------------------------------------------------- SURT/CDX index

@query(
    "q_url_surt",
    """
    WITH u0 AS (
        SELECT doc_id,
               CASE
                   WHEN doc_id % 3 = 0 THEN
                       'HTTPS://WWW.News.' || upper(source)
                       || '.EXample.com:443/p/' || CAST(doc_id % 10 AS VARCHAR)
                       || '?zz=1&utm_c=' || CAST(doc_id AS VARCHAR)
                       || '&a=' || CAST(doc_id % 5 AS VARCHAR) || '#f'
                   WHEN doc_id % 3 = 1 THEN
                       'http://' || source || '.example.com:80'
                   ELSE
                       'https://CDN.' || source || '.example.com/static/'
                       || CAST(doc_id % 7 AS VARCHAR)
               END AS url
        FROM documents
    ),
    s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u0),
    s2 AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(
                   lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?]+)', 1)),
                   ':(80|443)$', ''), '^www\\.', '') AS host,
               regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+', '') AS rest
        FROM s1
    ),
    s3 AS (
        SELECT doc_id,
               array_to_string(list_reverse(string_split(host, '.')), ',') AS rev,
               CASE WHEN strpos(rest, '?') > 0
                    THEN substr(rest, 1, strpos(rest, '?') - 1) ELSE rest END AS path0,
               CASE WHEN strpos(rest, '?') > 0
                    THEN substr(rest, strpos(rest, '?') + 1) ELSE '' END AS qs
        FROM s2
    ),
    s4 AS (
        SELECT doc_id, rev,
               CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
               list_sort(list_filter(string_split(qs, '&'),
                   p -> NOT (substr(p, 1, 4) = 'utm_' OR substr(p, 1, 4) = 'ref='
                             OR p = ''))) AS params
        FROM s3
    ),
    c AS (
        SELECT doc_id,
               rev || ')' || path || CASE WHEN len(params) > 0
                   THEN '?' || array_to_string(params, '&') ELSE '' END AS surt
        FROM s4
    )
    SELECT surt, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS first_doc_id
    FROM c GROUP BY 1
    """,
    doc="SURT capture-index key (the sort key of Common Crawl's CDX index "
    "and every Wayback-style archive): scheme dropped, host lowercased, "
    "default port and leading www. stripped, host labels REVERSED and "
    "comma-joined, ')' + path (+ canonicalized query). Byte-lexicographic "
    "order on the key clusters a registrable domain and all its subdomains "
    "into one contiguous range, so a 10^12-row index range-partitioned on "
    "surt serves per-domain scans from a bounded partition range. Pure "
    "codegen regexp/array projection + one hash agg; synthesis exercises "
    "multi-label hosts, www./port/tracking strips, and the empty-path->'/' "
    "default (functions/urlnorm.py surt_key).",
)
def q_url_surt(spark, sf_dir):
    from corsearch_project_spark.functions.urlnorm import surt_key

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    src = F.col("source")
    url = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("HTTPS://WWW.News."), F.upper(src),
                F.lit(".EXample.com:443/p/"), (did % 10).cast("string"),
                F.lit("?zz=1&utm_c="), did.cast("string"),
                F.lit("&a="), (did % 5).cast("string"), F.lit("#f"),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(F.lit("http://"), src, F.lit(".example.com:80")),
        )
        .otherwise(
            F.concat(
                F.lit("https://CDN."), src, F.lit(".example.com/static/"),
                (did % 7).cast("string"),
            )
        )
    )
    return (
        d.select(surt_key(url).alias("surt"), "doc_id")
        .groupBy("surt")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


# ------------------------------------------------- change-rate recrawl tiers

@query(
    "q_recrawl_schedule",
    """
    WITH h AS (
        SELECT 'https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               seq,
               'd' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(seq // (1 + doc_id % 4) AS VARCHAR) AS digest
        FROM (SELECT doc_id, unnest(range(0, 4)) AS seq FROM documents)
        WHERE seq <= CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 3 END
    ),
    lagged AS (
        SELECT url, digest,
               LAG(digest) OVER (PARTITION BY url ORDER BY seq) AS prev
        FROM h
    ),
    per_url AS (
        SELECT url,
               CAST(COUNT(*) AS BIGINT) AS n_fetches,
               CAST(SUM(CASE WHEN prev IS NOT NULL AND digest <> prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
        FROM lagged GROUP BY url
    )
    SELECT url, n_fetches, n_changes,
           CASE WHEN n_fetches > 1
                THEN CAST(floor(n_changes * 1000.0 / (n_fetches - 1)) AS BIGINT)
           END AS change_permille,
           CASE WHEN n_fetches <= 1 THEN 'new'
                WHEN n_changes * 1000.0 / (n_fetches - 1) >= 500 THEN 'hot'
                WHEN n_changes = 0 THEN 'cold'
                ELSE 'warm' END AS tier
    FROM per_url
    """,
    doc="Change-rate recrawl scheduling (Cho & Garcia-Molina, TOIT 2003): "
    "per-url fetch history (url, fetch_seq, digest) -> observed-change "
    "stats via lag over fetch_seq (A->B->A counts two changes, unlike "
    "count-distinct) -> integer change_permille -> hot/warm/cold/new "
    "revisit tiers. A 10^12-url crawler allocates its fetch budget by "
    "these tiers instead of uniform revisits. One url-keyed window + one "
    "url-keyed agg (same hash partitioning, per-url state bounded by "
    "fetch count); synthesis gives each url change period 1+doc_id%4 over "
    "4 fetches and a single-fetch arm (doc_id%11==0), populating all four "
    "tiers (operators/linkgraph.py recrawl_schedule).",
)
def q_recrawl_schedule(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    hist = (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("fetch_seq"),
        )
        .where(
            F.col("fetch_seq")
            <= F.when(did % 11 == 0, F.lit(0)).otherwise(F.lit(3))
        )
        .select(
            F.concat(
                F.lit("https://h"), (did % 37).cast("string"),
                F.lit(".example.com/p/"), did.cast("string"),
            ).alias("url"),
            "fetch_seq",
            F.concat(
                F.lit("d"), did.cast("string"), F.lit(":"),
                F.expr("fetch_seq div (1 + doc_id % 4)").cast("string"),
            ).alias("digest"),
        )
    )
    return L.recrawl_schedule(hist)


# ------------------------------------------- registrable-domain rollup (PSL)

_SQL_SUF1 = ("'com','org','net','edu','gov','mil','int','io','co',"
             "'ai','dev','app','info','biz','uk','de','fr','jp','au',"
             "'cn','ru','br','in','us','eu','nl','it','es','se','ch'")
_SQL_SUF2 = ("'co.uk','org.uk','ac.uk','gov.uk','me.uk','net.uk',"
             "'com.au','net.au','org.au','edu.au','gov.au',"
             "'co.jp','or.jp','ne.jp','ac.jp','go.jp',"
             "'com.br','net.br','org.br','com.cn','net.cn','org.cn',"
             "'co.in','net.in','org.in',"
             "'github.io','gitlab.io','blogspot.com','herokuapp.com',"
             "'cloudfront.net','amazonaws.com','netlify.app','vercel.app'")


@query(
    "q_domain_quality",
    f"""
    WITH h0 AS (
        SELECT doc_id, n_chars,
               CASE doc_id % 4
                   WHEN 0 THEN 'a' || CAST(doc_id % 7 AS VARCHAR)
                               || '.example.com'
                   WHEN 1 THEN 'www.news' || CAST(doc_id % 3 AS VARCHAR)
                               || '.co.uk'
                   WHEN 2 THEN 'u' || CAST(doc_id % 5 AS VARCHAR)
                               || '.github.io'
                   ELSE 'x.intranet'
               END AS host
        FROM documents
    ),
    p AS (
        SELECT doc_id, n_chars, host,
               string_split(host, '.') AS parts,
               len(string_split(host, '.')) AS n
        FROM h0
    ),
    rd AS (
        SELECT doc_id, n_chars, host,
               CASE
                   WHEN (parts[n-1] || '.' || parts[n]) IN ({_SQL_SUF2})
                        AND n >= 3
                       THEN parts[n-2] || '.' || parts[n-1] || '.' || parts[n]
                   WHEN (parts[n-1] || '.' || parts[n]) IN ({_SQL_SUF2})
                       THEN host
                   WHEN parts[n] IN ({_SQL_SUF1}) AND n >= 2
                       THEN parts[n-1] || '.' || parts[n]
                   ELSE host
               END AS domain
        FROM p
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM rd GROUP BY domain
    """,
    doc="Registrable-domain (eTLD+1) rollup — the aggregation key of C4/"
    "RefinedWeb-style domain filters and per-domain caps: hosts collapse "
    "onto their public-suffix+1 (news sites' subdomains merge, every "
    "github.io user stays separate) via functions/psl.py "
    "registrable_domain — two substring_index probes against literal "
    "suffix arrays compiled into the plan (no join, no Python; full-PSL "
    "deploy seam documented), then one partial-agg shuffle on domain. "
    "Synthesis covers .com collapse, multi-label co.uk, private-registry "
    "github.io, and an unknown intranet tail; the oracle mirrors the PSL "
    "decision generically rather than per-branch.",
)
def q_domain_quality(spark, sf_dir):
    from corsearch_project_spark.functions.psl import registrable_domain

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = (
        F.when(did % 4 == 0,
               F.concat(F.lit("a"), (did % 7).cast("string"),
                        F.lit(".example.com")))
        .when(did % 4 == 1,
              F.concat(F.lit("www.news"), (did % 3).cast("string"),
                       F.lit(".co.uk")))
        .when(did % 4 == 2,
              F.concat(F.lit("u"), (did % 5).cast("string"),
                       F.lit(".github.io")))
        .otherwise(F.lit("x.intranet"))
    )
    return (
        d.select(registrable_domain(host).alias("domain"),
                 host.alias("host"), "n_chars")
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------- training-mixture sampling

_MIX_RATES = {"src0": 1000, "src1": 750, "src2": 500, "src3": 250,
              "src4": 100, "src5": 0}
_MIX_DEFAULT = 300


@query(
    "q_mixture_sample",
    f"""
    WITH v AS (
        SELECT source,
               {SQL_PHASH.format(s="'mix:' || CAST(doc_id AS VARCHAR)")} % 1000
                   AS h,
               CASE source
                   WHEN 'src0' THEN 1000 WHEN 'src1' THEN 750
                   WHEN 'src2' THEN 500  WHEN 'src3' THEN 250
                   WHEN 'src4' THEN 100  WHEN 'src5' THEN 0
                   ELSE {_MIX_DEFAULT}
               END AS rate
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN h < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM v GROUP BY source
    """,
    doc="Deterministic training-mixture sampling (The Pile / DoReMi-style "
    "per-source rates): keep verdict = phash('mix:'||key) % 1000 < "
    "rate[source] — a pure function of the row (reruns, increments and "
    "any cluster size keep identical rows), rate CASE + hash in one "
    "codegen projection, salt decorrelated from hash_split so sampling "
    "never biases the train/valid/test assignment. Rates cover keep-all, "
    "four partial rates, drop-all and the default; up-sampling is by "
    "unioned salted copies, documented in operators/textstats.py "
    "mixture_keep.",
)
def q_mixture_sample(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    keep = X.mixture_keep(
        F.col("source"),
        F.col("doc_id").cast("string"),
        _MIX_RATES,
        default_permille=_MIX_DEFAULT,
    )
    return (
        d.select("source", keep.cast("int").alias("k"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("k").cast("long").alias("n_kept"),
        )
    )


# ------------------------------------------------- per-domain cap sampling

@query(
    "q_domain_cap",
    f"""
    WITH h0 AS (
        SELECT doc_id,
               'https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 37 < 30 THEN 'example.com'
                    ELSE 'rare' || CAST(doc_id % 37 AS VARCHAR) || '.org'
               END AS domain
        FROM documents
    ),
    rk AS (
        SELECT domain, url,
               ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY {SQL_PHASH.format(s='url')}, url
               ) AS r
        FROM h0
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MIN(url) AS first_url
    FROM rk WHERE r <= 25 GROUP BY domain
    """,
    doc="Per-domain document cap (RefinedWeb-style anti-memorization "
    "sampling): keep at most K docs per registrable domain, survivors "
    "chosen by portable-hash rank of the url — deterministic across "
    "reruns/increments/cluster sizes and uncorrelated with crawl order. "
    "One window shuffle on domain (AQE skew split covers the mega-domain "
    "being capped, which is exactly the skewed key). Synthesis gives one "
    "mega-domain (30/37 of all urls) and 7 rare domains below the cap — "
    "both the capped and uncapped branches carry rows "
    "(operators/textstats.py domain_cap).",
)
def q_domain_cap(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    h0 = d.select(
        F.concat(
            F.lit("https://h"), (did % 37).cast("string"),
            F.lit(".example.com/p/"), did.cast("string"),
        ).alias("url"),
        F.when(did % 37 < 30, F.lit("example.com"))
        .otherwise(
            F.concat(F.lit("rare"), (did % 37).cast("string"), F.lit(".org"))
        )
        .alias("domain"),
    )
    capped = X.domain_cap(h0, cap=25, domain_col="domain", key_col="url")
    return capped.groupBy("domain").agg(
        F.count("*").alias("n_kept"),
        F.min("url").alias("first_url"),
    )


# ------------------------------------------------ page-level robots census

@query(
    "q_meta_robots",
    """
    WITH p AS (
        SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
               '<html><head>' ||
               CASE
                   WHEN doc_id % 10 = 0
                       THEN '<meta name="robots" content="noindex, nofollow">'
                   WHEN doc_id % 10 = 1
                       THEN '<meta name="robots" content="NOINDEX">'
                   WHEN doc_id % 10 = 2
                       THEN '<meta name="robots" content="none">'
                   WHEN doc_id % 10 = 3
                       THEN '<meta name="robots" content="nofollow">'
                   WHEN doc_id % 10 = 4
                       THEN '<meta name="robots" content="index, follow">'
                   ELSE ''
               END || '</head><body>x</body></html>' AS html
        FROM documents
    ),
    v AS (
        SELECT host,
               lower(regexp_extract(html,
                   '<meta name="robots" content="([^"]*)"', 1)) AS c
        FROM p
    ),
    d AS (
        SELECT host,
               list_contains(list_transform(string_split(c, ','),
                                            x -> trim(x)), 'none')
                   OR list_contains(list_transform(string_split(c, ','),
                                                   x -> trim(x)), 'noindex')
                   AS noindex,
               list_contains(list_transform(string_split(c, ','),
                                            x -> trim(x)), 'none')
                   OR list_contains(list_transform(string_split(c, ','),
                                                   x -> trim(x)), 'nofollow')
                   AS nofollow
        FROM v
    )
    SELECT host,
           CAST(SUM(CASE WHEN noindex THEN 1 ELSE 0 END) AS BIGINT)
               AS n_noindex,
           CAST(SUM(CASE WHEN nofollow THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nofollow,
           CAST(SUM(CASE WHEN NOT noindex AND NOT nofollow THEN 1 ELSE 0 END)
               AS BIGINT) AS n_unrestricted
    FROM d GROUP BY host
    """,
    doc="Page-level robots-directive census per host: meta name=robots "
    "content tokens -> (noindex, nofollow) verdicts (case-insensitive, "
    "comma-split, 'none' implies both) aggregated per host — the page-"
    "level complement of host-level RFC 9309 that gates what enters the "
    "search postings (C19) and which pages contribute link-graph edges "
    "(C13/C26). Pure-codegen regex + token probes, one host-keyed "
    "partial-agg shuffle; synthesis exercises combined/single/none/"
    "positive/absent directive arms "
    "(operators/pagemeta.py meta_robots).",
)
def q_meta_robots(spark, sf_dir):
    from corsearch_project_spark.operators.pagemeta import meta_robots

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    meta = (
        F.when(did % 10 == 0,
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(did % 10 == 1, F.lit('<meta name="robots" content="NOINDEX">'))
        .when(did % 10 == 2, F.lit('<meta name="robots" content="none">'))
        .when(did % 10 == 3, F.lit('<meta name="robots" content="nofollow">'))
        .when(did % 10 == 4,
              F.lit('<meta name="robots" content="index, follow">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(F.lit("<html><head>"), meta,
                    F.lit("</head><body>x</body></html>"))
    r = meta_robots(html)
    return (
        d.select(
            F.concat(F.lit("h"), (did % 37).cast("string")).alias("host"),
            r["noindex"].alias("noindex"),
            r["nofollow"].alias("nofollow"),
        )
        .groupBy("host")
        .agg(
            F.sum(F.col("noindex").cast("int")).cast("long").alias("n_noindex"),
            F.sum(F.col("nofollow").cast("int")).cast("long").alias("n_nofollow"),
            F.sum((~F.col("noindex") & ~F.col("nofollow")).cast("int"))
            .cast("long").alias("n_unrestricted"),
        )
    )


# ------------------------------------------------------ crawl snapshot diff

@query(
    "q_snapshot_diff",
    """
    WITH old AS (
        SELECT 'https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               'd' || CAST(doc_id AS VARCHAR) AS digest
        FROM documents WHERE doc_id % 9 <> 0
    ),
    new AS (
        SELECT 'https://h' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 5 = 0
                    THEN 'D' || CAST(doc_id AS VARCHAR)
                    ELSE 'd' || CAST(doc_id AS VARCHAR) END AS digest
        FROM documents WHERE doc_id % 7 <> 0
    ),
    d AS (
        SELECT COALESCE(o.url, n.url) AS url,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'removed'
                    WHEN o.digest <> n.digest THEN 'changed'
                    ELSE 'unchanged' END AS change
        FROM old o FULL OUTER JOIN new n ON o.url = n.url
    )
    SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           change,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY host, change
    """,
    doc="Crawl snapshot diff — the recrawl round's closing report (what "
    "the web did since last time) and the input to merge decisions (S11) "
    "and change-rate scheduling (C29): two (url, digest) relations, ONE "
    "full outer join on url with null-pattern classification into added/"
    "removed/changed/unchanged, rolled up per host. On url-bucketed "
    "tables (P1) the join is a zero-exchange sort-merge; synthesis drops "
    "doc_id%9 from old and doc_id%7 from new and flips digests at "
    "doc_id%5, populating all four branches "
    "(operators/linkgraph.py snapshot_diff).",
)
def q_snapshot_diff(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (did % 37).cast("string"),
        F.lit(".example.com/p/"), did.cast("string"),
    )
    old = d.where(did % 9 != 0).select(
        url.alias("url"),
        F.concat(F.lit("d"), did.cast("string")).alias("digest"),
    )
    new = d.where(did % 7 != 0).select(
        url.alias("url"),
        F.when(did % 5 == 0, F.concat(F.lit("D"), did.cast("string")))
        .otherwise(F.concat(F.lit("d"), did.cast("string")))
        .alias("digest"),
    )
    return (
        L.snapshot_diff(old, new)
        .groupBy("host", "change")
        .agg(F.count("*").alias("n"))
    )


# -------------------------------------------- corpus-relative token rarity

@query(
    "q_token_rarity",
    """
    WITH pairs AS (
        SELECT DISTINCT doc_id AS doc, unnest(string_split(trim(text), ' ')) AS tok
        FROM documents
    ),
    p AS (SELECT doc, tok FROM pairs WHERE tok <> ''),
    dfr AS (SELECT tok, COUNT(DISTINCT doc) AS df FROM p GROUP BY tok),
    j AS (SELECT p.doc, dfr.df FROM p JOIN dfr ON p.tok = dfr.tok)
    SELECT doc,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_common_tok,
           CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) * 1000
               // CAST(COUNT(*) AS BIGINT) AS common_permille
    FROM j GROUP BY doc
    """,
    doc="Corpus-relative token rarity (the LM-free CCNet-quality "
    "analogue): per doc, the permille of its DISTINCT tokens whose "
    "corpus document-frequency is >= 3 — gibberish and OCR noise score "
    "low because their tokens appear nowhere else. The doc<->corpus "
    "statistics join shape: explode distinct (doc, token) pairs, "
    "partial-agg token->df (Zipf-small vocab relation), join back on "
    "token (AQE broadcasts when the vocab fits), per-doc integer "
    "permille. Three linear shuffles, no Python, bit-exact across "
    "engines where a float logprob sum would not be "
    "(operators/textstats.py common_token_fraction).",
)
def q_token_rarity(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return X.common_token_fraction(d, min_df=3)


# ---------------------------------------------------- crawl-trap detection

@query(
    "q_crawl_traps",
    """
    WITH u AS (
        SELECT CASE WHEN doc_id % 3 = 0
                    THEN 'https://cal.example.com/d/'
                         || CAST(2000 + doc_id % 30 AS VARCHAR) || '/'
                         || CAST(doc_id % 12 AS VARCHAR)
                         || '?sid=' || CAST(doc_id AS VARCHAR)
                    ELSE 'https://www.example.org/'
                         || CASE WHEN doc_id % 4 = 1 THEN 'about'
                                 WHEN doc_id % 4 = 2 THEN 'products/p'
                                      || CAST(doc_id AS VARCHAR)
                                 ELSE 'blog/' || CAST(doc_id AS VARCHAR)
                                      || '/comments' END
               END AS url
        FROM documents
    ),
    t AS (
        SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                   '[?#].*$', ''),
                   '[0-9a-fA-F]{32,}', 'H', 'g'),
                   '[0-9]+', 'N', 'g') AS template
        FROM u
    ),
    pt AS (
        SELECT host, template, COUNT(*) AS n
        FROM t GROUP BY host, template
    ),
    rk AS (
        SELECT host, template, n,
               ROW_NUMBER() OVER (
                   PARTITION BY host ORDER BY n DESC, template ASC
               ) AS rk
        FROM pt
    )
    SELECT host,
           CAST(SUM(n) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_templates,
           CAST(SUM(n) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
               AS urls_per_template,
           MAX(CASE WHEN rk = 1 THEN template END) AS top_template,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT)
               AS top_template_n
    FROM rk GROUP BY host
    """,
    doc="Crawl-trap detection from the url inventory: digit/hex runs "
    "collapse into path TEMPLATES (/d/2026/8?sid=123 -> /d/N/N), and "
    "hosts whose urls pile onto few templates (calendar pages, session "
    "ids, faceted search — infinite url spaces) surface via "
    "urls_per_template, so the scheduler can cap per-template fetches — "
    "the url-space counterpart of the DOM template census (C21) and the "
    "per-domain doc cap (C33). Narrow codegen template projection + the "
    "same two host-keyed shuffles as the census; synthesis gives one "
    "trap host (calendar+sid collapsing to a single template) and one "
    "organic host with distinct-per-doc and shared templates "
    "(operators/linkgraph.py crawl_traps).",
)
def q_crawl_traps(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.when(
        did % 3 == 0,
        F.concat(
            F.lit("https://cal.example.com/d/"),
            (2000 + did % 30).cast("string"), F.lit("/"),
            (did % 12).cast("string"),
            F.lit("?sid="), did.cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://www.example.org/"),
            F.when(did % 4 == 1, F.lit("about"))
            .when(did % 4 == 2,
                  F.concat(F.lit("products/p"), did.cast("string")))
            .otherwise(
                F.concat(F.lit("blog/"), did.cast("string"),
                         F.lit("/comments"))
            ),
        )
    )
    return L.crawl_traps(d.select(url.alias("url")))


@query(
    "q_link_spam",
    f"""
    WITH {_sql_edges(_sql_page(external=True))},
    ns AS (SELECT * FROM edges WHERE src_host <> dst_host),
    tot AS (
        SELECT src_host AS host, CAST(SUM(n_links) AS BIGINT) AS n_out_links
        FROM edges GROUP BY 1
    ),
    agg AS (
        SELECT src_host AS host, SUM(n_links) AS total_out,
               COUNT(*) AS out_hosts, MAX(n_links) AS top_dst
        FROM ns GROUP BY 1
    ),
    rc AS (
        SELECT a.src_host AS host, COUNT(*) AS n_recip
        FROM ns a
        WHERE EXISTS (SELECT 1 FROM ns b
                      WHERE b.src_host = a.dst_host
                        AND b.dst_host = a.src_host)
        GROUP BY a.src_host
    )
    SELECT t.host, t.n_out_links,
           CAST(COALESCE(g.out_hosts, 0) AS BIGINT) AS out_hosts,
           CAST((t.n_out_links - COALESCE(g.total_out, 0)) * 1000
                // t.n_out_links AS BIGINT) AS self_permille,
           CAST(CASE WHEN COALESCE(g.total_out, 0) > 0
                     THEN g.top_dst * 1000 // g.total_out
                     ELSE 0 END AS BIGINT) AS top_dst_permille,
           CAST(CASE WHEN COALESCE(g.out_hosts, 0) > 0
                     THEN COALESCE(r.n_recip, 0) * 1000 // g.out_hosts
                     ELSE 0 END AS BIGINT) AS recip_permille
    FROM tot t
    LEFT JOIN agg g ON t.host = g.host
    LEFT JOIN rc r ON t.host = r.host
    """,
    doc="nepotistic-link features per source host (Fetterly'04 / "
    "Davison'00): self-link share, single-destination concentration, "
    "reciprocated-neighbor fraction — the structural link-farm signals "
    "feeding the quality prior beside C13's PageRank. Three partial "
    "aggs keyed src_host + ONE equi-semi-join of non-self edges against "
    "their reversal; per-host aggregates joined at the end are "
    "#hosts-sized. External sink hosts exercise the zero-reciprocity "
    "branch; '/about' self-links the self_permille branch "
    "(operators/linkgraph.py link_spam_features).",
)
def q_link_spam(spark, sf_dir):
    from corsearch_project_spark.operators import linkgraph as L

    return L.link_spam_features(
        L.host_edges(_pages_df(spark, sf_dir, external=True))
    )


# ------------------------------------------------------------- BPE training


def _bpe_oracle_cte(k: int) -> str:
    """Chained-CTE DuckDB twin of ``operators/bpe.bpe_train``: d0 is the
    word dict with 2-space symbol encoding; each round i is the pair
    count (unnest over adjacent index pairs), the total-order argmax
    (count DESC, left ASC, right ASC — binary order in both engines),
    and the literal-string merge replace. K fixed rounds = K CTE blocks,
    the exact SQL unrolling of the iterative Spark plan."""
    parts = [
        "WITH d0 AS (\n"
        "    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,\n"
        "           ' ' || regexp_replace(word, '(.)', '\\1  ', 'g')"
        " || '</w> ' AS seq\n"
        "    FROM (SELECT unnest(string_split_regex(text, '\\s+'))"
        " AS word FROM documents)\n"
        "    WHERE word <> ''\n"
        "    GROUP BY word\n"
        ")"
    ]
    for i in range(k):
        parts.append(
            f",\nu{i} AS (SELECT cnt, syms,"
            f" unnest(generate_series(1, len(syms) - 1)) AS gi\n"
            f"          FROM (SELECT cnt, string_split(trim(seq), '  ')"
            f" AS syms FROM d{i})),\n"
            f"t{i} AS (SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS n\n"
            f"         FROM (SELECT syms[gi] AS a, syms[gi + 1] AS b, cnt"
            f" FROM u{i})\n"
            f"         GROUP BY a, b ORDER BY n DESC, a ASC, b ASC"
            f" LIMIT 1),\n"
            f"d{i + 1} AS (SELECT word, cnt,\n"
            f"           replace(seq, ' ' || a || '  ' || b || ' ',"
            f" ' ' || a || b || ' ') AS seq\n"
            f"           FROM d{i} CROSS JOIN t{i})"
        )
    return "".join(parts)


_BPE_K = 6

_BPE_MERGES_SQL = _bpe_oracle_cte(_BPE_K) + "\n" + "\nUNION ALL ".join(
    f'SELECT CAST({i + 1} AS BIGINT) AS step, a AS "left", b AS "right",'
    f" a || b AS merged, n AS pair_count FROM t{i}"
    for i in range(_BPE_K)
) + "\nORDER BY step"

_BPE_CENSUS_SQL = _bpe_oracle_cte(_BPE_K) + f"""
SELECT token, CAST(SUM(cnt) AS BIGINT) AS n
FROM (SELECT cnt, unnest(string_split(trim(seq), '  ')) AS token
      FROM d{_BPE_K})
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 30
"""


@query(
    "q_bpe_merges",
    _BPE_MERGES_SQL,
    doc="corpus-scale BPE tokenizer training (Sennrich ACL'16): one corpus "
    "scan reduces 10^12 docs to the vocab-sized word dict, then each merge "
    "round is one explode+partial-agg shuffle over THAT dict plus a 1-row "
    "argmax to the driver — the only driver data, bounded by construction. "
    "Counts are exact BIGINTs and the argmax tie-break is total (count "
    "DESC, left ASC, right ASC), so the learned merge table is "
    "bit-identical across engines and partitionings; the oracle is the "
    "K-round CTE unrolling (operators/bpe.py bpe_train).",
)
def q_bpe_merges(spark, sf_dir):
    from corsearch_project_spark.operators import bpe as B

    merges, _dic = B.bpe_train(t(spark, sf_dir, "documents"), _BPE_K)
    return B.merges_df(spark, merges)


@query(
    "q_bpe_census",
    _BPE_CENSUS_SQL,
    doc="subword-token census after K BPE merges: the vocabulary coverage "
    "/ fertility report that decides whether the merge budget sufficed. "
    "Training as in q_bpe_merges; the census itself is one explode + one "
    "shuffle over the vocab-sized dict, top-k via TakeOrderedAndProject "
    "(operators/bpe.py token_census).",
)
def q_bpe_census(spark, sf_dir):
    from corsearch_project_spark.operators import bpe as B

    merges, dic = B.bpe_train(t(spark, sf_dir, "documents"), _BPE_K)
    return B.token_census(dic, 30)


_BPE_FERTILITY_SQL = _bpe_oracle_cte(_BPE_K) + f""",
w AS (
    SELECT lang, word
    FROM (SELECT lang, unnest(string_split_regex(text, '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
),
seg AS (
    SELECT word,
           CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_toks
    FROM d{_BPE_K}
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(n_toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility
FROM w JOIN seg USING (word)
GROUP BY lang
ORDER BY lang
"""


@query(
    "q_bpe_fertility",
    _BPE_FERTILITY_SQL,
    doc="per-language subword fertility (tokens per word, end-of-word "
    "symbol included) under the learned BPE merges — THE tokenizer-QA "
    "number that decides whether a merge budget under-serves a language "
    "before any training run. Train as q_bpe_merges; then one words "
    "explode keyed (lang, word), one join against the vocab-sized "
    "segmented dict (broadcast-able: the dict is vocab-sized, not "
    "corpus-sized), one partial agg by lang. The single double division "
    "happens once per group in identical operand order on both engines "
    "(operators/bpe.py bpe_train + token counts).",
)
def q_bpe_fertility(spark, sf_dir):
    from corsearch_project_spark.operators import bpe as B

    d = t(spark, sf_dir, "documents")
    merges, dic = B.bpe_train(d, _BPE_K)
    seg = dic.select(
        "word",
        F.size(F.split(F.trim(F.col("seq")), "  ")).cast("long").alias("n_toks"),
    )
    w = (
        d.select(
            "lang",
            F.explode(F.split(F.col("text"), r"\s+")).alias("word"),
        )
        .where(F.col("word") != "")
    )
    return (
        w.join(seg, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "fertility",
            F.col("n_tokens").cast("double") / F.col("n_words").cast("double"),
        )
        .select("lang", "n_words", "n_tokens", "fertility")
        .orderBy("lang")
    )


# ------------------------------------------------------- sketches (CMS/Bloom)

_SQL_HJ = (
    "CAST('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' ||"
    " CAST({x} AS VARCHAR)), 1, 8) AS BIGINT)"
)

_CMS_SQL = f"""
WITH w AS (
    SELECT item
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS item
          FROM documents)
    WHERE item <> ''
),
rows_j AS (SELECT unnest([0, 1, 2, 3]) AS row_j),
cells AS (
    SELECT row_j, {_SQL_HJ.format(j="row_j", x="item")} % 64 AS col,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM w CROSS JOIN rows_j
    GROUP BY row_j, col
),
probes AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS true_n
           FROM w GROUP BY item),
est AS (
    SELECT p.item, CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS est
    FROM probes p CROSS JOIN rows_j r
    LEFT JOIN cells c
           ON c.row_j = r.row_j
          AND c.col = {_SQL_HJ.format(j="r.row_j", x="p.item")} % 64
    GROUP BY p.item
)
SELECT e.item, e.est, p.true_n
FROM est e JOIN probes p USING (item)
ORDER BY est DESC, item ASC
LIMIT 20
"""


@query(
    "q_cms_heavy_hitters",
    _CMS_SQL,
    doc="Count-Min sketch (Cormode-Muthukrishnan) heavy-hitter report over "
    "corpus tokens: the sketch is a 4x64 integer cell relation built in ONE "
    "explode + partial-agg pass — map-side combine collapses every task to "
    "<= d*w cells, so shuffle volume is #tasks*d*w regardless of corpus "
    "size — then every distinct token's estimate (min over its 4 cells, "
    "never an underestimate) is joined against its true count, top-20. "
    "Portable md5 hash family means the sketch is bit-identical across "
    "engines; the oracle builds the SAME cells in SQL. 'row' deliberately "
    "collides at this width — the over-estimate arm is populated "
    "(operators/sketches.py cms_build/cms_estimate).",
)
def q_cms_heavy_hitters(spark, sf_dir):
    from corsearch_project_spark.operators import sketches as SK

    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("item")
    ).where(F.col("item") != "")
    sk = SK.cms_build(words, depth=4, width=64)
    true = words.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    return (
        SK.cms_estimate(true.select("item"), sk, depth=4, width=64)
        .join(true, "item")
        .select("item", "est", "true_n")
        .orderBy(F.desc("est"), F.asc("item"))
        .limit(20)
    )


_BLOOM_SQL = f"""
WITH k AS (
    SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS item,
           doc_id % 2 = 0 AS actual
    FROM documents
),
hj AS (SELECT unnest([0, 1, 2]) AS j),
bits AS (
    SELECT pos // 32 AS word_idx,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
    FROM (SELECT {_SQL_HJ.format(j="j", x="item")} % 1024 AS pos
          FROM k CROSS JOIN hj WHERE actual)
    GROUP BY word_idx
),
probe AS (
    SELECT item, actual, pos // 32 AS word_idx,
           CAST(1 AS BIGINT) << CAST(pos % 32 AS INT) AS bit
    FROM (SELECT item, actual, {_SQL_HJ.format(j="j", x="item")} % 1024 AS pos
          FROM k CROSS JOIN hj)
),
claimed AS (
    SELECT item, actual,
           CAST(MIN(CASE WHEN (COALESCE(b.bits, 0) & probe.bit) <> 0
                         THEN 1 ELSE 0 END) AS BOOLEAN) AS claimed
    FROM probe LEFT JOIN bits b USING (word_idx)
    GROUP BY item, actual
)
SELECT actual, claimed, CAST(COUNT(*) AS BIGINT) AS n
FROM claimed
GROUP BY actual, claimed
ORDER BY actual, claimed
"""


@query(
    "q_bloom_membership",
    _BLOOM_SQL,
    doc="Bloom-filter crawl-ledger membership census: build a 1024-bit / "
    "3-hash filter over the even-doc_id half of the corpus (one explode + "
    "bit_or partial agg — the OR is both the map-side combiner and the "
    "filter-union merge operator), probe EVERY doc key against the "
    "broadcast filter, and report the (actual, claimed) census. No false "
    "negatives by construction — the (true, false) cell must be absent — "
    "with the documented (1-e^(-kn/m))^k false-positive arm populated. "
    "Portable md5 hash family; words as BIGINTs with 32 bits used, keeping "
    "sign-bit semantics out of the cross-engine contract "
    "(operators/sketches.py bloom_build/bloom_probe).",
)
def q_bloom_membership(spark, sf_dir):
    from corsearch_project_spark.operators import sketches as SK

    d = t(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
    members = d.where(F.col("doc_id") % 2 == 0).select(key.alias("item"))
    bl = SK.bloom_build(members, n_bits=1024, n_hashes=3)
    probes = d.select(
        key.alias("item"), (F.col("doc_id") % 2 == 0).alias("actual")
    )
    claimed = SK.bloom_probe(
        probes.select("item"), bl, n_bits=1024, n_hashes=3
    )
    return (
        claimed.join(probes, "item")
        .groupBy("actual", "claimed")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("actual", "claimed")
    )


# ----------------------------------------------------- k-means clustering

_KM_FD = (
    "(SUM(v) - ((SUM(v) % COUNT(*)) + COUNT(*)) % COUNT(*)) // COUNT(*)"
)


def _km_assign_cte(r: int, cents: str) -> str:
    return f"""
d{r} AS (
  SELECT vec_id, cent_id, SUM((a - b) * (a - b)) AS dist
  FROM (SELECT q.vec_id, c.cent_id, unnest(q.qe) AS a, unnest(c.cqe) AS b
        FROM q CROSS JOIN {cents} c)
  GROUP BY vec_id, cent_id
),
p{r} AS (
  SELECT vec_id, cent_id AS cell, dist FROM (
    SELECT vec_id, cent_id, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cent_id) AS rn
    FROM d{r}) WHERE rn = 1
)"""


def _km_update_cte(r: int) -> str:
    return f"""
c{r + 1} AS (
  SELECT cell AS cent_id, list(val ORDER BY dim) AS cqe FROM (
    SELECT cell, dim, {_KM_FD} AS val
    FROM (SELECT p.cell, unnest(generate_series(1, len(q.qe))) AS dim,
                 unnest(q.qe) AS v
          FROM p{r} p JOIN q USING (vec_id))
    GROUP BY cell, dim
  ) GROUP BY cell
)"""


_KM_ROUNDS = 3

_KMEANS_SQL = (
    """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS qe
  FROM embeddings
),
c0 AS (SELECT vec_id AS cent_id, qe AS cqe FROM q WHERE vec_id % 50 = 0),"""
    + ",".join(
        _km_assign_cte(r, f"c{r}")
        + ("," + _km_update_cte(r) if r < _KM_ROUNDS - 1 else "")
        for r in range(_KM_ROUNDS)
    )
    + f"""
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(dist) AS BIGINT) AS inertia
FROM p{_KM_ROUNDS - 1}
GROUP BY cell ORDER BY cell
"""
)


@query(
    "q_kmeans_cells",
    _KMEANS_SQL,
    doc="deterministic integer k-means (Lloyd, 3 assignment passes / 2 "
    "centroid updates) over the embeddings table — the clustering that "
    "feeds SemDeDup-style curation, data mixing, and the IVF index's "
    "cells. Quantized vectors make squared-L2 exact BIGINT; the argmin is "
    "total-ordered (dist, cent_id); the centroid mean is FLOOR division "
    "via the portable remainder identity (Spark div truncates, DuckDB // "
    "floors — the identity is floor in both), so centroids, cells and "
    "inertias are bit-identical across engines. Per round: broadcast-K "
    "assignment (partial min-struct argmin, one shuffle) + a (cell, dim) "
    "partial agg whose map-side combine caps shuffle volume at "
    "#tasks*K*D. Oracle = the K-round CTE unrolling "
    "(operators/clustering.py kmeans/cluster_census).",
)
def q_kmeans_cells(spark, sf_dir):
    from corsearch_project_spark.operators import clustering as C

    e = t(spark, sf_dir, "embeddings")
    _cents, assigned = C.kmeans(e, stride=50, rounds=_KM_ROUNDS)
    return C.cluster_census(assigned).orderBy("cell")


_SEMDEDUP_SQL = (
    _KMEANS_SQL.rsplit("SELECT cell,", 1)[0]
    + """,
m AS (SELECT p.vec_id, p.cell, q.qe FROM p2 p JOIN q USING (vec_id)),
pr AS (
    SELECT DISTINCT b.vec_id AS vec_id
    FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.qe, b.qe)
                / sqrt(list_inner_product(a.qe, a.qe)
                       * list_inner_product(b.qe, b.qe)), 6) >= 0.35
)
SELECT m.cell, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped
FROM m LEFT JOIN pr USING (vec_id)
GROUP BY m.cell ORDER BY m.cell
"""
)


@query(
    "q_semdedup",
    _SEMDEDUP_SQL,
    doc="SemDeDup (Abbas et al. 2023) curation census: k-means cells "
    "(q_kmeans_cells' exact 3-round Lloyd), then cosine near-dup pairs "
    "ONLY within cells — clustering turns corpus-wide pairwise dedup into "
    "sum-over-cells of bounded self-joins (fan-out <= max cell size; AQE "
    "skew-split covers mega-cells). Deterministic keep rule: a vector "
    "drops iff a smaller-id cell-mate is within cosine >= 0.35 (6-dp "
    "rounded, the engine-wide exact-compare convention). Returns the "
    "per-cell (n, n_dropped) census; every cell's dropped arm is "
    "populated at this corpus (operators/clustering.py semdedup).",
)
def q_semdedup(spark, sf_dir):
    from corsearch_project_spark.operators import clustering as C

    return C.semdedup(
        t(spark, sf_dir, "embeddings"), stride=50, rounds=3, threshold=0.35
    )


_PASSAGES_SQL = """
WITH b AS (
    SELECT doc_id AS doc, string_split(trim(text), ' ') AS ws,
           len(string_split(trim(text), ' ')) AS n
    FROM documents
),
k AS (
    SELECT doc, ws,
           unnest(generate_series(0,
               CASE WHEN n <= 32 THEN 0
                    ELSE (n - 32 + 24 - 1) // 24 END)) AS k
    FROM b WHERE n > 0
)
SELECT doc, CAST(k AS BIGINT) AS chunk_id,
       CAST(k * 24 AS BIGINT) AS start_tok,
       CAST(len(ws[k * 24 + 1 : k * 24 + 32]) AS BIGINT) AS n_tokens,
       array_to_string(ws[k * 24 + 1 : k * 24 + 32], ' ') AS passage
FROM k
"""


@query(
    "q_passage_chunks",
    _PASSAGES_SQL,
    doc="sliding passage windows (32 tokens, stride 24) over every "
    "document — the overlapping chunk shape retrieval/embedding pipelines "
    "index; chunk k covers [k*stride, k*stride+chunk), last window clamps "
    "at the doc end, every token lands in >= 1 window. ZERO shuffles: the "
    "sequence+explode fan-out and the slice/join projection both live "
    "inside the scan, so the op inherits the input partitioning at any "
    "scale (operators/textstats.py sliding_passages).",
)
def q_passage_chunks(spark, sf_dir):
    from corsearch_project_spark.operators import textstats as X

    return X.sliding_passages(
        t(spark, sf_dir, "documents"), chunk=32, stride=24
    )


_DRIFT_SQL = """
WITH toks AS (
    SELECT doc_id % 2 = 0 AS in_a,
           unnest(string_split(trim(text), ' ')) AS tok
    FROM documents
),
tf AS (SELECT * FROM toks WHERE tok <> ''),
a AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_a FROM tf WHERE in_a GROUP BY tok),
b AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_b FROM tf WHERE NOT in_a GROUP BY tok),
tot AS (SELECT (SELECT CAST(SUM(n_a) AS HUGEINT) FROM a) AS tot_a,
               (SELECT CAST(SUM(n_b) AS HUGEINT) FROM b) AS tot_b),
merged AS (
    SELECT COALESCE(a.tok, b.tok) AS tok,
           COALESCE(n_a, 0) AS n_a,
           COALESCE(n_b, 0) AS n_b
    FROM a FULL OUTER JOIN b ON a.tok = b.tok
)
SELECT tok, n_a, n_b,
       CAST((1000000
             * (CAST(n_a AS HUGEINT) * tot_b - CAST(n_b AS HUGEINT) * tot_a)
             * (CAST(n_a AS HUGEINT) * tot_b - CAST(n_b AS HUGEINT) * tot_a))
            // (CAST(n_a + n_b AS HUGEINT) * tot_a * tot_b)
            AS BIGINT) AS chi2_scaled
FROM merged CROSS JOIN tot
ORDER BY chi2_scaled DESC, tok ASC
LIMIT 20
"""


@query(
    "q_token_drift",
    _DRIFT_SQL,
    doc="token-distribution drift between two crawl snapshots (simulated "
    "as the doc_id-parity halves): per-token two-sample chi-square "
    "contribution (a*Nb - b*Na)^2 / ((a+b)*Na*Nb) computed as an "
    "integer-exact micro-scaled DECIMAL(38,0) DIV so the drift ranking is "
    "bit-identical across engines — a float chi-square would tie-break on "
    "ulps. Top-20 drifted tokens. Shape: two vocab-sized partial aggs, "
    "one full-outer vocab join, scalar totals broadcast, "
    "TakeOrderedAndProject; no Python. Overflow envelope + the "
    "right-shift coarsening for 10^12-token snapshots documented in "
    "operators/drift.py.",
)
def q_token_drift(spark, sf_dir):
    from corsearch_project_spark.operators import drift as DR

    d = t(spark, sf_dir, "documents")
    ca = DR.token_counts(d.where(F.col("doc_id") % 2 == 0))
    cb = DR.token_counts(d.where(F.col("doc_id") % 2 == 1))
    return DR.drift_topk(DR.token_drift(ca, cb), k=20)


_HIST_SQL = """
SELECT source,
       CAST(LEAST(n_chars // 512, 7) AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents
GROUP BY source, bin
ORDER BY source, bin
"""


@query(
    "q_length_hist",
    _HIST_SQL,
    doc="per-source doc-length histogram as a mergeable sketch relation "
    "(operators/sketches.py hist_build): equi-width bins over a FIXED "
    "domain (width 512, 8 bins, overflow clamps into the last) so merging "
    "an increment's histogram into the stored one is a groupBy-SUM — the "
    "partial agg IS the merge, same contract as the Count-Min cells. One "
    "shuffle, map-side combine caps task output at |sources|*8 rows "
    "regardless of corpus size; exact mergeability pinned by "
    "tests/test_drift.py.",
)
def q_length_hist(spark, sf_dir):
    from corsearch_project_spark.operators import sketches as SK

    return (
        SK.hist_build(
            t(spark, sf_dir, "documents"),
            "n_chars",
            width=512,
            n_bins=8,
            keys=("source",),
        )
        .orderBy("source", "bin")
    )


def _zorder_sqls():
    """Both engines evaluate the SAME generated interleave expression —
    only the integer-division spelling differs (Spark div, DuckDB //)."""
    from corsearch_project_spark.operators.zorder import quantize_sql, z_key_sql

    def build(div_op):
        qs = [
            quantize_sql("n_chars", 0, 4096, 12, div_op),
            quantize_sql("doc_id", 0, 4096, 12, div_op),
        ]
        return z_key_sql(qs, 12)

    return build("div"), build("//")


_Z_SPARK, _Z_DUCK = _zorder_sqls()

_ZORDER_SQL = f"""
SELECT doc_id, n_chars, CAST({_Z_DUCK} AS BIGINT) AS zkey
FROM documents
ORDER BY zkey ASC, doc_id ASC
LIMIT 64
"""


@query(
    "q_zorder_key",
    _ZORDER_SQL,
    doc="Z-order (Morton) clustering key over (n_chars, doc_id): clamp + "
    "integer-div quantization to 12 bits each, then an UNROLLED "
    "shift/mask bit interleave generated ONCE and evaluated verbatim by "
    "both engines (only the div spelling differs) — bit-identical keys, "
    "no floats, no Python, a single codegen projection. The layout "
    "operator behind multi-column data skipping: files sorted by this "
    "key carry tight min/max manifest bounds in EVERY interleaved column "
    "(Delta OPTIMIZE ZORDER BY / Iceberg z-transform analogue); the "
    "measured pruning win is pinned in tests/test_zorder.py "
    "(operators/zorder.py).",
)
def q_zorder_key(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "n_chars",
            F.expr(f"CAST({_Z_SPARK} AS BIGINT)").alias("zkey"),
        )
        .orderBy(F.asc("zkey"), F.asc("doc_id"))
        .limit(64)
    )


# ------------------------------------------------ HyperLogLog census

def _sql_hll_distinct() -> str:
    from corsearch_project_spark.queries.textsim import SQL_PHASH, SQL_WORDS, _sql_shingles

    ph = SQL_PHASH.format(s="g")
    return f"""
    WITH wt AS (SELECT lang, {SQL_WORDS} AS w FROM documents),
    gr AS (SELECT lang, unnest({_sql_shingles(2)}) AS g FROM wt),
    hb AS (
        SELECT lang, h % 256 AS bucket, (h - (h % 256)) // 256 AS r
        FROM (SELECT lang, {ph} AS h FROM gr)
    ),
    rk AS (
        SELECT lang, bucket,
               CASE WHEN r = 0 THEN 25
                    ELSE 24 - len(bin(r)) + 1 END AS rank
        FROM hb
    ),
    regs AS (SELECT lang, bucket, MAX(rank) AS reg FROM rk GROUP BY 1, 2),
    agg AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_present,
               CAST(SUM(CAST(power(2, 50 - reg) AS BIGINT)) AS BIGINT) AS s
        FROM regs GROUP BY 1
    ),
    est0 AS (
        SELECT lang, 256 - n_present AS v,
               s + (256 - n_present) * 1125899906842624 AS ssc
        FROM agg
    ),
    est1 AS (
        SELECT lang, v,
               5.2999162811336204e+19 / CAST(ssc AS DOUBLE) AS e_raw
        FROM est0
    ),
    est AS (
        SELECT lang,
               round(CASE WHEN e_raw <= 640.0 AND v > 0
                          THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE))
                          ELSE e_raw END, 4) AS est_distinct
        FROM est1
    ),
    ex AS (SELECT lang, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_exact
           FROM gr GROUP BY 1)
    SELECT est.lang, est.est_distinct, ex.n_exact
    FROM est JOIN ex ON est.lang = ex.lang
    """


@query(
    "q_hll_distinct",
    _sql_hll_distinct(),
    doc="HyperLogLog distinct-bigram census per language vs the exact "
    "count — the third mergeable sketch beside Count-Min and Bloom, same "
    "relation contract (register table whose partial agg IS the merge; "
    "register-wise MAX for increments). Portable rank = 24 - bitwidth + 1 "
    "with bitwidth = len(binary string) in both engines; harmonic sum "
    "kept exact as Σ 2^(50-reg) BIGINT; the one double division (plus one "
    "ln on the linear-counting branch) uses inlined literal constants so "
    "neither engine re-derives them. Shuffle ≤ #tasks×256 per group "
    "regardless of corpus size (operators/sketches.py hll_registers).",
)
def q_hll_distinct(spark, sf_dir):
    from corsearch_project_spark.operators.dedup import word_shingles
    from corsearch_project_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    d = t(spark, sf_dir, "documents")
    grams = d.select(
        "lang", F.explode(word_shingles(F.col("text"), 2)).alias("g")
    )
    est = hll_estimate(hll_registers(grams, "g", ("lang",)), ("lang",))
    exact = grams.groupBy("lang").agg(
        F.countDistinct("g").alias("n_exact")
    )
    return est.join(exact, "lang")
