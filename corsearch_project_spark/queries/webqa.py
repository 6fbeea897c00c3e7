"""Crawl/corpus QA queries — mojibake, soft-404, image-asset footprint
(operators/textstats.mojibake_*, pagemeta.soft404_*,
structured.image_asset*).

Same synthesis discipline as queries/training.py: deterministic page
HTML/text built from the ``documents`` table with Column expressions and
mirrored in a DuckDB CTE. The sf0.01 documents text is verified
mojibake-free and 48–553 chars long, so the corrupted/long/short arms
are synthesized explicitly rather than assumed.

Cross-engine notes: the mojibake lead-sequence pattern ``(Ã.|Â.|â€.)``
has first-char-disjoint alternatives, so RE2 (DuckDB) and Java regex
(Spark) agree on match count despite different alternation tie rules;
non-overlapping left-to-right scanning is common to both. DuckDB counts
via ``len(regexp_extract_all(..))`` (no regexp_count in 1.x), Spark via
``F.regexp_count``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corsearch_project_spark.queries.base import query, t
from corsearch_project_spark.queries.training import _SQL_HOST


# ------------------------------------------------------ mojibake census

_SQL_MOJIBAKE_DOCS = """
    SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' cafÃ© â€œquotedâ€ Â»'
                WHEN doc_id % 7 = 3
                THEN text || ' naÃ¯ve'
                ELSE text END AS text
    FROM documents
"""


def _mojibake_docs_df(spark, sf_dir):
    did = F.col("doc_id")
    corrupted = (
        F.when(
            did % 7 == 0,
            F.concat(F.col("text"), F.lit(" cafÃ© â€œquotedâ€ Â»")),
        )
        .when(did % 7 == 3, F.concat(F.col("text"), F.lit(" naÃ¯ve")))
        .otherwise(F.col("text"))
    )
    return t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (did % 37).cast("string")).alias("host"),
        corrupted.alias("text"),
    )


@query(
    "q_mojibake",
    f"""
    WITH d AS ({_SQL_MOJIBAKE_DOCS}),
    h AS (
        SELECT host,
               CAST(len(regexp_extract_all(text, '(Ã.|Â.|â€.)'))
                    AS BIGINT) AS hits
        FROM d
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suspect,
           CAST(SUM(hits) AS BIGINT) AS hits_total
    FROM h GROUP BY host
    """,
    doc="Mojibake (double-encoding) QA census: UTF-8-as-Latin-1 leaves "
    "Ã/Â/â€ lead sequences; counting them with any trailer catches the "
    "corruption regardless of which characters were mangled. Per-host "
    "rollup routes bad hosts back through charset re-detection (E2) "
    "instead of shipping corrupted text to training. Scan-fused codegen "
    "projection + one host-keyed partial-agg shuffle; the corpus text is "
    "verified clean so the corrupted arms are synthesized "
    "(operators/textstats.py mojibake_census).",
)
def q_mojibake(spark, sf_dir):
    from corsearch_project_spark.operators.textstats import mojibake_census

    return mojibake_census(_mojibake_docs_df(spark, sf_dir))


# ------------------------------------------------------- soft-404 audit

# Four arms: %11==0 true soft-404 (phrase + short), %11==5 short stub
# without error phrases (NOT flagged), %11==3 long prose that mentions
# 404 (NOT flagged — length gate), else ordinary long pages.
_SQL_SOFT404_PAGES = """
    SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
           CASE WHEN doc_id % 11 = 0
                THEN '<html><head><title>404 Page Not Found</title>'
                     || '</head></html>'
                ELSE '<html><head><title>Doc '
                     || CAST(doc_id AS VARCHAR)
                     || '</title></head></html>' END AS html,
           CASE WHEN doc_id % 11 = 0
                THEN 'The page you requested was not found.'
                WHEN doc_id % 11 = 5
                THEN 'Short stub ' || CAST(doc_id AS VARCHAR)
                WHEN doc_id % 11 = 3
                THEN repeat('lorem ipsum dolor sit amet ', 25)
                     || 'error 404 discussed at length in prose'
                ELSE repeat('lorem ipsum dolor sit amet ', 25)
                     || CAST(doc_id AS VARCHAR) END AS text
    FROM documents
"""


def _soft404_pages_df(spark, sf_dir):
    did = F.col("doc_id")
    filler = F.repeat(F.lit("lorem ipsum dolor sit amet "), 25)
    html = F.when(
        did % 11 == 0,
        F.lit("<html><head><title>404 Page Not Found</title></head></html>"),
    ).otherwise(
        F.concat(
            F.lit("<html><head><title>Doc "),
            did.cast("string"),
            F.lit("</title></head></html>"),
        )
    )
    text = (
        F.when(did % 11 == 0, F.lit("The page you requested was not found."))
        .when(
            did % 11 == 5,
            F.concat(F.lit("Short stub "), did.cast("string")),
        )
        .when(
            did % 11 == 3,
            F.concat(
                filler, F.lit("error 404 discussed at length in prose")
            ),
        )
        .otherwise(F.concat(filler, did.cast("string")))
    )
    return t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (did % 37).cast("string")).alias("host"),
        html.alias("html"),
        text.alias("text"),
    )


_SQL_SOFT404_PHRASES = (
    "(hay LIKE '%page not found%' OR hay LIKE '%404%'"
    " OR hay LIKE '%no longer available%' OR hay LIKE '%does not exist%')"
)


@query(
    "q_soft404",
    f"""
    WITH p AS ({_SQL_SOFT404_PAGES}),
    f AS (
        SELECT host,
               lower(trim(regexp_replace(
                   regexp_extract(html,
                       '<title[^>]*>\\s*(.*?)\\s*</title>', 1),
                   '\\s+', ' ', 'g')) || ' ' || text) AS hay,
               len(text) AS n_chars
        FROM p
    ),
    s AS (
        SELECT host,
               CASE WHEN {_SQL_SOFT404_PHRASES} AND n_chars < 500
                    THEN 1 ELSE 0 END AS soft
        FROM f
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(soft) AS BIGINT) AS n_soft404
    FROM s GROUP BY host
    """,
    doc="Soft-404 audit: servers answering 200 with an error shell "
    "(Bar-Yossef et al. WWW 2004); the batch proxy is phrase evidence in "
    "title+body AND a <500-char body — both gates, since '404' appears "
    "in legitimate prose and short pages alone are stubs. All four arms "
    "synthesized (true soft-404, clean stub, long prose mentioning 404, "
    "ordinary). Scan-fused projection + one host-keyed shuffle; feeds "
    "recrawl deprioritization and corpus curation "
    "(operators/pagemeta.py soft404_census).",
)
def q_soft404(spark, sf_dir):
    from corsearch_project_spark.operators.pagemeta import soft404_census

    return soft404_census(_soft404_pages_df(spark, sf_dir))


# ------------------------------------------------- image-asset footprint

# Every page has an onsite <img src>; every third also references a CDN
# image with a 2-candidate srcset (offsite + onsite candidates), so
# src-only, srcset, onsite and offsite branches all populate. The CDN
# asset repeats across pages of a host (modulus smaller than the page
# modulus) to split n_refs from n_assets.
_SQL_IMG_PAGE = """
    SELECT doc_id,
           'https://h' || CAST(doc_id % 37 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
           '<html><body><img src="/img/a'
               || CAST(doc_id % 13 AS VARCHAR) || '.png">'
               || CASE WHEN doc_id % 3 = 0
                       THEN '<img srcset="https://cdn'
                            || CAST(doc_id % 5 AS VARCHAR)
                            || '.assets.net/b' || CAST(doc_id % 17 AS VARCHAR)
                            || '.jpg 2x, /img/c' || CAST(doc_id % 7 AS VARCHAR)
                            || '.png 1x" src="/img/c'
                            || CAST(doc_id % 7 AS VARCHAR) || '.png">'
                       ELSE '' END
               || '</body></html>' AS html
    FROM documents
"""


def _img_pages_df(spark, sf_dir):
    did = F.col("doc_id")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (did % 37).cast("string"),
            F.lit(".example.com/p/"),
            did.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<html><body><img src="/img/a'),
            (did % 13).cast("string"),
            F.lit('.png">'),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit('<img srcset="https://cdn'),
                    (did % 5).cast("string"),
                    F.lit(".assets.net/b"),
                    (did % 17).cast("string"),
                    F.lit('.jpg 2x, /img/c'),
                    (did % 7).cast("string"),
                    F.lit('.png 1x" src="/img/c'),
                    (did % 7).cast("string"),
                    F.lit('.png">'),
                ),
            ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ).alias("html"),
    )


@query(
    "q_image_assets",
    f"""
    WITH p AS ({_SQL_IMG_PAGE}),
    tags AS (
        SELECT {_SQL_HOST.format(u='url')} AS host,
               unnest(regexp_extract_all(html, '<img [^>]*>')) AS tag
        FROM p
    ),
    a AS (
        SELECT host,
               unnest(list_append(
                   list_transform(
                       string_split(
                           regexp_extract(tag, 'srcset="([^"]*)"', 1), ','),
                       c -> string_split(trim(c), ' ')[1]),
                   regexp_extract(tag, 'src="([^"]*)"', 1))) AS asset
        FROM tags
    ),
    k AS (
        SELECT host, asset,
               {_SQL_HOST.format(u='asset')} AS ahost
        FROM a WHERE asset <> ''
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_refs,
           CAST(COUNT(DISTINCT asset) AS BIGINT) AS n_assets,
           CAST(COUNT(DISTINCT CASE WHEN ahost <> '' AND ahost <> host
                                    THEN asset END) AS BIGINT) AS n_offsite
    FROM k GROUP BY host
    """,
    doc="Per-host image-asset footprint: <img> src plus every srcset "
    "candidate (url-before-first-space per the srcset microsyntax), "
    "parsed inside codegen array lambdas, one explode, one host-keyed "
    "partial-agg shuffle; n_assets is the multimodal fetch workload and "
    "n_offsite the CDN/hotlink split the politeness planner budgets "
    "against the CDN's host. The distinct-asset relation anti-joined "
    "with a fetched set is the image crawl frontier — the page-frontier "
    "shape (C23) over a different asset class "
    "(operators/structured.py image_asset_census).",
)
def q_image_assets(spark, sf_dir):
    from corsearch_project_spark.operators.structured import (
        image_asset_census,
    )

    return image_asset_census(_img_pages_df(spark, sf_dir))


# ---------------------------------------------------- publish-date audit

# Arms by doc_id%4: 0 = article:published_time meta (day precision),
# 1 = JSON-LD datePublished (day precision), 2 = /YYYY/MM/ url path
# (month precision), 3 = undated. Dates derive from doc_id so hosts mix
# sources and max_date is non-trivial.
_SQL_DATE_PARTS = (
    "CAST(2019 + doc_id % 5 AS VARCHAR)",
    "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')",
    "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')",
)

_SQL_DATED_PAGE = f"""
    SELECT doc_id,
           'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
           'https://h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com'
               || CASE WHEN doc_id % 4 = 2
                       THEN '/' || {_SQL_DATE_PARTS[0]} || '/'
                            || {_SQL_DATE_PARTS[1]} || '/post-'
                            || CAST(doc_id AS VARCHAR)
                       ELSE '/p/' || CAST(doc_id AS VARCHAR) END AS url,
           CASE WHEN doc_id % 4 = 0
                THEN '<html><head><meta property="article:published_time"'
                     || ' content="' || {_SQL_DATE_PARTS[0]} || '-'
                     || {_SQL_DATE_PARTS[1]} || '-' || {_SQL_DATE_PARTS[2]}
                     || 'T10:00:00Z"></head></html>'
                WHEN doc_id % 4 = 1
                THEN '<html><head><script type="application/ld+json">'
                     || '{{"@type":"Article","datePublished":"'
                     || {_SQL_DATE_PARTS[0]} || '-' || {_SQL_DATE_PARTS[1]}
                     || '-' || {_SQL_DATE_PARTS[2]}
                     || '"}}</script></head></html>'
                ELSE '<html><head><title>x</title></head></html>' END AS html
    FROM documents
"""


def _dated_pages_df(spark, sf_dir):
    did = F.col("doc_id")
    y = (did % 5 + 2019).cast("string")
    m = F.lpad((did % 12 + 1).cast("string"), 2, "0")
    d = F.lpad((did % 28 + 1).cast("string"), 2, "0")
    url = F.concat(
        F.lit("https://h"),
        (did % 37).cast("string"),
        F.lit(".example.com"),
        F.when(
            did % 4 == 2,
            F.concat(
                F.lit("/"), y, F.lit("/"), m, F.lit("/post-"),
                did.cast("string"),
            ),
        ).otherwise(F.concat(F.lit("/p/"), did.cast("string"))),
    )
    html = (
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(
                    '<html><head><meta property="article:published_time"'
                    ' content="'
                ),
                y, F.lit("-"), m, F.lit("-"), d,
                F.lit('T10:00:00Z"></head></html>'),
            ),
        )
        .when(
            did % 4 == 1,
            F.concat(
                F.lit(
                    '<html><head><script type="application/ld+json">'
                    '{"@type":"Article","datePublished":"'
                ),
                y, F.lit("-"), m, F.lit("-"), d,
                F.lit('"}</script></head></html>'),
            ),
        )
        .otherwise(F.lit("<html><head><title>x</title></head></html>"))
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (did % 37).cast("string")).alias("host"),
        url.alias("url"),
        html.alias("html"),
    )


_SQL_JLD_DATE = (
    "COALESCE(list_filter(list_transform("
    "regexp_extract_all(html,"
    " '<script type=\"application/ld\\+json\">(.*?)</script>', 1),"
    " p -> json_extract_string(p, '$.datePublished')),"
    " x -> x IS NOT NULL)[1], '')"
)


@query(
    "q_publish_dates",
    f"""
    WITH p AS ({_SQL_DATED_PAGE}),
    x AS (
        SELECT host,
               substr(regexp_extract(html,
                   '<meta property="article:published_time"'
                   || ' content="([^"]*)"', 1), 1, 10) AS meta_d,
               substr({_SQL_JLD_DATE}, 1, 10) AS jld_d,
               regexp_extract(url, '/((19|20)\\d\\d)/(\\d\\d)/', 1)
                   AS u_year,
               regexp_extract(url, '/((19|20)\\d\\d)/(\\d\\d)/', 3)
                   AS u_month
        FROM p
    ),
    s AS (
        SELECT host,
               CASE WHEN meta_d <> '' THEN meta_d
                    WHEN jld_d <> '' THEN jld_d
                    WHEN u_year <> ''
                        THEN u_year || '-' || u_month || '-01'
                    ELSE '' END AS date,
               CASE WHEN meta_d <> '' THEN 'meta'
                    WHEN jld_d <> '' THEN 'jsonld'
                    WHEN u_year <> '' THEN 'url'
                    ELSE 'none' END AS src
        FROM x
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(CASE WHEN src = 'meta' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_meta,
           CAST(SUM(CASE WHEN src = 'jsonld' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_jsonld,
           CAST(SUM(CASE WHEN src = 'url' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_url,
           CAST(SUM(CASE WHEN src = 'none' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_undated,
           MAX(date) AS max_date
    FROM s GROUP BY host
    """,
    doc="Publish-date extraction + freshness census: priority chain "
    "article:published_time meta > JSON-LD datePublished (first block "
    "carrying it, filter+get inside the projection — no explode) > "
    "/YYYY/MM/ url path (month precision). All comparisons on ISO "
    "strings (lexicographic == chronological, bit-identical across "
    "engines where date parsing is not); per-host source-coverage "
    "counts + string-max latest date feed the recrawl freshness prior. "
    "Scan-fused codegen + one host shuffle "
    "(operators/pagemeta.py freshness_census).",
)
def q_publish_dates(spark, sf_dir):
    from corsearch_project_spark.operators.pagemeta import freshness_census

    return freshness_census(_dated_pages_df(spark, sf_dir))


# -------------------------------------------------- rel=next pagination

# Four-part series: sid = doc_id div 4, part = doc_id % 4; parts 0-2
# declare rel=next to part+1; in every 25th series part 3 points BACK to
# part 0 (a cycle — no head, whole component unresolved), otherwise part
# 3 ends the chain. An incomplete tail series just yields a shorter
# chain — both engines derive edges from the same synthesis.
# DuckDB quirk pinned by parity: under WITH RECURSIVE, a CTE whose body
# is a top-level UNION loses its dedup (it parses as recursive-union
# syntax even without self-reference), so the member CTE must use an
# explicit SELECT DISTINCT over UNION ALL.
_SQL_PAGED_PAGE = """
    SELECT 'https://s' || CAST(doc_id // 4 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id % 4 AS VARCHAR) AS url,
           CASE WHEN doc_id % 4 < 3
                THEN '<link rel="next" href="https://s'
                     || CAST(doc_id // 4 AS VARCHAR) || '.example.com/p/'
                     || CAST(doc_id % 4 + 1 AS VARCHAR) || '">'
                WHEN (doc_id // 4) % 25 = 0
                THEN '<link rel="next" href="https://s'
                     || CAST(doc_id // 4 AS VARCHAR)
                     || '.example.com/p/0">'
                ELSE '<html></html>' END AS html
    FROM documents
"""


def _paged_pages_df(spark, sf_dir):
    did = F.col("doc_id")
    sid = (did / 4).cast("long")
    part = did % 4
    base = F.concat(
        F.lit("https://s"), sid.cast("string"), F.lit(".example.com/p/")
    )
    html = (
        F.when(
            part < 3,
            F.concat(
                F.lit('<link rel="next" href="'),
                base, (part + 1).cast("string"), F.lit('">'),
            ),
        )
        .when(
            sid % 25 == 0,
            F.concat(
                F.lit('<link rel="next" href="'), base, F.lit('0">'),
            ),
        )
        .otherwise(F.lit("<html></html>"))
    )
    return t(spark, sf_dir, "documents").select(
        F.concat(base, part.cast("string")).alias("url"),
        html.alias("html"),
    )


@query(
    "q_pagination_chains",
    f"""
    WITH RECURSIVE p AS ({_SQL_PAGED_PAGE}),
    e AS (
        SELECT url AS src,
               regexp_extract(html, '<link rel="next" href="([^"]*)"', 1)
                   AS dst
        FROM p
        WHERE regexp_extract(html,
                  '<link rel="next" href="([^"]*)"', 1) <> ''
    ),
    m AS (
        SELECT DISTINCT url FROM (
            SELECT src AS url FROM e UNION ALL SELECT dst FROM e)
    ),
    heads AS (
        SELECT url FROM m WHERE url NOT IN (SELECT dst FROM e)
    ),
    walk AS (
        SELECT url AS head_url, url, 0 AS pos FROM heads
        UNION ALL
        SELECT w.head_url, e.dst, w.pos + 1
        FROM walk w JOIN e ON e.src = w.url
    ),
    sizes AS (
        SELECT head_url, COUNT(*) AS chain_len FROM walk GROUP BY 1
    )
    SELECT w.url, w.head_url,
           CAST(w.pos AS BIGINT) AS pos,
           CAST(s.chain_len AS BIGINT) AS chain_len,
           TRUE AS resolved
    FROM walk w JOIN sizes s USING (head_url)
    UNION ALL
    SELECT m.url, '' AS head_url,
           CAST(-1 AS BIGINT) AS pos, CAST(-1 AS BIGINT) AS chain_len,
           FALSE AS resolved
    FROM m WHERE m.url NOT IN (SELECT url FROM walk)
    """,
    doc="rel=next pagination-chain assembly: multi-page articles must be "
    "reassembled before curation (parts alone fail quality gates; the "
    "chain head IS the document id). Inverted next edges give each "
    "member one predecessor pointer; DISTANCE-carrying pointer doubling "
    "(d += d[ptr] each round) resolves head + exact position in "
    "O(log L) linear shuffles — the redirect resolver's trick extended "
    "with offsets. Cycles (no head) normalize to ('', -1, -1, false), "
    "the drop-don't-loop policy; oracle is the DuckDB recursive-CTE "
    "walk from heads (operators/linkgraph.py paginate_chains).",
)
def q_pagination_chains(spark, sf_dir):
    from corsearch_project_spark.operators.linkgraph import (
        next_links, paginate_chains,
    )

    return paginate_chains(next_links(_paged_pages_df(spark, sf_dir)))


# --------------------------------------------------- mirror-host census

# Deterministic host/digest relation: every doc lives on h{doc_id%7};
# doc_id%4==0 docs are mirrored onto m{doc_id%7} (the true-mirror arm,
# ~18 shared digests per (h_k, m_k) pair), doc_id%4==1 docs give the m
# hosts PRIVATE digests so containment lands mid-scale instead of a
# constant 1000; doc_id%50==0 docs scatter onto x{doc_id%3} (sub-
# threshold pairs, pinning the min_shared filter); and a 'common0'
# digest lands on all seven h hosts (> cap 4), pinning the vendor-
# default-page drop BEFORE pairing.
_SQL_MIRROR_DOCS = """
    SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
           'c' || CAST(doc_id AS VARCHAR) AS digest
    FROM documents
    UNION ALL
    SELECT 'm' || CAST(doc_id % 7 AS VARCHAR),
           'c' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 4 = 0
    UNION ALL
    SELECT 'm' || CAST(doc_id % 7 AS VARCHAR),
           'priv' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 4 = 1
    UNION ALL
    SELECT 'x' || CAST(doc_id % 3 AS VARCHAR),
           'c' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 50 = 0
    UNION ALL
    SELECT 'h' || CAST(doc_id % 7 AS VARCHAR), 'common0'
    FROM documents WHERE doc_id % 10 = 0
"""


def _mirror_docs_df(spark, sf_dir):
    did = F.col("doc_id")
    d = t(spark, sf_dir, "documents")
    h = F.concat(F.lit("h"), (did % 7).cast("string"))
    m = F.concat(F.lit("m"), (did % 7).cast("string"))
    c = F.concat(F.lit("c"), did.cast("string"))
    base = d.select(h.alias("host"), c.alias("digest"))
    mirrored = d.where(did % 4 == 0).select(m.alias("host"), c.alias("digest"))
    private = d.where(did % 4 == 1).select(
        m.alias("host"),
        F.concat(F.lit("priv"), did.cast("string")).alias("digest"),
    )
    scatter = d.where(did % 50 == 0).select(
        F.concat(F.lit("x"), (did % 3).cast("string")).alias("host"),
        c.alias("digest"),
    )
    common = d.where(did % 10 == 0).select(
        h.alias("host"), F.lit("common0").alias("digest")
    )
    return base.unionAll(mirrored).unionAll(private).unionAll(scatter).unionAll(common)


@query(
    "q_mirror_hosts",
    f"""
    WITH p AS ({_SQL_MIRROR_DOCS}),
    hd AS (SELECT DISTINCT host, digest FROM p),
    capped AS (
        SELECT host, digest FROM (
            SELECT host, digest,
                   COUNT(*) OVER (PARTITION BY digest) AS nh
            FROM hd
        ) WHERE nh <= 4
    ),
    sizes AS (SELECT host, COUNT(*) AS nd FROM capped GROUP BY host),
    pairs AS (
        SELECT a.host AS host_a, b.host AS host_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM capped a JOIN capped b
          ON a.digest = b.digest AND a.host < b.host
        GROUP BY 1, 2
        HAVING COUNT(*) >= 3
    )
    SELECT host_a, host_b, n_shared,
           CAST((n_shared * 1000) // least(sa.nd, sb.nd) AS BIGINT)
               AS overlap_permille
    FROM pairs
    JOIN sizes sa ON pairs.host_a = sa.host
    JOIN sizes sb ON pairs.host_b = sb.host
    """,
    doc="mirror-host detection (Bharat & Broder WWW'99 shape): host "
    "pairs serving many byte-identical documents are one site behind "
    "two names — crawl one, skip the other, and collapse both before "
    "per-domain caps (a mirrored site otherwise gets 2x its cap). One "
    "partial-agg distinct on (host, digest); per-digest host counts "
    "ride the same keying and digests on > cap hosts (vendor default "
    "pages — quadratic pair fan-out, zero mirroring signal) drop "
    "BEFORE pairing, so the digest self-join fans out at most C(cap,2) "
    "pairs per digest — linear shuffle volume. Containment permille "
    "(shared * 1000 div smaller host's corpus) via integer div keeps "
    "the oracle bit-exact (operators/dedup.py mirror_hosts).",
)
def q_mirror_hosts(spark, sf_dir):
    from corsearch_project_spark.operators.dedup import mirror_hosts

    return mirror_hosts(
        _mirror_docs_df(spark, sf_dir),
        min_shared=3,
        max_hosts_per_digest=4,
    )


# ---------------------------------------------- wordlist blocklist census

# Placeholder vocabulary: the engine ships NO embedded word list (lists
# are deployment policy); the fixture exercises the machinery with two
# invented tokens. Arms: single hit, mixed-case double hit, second term,
# and a 'zorblaxes' near-miss pinning the \b whole-word boundary. URL
# arms: exact blocked host, subdomain (blocked), 'notbad.' prefix that
# must NOT match (suffix discipline), clean hosts.
_BL_TERMS = ("zorblax", "quuxad")
_BL_DOMAINS = ("bad.site.example",)

_SQL_BLOCKLIST_DOCS = """
    SELECT doc_id,
           'https://' || CASE WHEN doc_id % 13 = 0 THEN 'bad.site.example'
                WHEN doc_id % 13 = 1 THEN 'sub.bad.site.example'
                WHEN doc_id % 13 = 2 THEN 'notbad.site.example'
                ELSE 'ok' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                END || '/p/' || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 9 = 0 THEN text || ' zorblax'
                WHEN doc_id % 9 = 3 THEN text || ' Zorblax noted zorblax.'
                WHEN doc_id % 9 = 6 THEN text || ' quuxad'
                WHEN doc_id % 9 = 1 THEN text || ' zorblaxes'
                ELSE text END AS text
    FROM documents
"""


def _blocklist_docs_df(spark, sf_dir):
    did = F.col("doc_id")
    host = (
        F.when(did % 13 == 0, F.lit("bad.site.example"))
        .when(did % 13 == 1, F.lit("sub.bad.site.example"))
        .when(did % 13 == 2, F.lit("notbad.site.example"))
        .otherwise(
            F.concat(F.lit("ok"), (did % 7).cast("string"),
                     F.lit(".example.com"))
        )
    )
    text = (
        F.when(did % 9 == 0, F.concat(F.col("text"), F.lit(" zorblax")))
        .when(did % 9 == 3,
              F.concat(F.col("text"), F.lit(" Zorblax noted zorblax.")))
        .when(did % 9 == 6, F.concat(F.col("text"), F.lit(" quuxad")))
        .when(did % 9 == 1, F.concat(F.col("text"), F.lit(" zorblaxes")))
        .otherwise(F.col("text"))
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 did.cast("string")).alias("url"),
        text.alias("text"),
    )


@query(
    "q_blocklist",
    f"""
    WITH p AS ({_SQL_BLOCKLIST_DOCS}),
    h AS (
        SELECT doc_id,
               regexp_replace(lower(regexp_extract(url,
                   '^https?://([^/?#]+)', 1)), ':\\d+$', '') AS host,
               text
        FROM p
    ),
    v AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text),
                   '\\b(?:quuxad|zorblax)\\b')) AS BIGINT) AS term_hits,
               (host = 'bad.site.example'
                OR ends_with(host, '.bad.site.example')) AS url_blocked
        FROM h
    )
    SELECT doc_id, term_hits, url_blocked,
           (term_hits = 0 AND NOT url_blocked) AS keep
    FROM v
    """,
    doc="C4-style blocklist curation (Raffel et al. 2020 badwords drop "
    "+ RefinedWeb URL blocklist): whole-word case-insensitive term "
    "hits via ONE alternation regex compiled into the plan (no "
    "broadcast, no Python), host-suffix domain blocking via the "
    "literal-suffix discipline of functions/psl.py; keep = zero hits "
    "AND unblocked host, a pushed predicate downstream. The engine "
    "ships no embedded vocabulary — lists are deployment policy; the "
    "fixture's invented tokens pin \\b boundaries (zorblaxes near-"
    "miss), mixed case, and the notbad. suffix negative "
    "(operators/textstats.py blocklist_census).",
)
def q_blocklist(spark, sf_dir):
    from corsearch_project_spark.operators.textstats import blocklist_census

    return blocklist_census(
        _blocklist_docs_df(spark, sf_dir), _BL_TERMS, _BL_DOMAINS
    )


# ------------------------------------------------ Unicode script census

# Arms: Latin-dominant base text with appended foreign snippets (counts
# populated, dominance unchanged), pure-script replacements (dominance
# branches for han/kana/hangul), and a digits-only row (scripted 0 ->
# 'none'). Ranges come from operators/textstats.SCRIPT_RANGES — the SQL
# twin is GENERATED from the same tuple, so the two engines can never
# drift on a range edit.
_SCRIPT_ARMS = (
    (0, " привет мир тест"),        # cyrillic counts
    (1, " γειά σου κόσμος"),        # greek counts
    (2, " مرحبا بالعالم"),          # arabic counts
    (3, " שלום עולם"),              # hebrew counts
    (4, " नमस्ते दुनिया"),            # devanagari counts
    (5, " 你好世界测试文本"),        # han counts under latin dominance
)
_SCRIPT_REPLACE = (
    (6, "完全是中文的文本内容这里没有拉丁字母"),   # dominant han
    (7, "これはかなテキストです"),                # dominant kana
    (8, "한국어 텍스트 문서입니다"),              # dominant hangul
    (9, "1234567890 555 ---"),                    # scripted 0 -> none
)


def _script_docs_sql() -> str:
    appended = " ".join(
        f"WHEN doc_id % 11 = {m} THEN text || '{s}'" for m, s in _SCRIPT_ARMS
    )
    replaced = " ".join(
        f"WHEN doc_id % 11 = {m} THEN '{s}'" for m, s in _SCRIPT_REPLACE
    )
    return (
        "SELECT doc_id, CASE " + appended + " " + replaced
        + " ELSE text END AS text FROM documents"
    )


def _script_count_sql(col: str, rng: str) -> str:
    return (
        f"CAST(length({col}) - length(regexp_replace({col}, '[{rng}]', '', 'g'))"
        " AS BIGINT)"
    )


def _script_oracle_sql() -> str:
    from corsearch_project_spark.operators.textstats import SCRIPT_ORDER, SCRIPT_RANGES

    counts = ", ".join(
        _script_count_sql("text", rng) + f" AS n_{name}"
        for name, rng in SCRIPT_RANGES
    )
    names = ", ".join(f"n_{n}" for n in SCRIPT_ORDER)
    total = " + ".join(f"n_{n}" for n in SCRIPT_ORDER)
    # DuckDB greatest() + first-wins CASE chain replicates the Spark
    # tie-break (earlier script in SCRIPT_ORDER wins ties)
    dom = " ".join(
        f"WHEN n_{n} = greatest({names}) AND greatest({names}) > 0 THEN '{n}'"
        for n in SCRIPT_ORDER
    )
    return f"""
    WITH p AS ({_script_docs_sql()}),
    c AS (SELECT doc_id, {counts} FROM p)
    SELECT doc_id, {names},
           CAST({total} AS BIGINT) AS scripted_chars,
           CASE {dom} ELSE 'none' END AS dominant_script,
           CAST(CASE WHEN {total} > 0
                THEN (greatest({names}) * 1000) // ({total})
                ELSE 0 END AS BIGINT) AS dominant_permille
    FROM c
    """


def _script_docs_df(spark, sf_dir):
    did = F.col("doc_id")
    expr = None
    for m, s in _SCRIPT_ARMS:
        clause = (did % 11 == m, F.concat(F.col("text"), F.lit(s)))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    for m, s in _SCRIPT_REPLACE:
        expr = expr.when(did % 11 == m, F.lit(s))
    return t(spark, sf_dir, "documents").select(
        "doc_id", expr.otherwise(F.col("text")).alias("text")
    )


@query(
    "q_script_census",
    _script_oracle_sql(),
    doc="Unicode writing-system census: per-doc character counts over "
    "nine explicit code-point ranges (raw ranges, NOT \\p{Script} — "
    "Java regex and RE2 spell script classes differently, ranges mean "
    "the same thing in both), dominant script by greatest() with "
    "fixed-priority tie-break, winner share as integer permille of "
    "scripted chars. The structural signal the stopword-marker lang_id "
    "cannot give: separates ru/el/ar/he/hi vs zh/ja/ko text and flags "
    "mixed-script SEO spam. Pure stacked projections, collapsed into "
    "the scan by Catalyst — no shuffle, no Python; the oracle SQL is "
    "GENERATED from the same SCRIPT_RANGES tuple "
    "(operators/textstats.py script_census).",
)
def q_script_census(spark, sf_dir):
    from corsearch_project_spark.operators.textstats import script_census

    return script_census(_script_docs_df(spark, sf_dir))
