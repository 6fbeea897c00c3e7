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
