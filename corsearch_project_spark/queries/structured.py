"""Structured-content queries — JSON-LD census, nofollow-gated edges,
HTML table extraction (operators/structured.py, linkgraph.anchor_rel).

Same synthesis discipline as queries/training.py: page HTML is built
deterministically from the ``documents`` table with Column expressions,
and the oracle mirrors the construction in a DuckDB CTE, so the driver's
value-hash compares real extraction work, not fixture luck.

Cross-engine notes pinned here (prototyped before implementation):
  * JSON path to an @-key is ``$['@type']`` on Spark but ``$."@type"``
    on DuckDB — both return NULL for missing keys/malformed JSON, which
    COALESCEs to ''.
  * Nested list lambdas (tables -> rows -> cells) are
    ``transform``/``aggregate`` on Spark and ``list_transform``/
    ``list_sum`` on DuckDB; DuckDB ``list_sum`` returns NULL on empty
    lists and widens to HUGEINT, so the oracle wraps
    ``CAST(COALESCE(..) AS BIGINT)``.

Reference basis: BASELINE.json:6 (typed content extraction);
schema.org/W3C JSON-LD 1.1 and rel=nofollow (RFC-less but
Google-documented since 2005) are public conventions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corsearch_project_spark.queries.base import query, t
from corsearch_project_spark.queries.training import _SQL_HOST


# ------------------------------------------------- JSON-LD entity census

# doc_id%4 picks the entity type (3 => no block at all); doc_id%6==0 adds
# a second, name-less BreadcrumbList block so multi-block pages and the
# ''-name branch both exist. Article uses headline (not name) on purpose:
# the top-level-name-absent branch of the extractor.
_SQL_JSONLD_PAGE = """
    SELECT doc_id,
           'https://h' || CAST(doc_id % 37 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
           '<html><head>'
               || CASE doc_id % 4
                  WHEN 0 THEN '<script type="application/ld+json">'
                      || '{"@type":"Product","name":"Brand '
                      || CAST(doc_id % 23 AS VARCHAR) || '"}</script>'
                  WHEN 1 THEN '<script type="application/ld+json">'
                      || '{"@type":"Organization","name":"Org '
                      || CAST(doc_id % 11 AS VARCHAR) || '"}</script>'
                  WHEN 2 THEN '<script type="application/ld+json">'
                      || '{"@type":"Article","headline":"A '
                      || CAST(doc_id AS VARCHAR) || '"}</script>'
                  ELSE '' END
               || CASE WHEN doc_id % 6 = 0
                       THEN '<script type="application/ld+json">'
                            || '{"@type":"BreadcrumbList"}</script>'
                       ELSE '' END
               || '</head><body>x</body></html>' AS html
    FROM documents
"""


def _jsonld_pages_df(spark, sf_dir):
    did = F.col("doc_id")
    block = (
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit('<script type="application/ld+json">'),
                F.lit('{"@type":"Product","name":"Brand '),
                (did % 23).cast("string"),
                F.lit('"}</script>'),
            ),
        )
        .when(
            did % 4 == 1,
            F.concat(
                F.lit('<script type="application/ld+json">'),
                F.lit('{"@type":"Organization","name":"Org '),
                (did % 11).cast("string"),
                F.lit('"}</script>'),
            ),
        )
        .when(
            did % 4 == 2,
            F.concat(
                F.lit('<script type="application/ld+json">'),
                F.lit('{"@type":"Article","headline":"A '),
                did.cast("string"),
                F.lit('"}</script>'),
            ),
        )
        .otherwise(F.lit(""))
    )
    extra = F.when(
        did % 6 == 0,
        F.lit(
            '<script type="application/ld+json">'
            '{"@type":"BreadcrumbList"}</script>'
        ),
    ).otherwise(F.lit(""))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (did % 37).cast("string"),
            F.lit(".example.com/p/"),
            did.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("<html><head>"), block, extra,
            F.lit("</head><body>x</body></html>"),
        ).alias("html"),
    )


@query(
    "q_jsonld_types",
    f"""
    WITH p AS ({_SQL_JSONLD_PAGE}),
    e AS (
        SELECT {_SQL_HOST.format(u='url')} AS host,
               unnest(regexp_extract_all(html,
                   '<script type="application/ld\\+json">(.*?)</script>', 1))
                   AS j
        FROM p
    ),
    ent AS (
        SELECT host,
               COALESCE(json_extract_string(j, '$."@type"'), '') AS jtype,
               COALESCE(json_extract_string(j, '$.name'), '') AS name
        FROM e
    )
    SELECT host, jtype,
           CAST(COUNT(*) AS BIGINT) AS n_entities,
           CAST(COUNT(DISTINCT name) AS BIGINT) AS n_names
    FROM ent GROUP BY host, jtype
    """,
    doc="schema.org JSON-LD entity census per host: explode embedded "
    "ld+json blocks (pure-codegen regex pull), JVM JSON-path @type/name "
    "(engine-native evaluator, no Python), one partial-agg shuffle on "
    "(host, jtype) with distinct-name counting riding the same shuffle. "
    "The brand-watch rollup — a host publishing thousands of distinct "
    "Product names is a storefront. Multi-block pages, name-less blocks "
    "(Article/BreadcrumbList) and block-less pages all populated "
    "(operators/structured.py jsonld_type_census).",
)
def q_jsonld_types(spark, sf_dir):
    from corsearch_project_spark.operators.structured import (
        jsonld_type_census,
    )

    return jsonld_type_census(_jsonld_pages_df(spark, sf_dir))


# --------------------------------------------- nofollow-gated host edges

# Anchor k (k=1,2) targets host (doc_id*7+k)%37 like the training-corpus
# anchors; (doc_id+k)%3==0 marks it nofollow, so every (src,dst) edge
# group mixes followed and nofollow members across its pages. A relative
# /about anchor keeps the self-edge branch populated (never nofollow).
_SQL_NOFOLLOW_ANCHOR = (
    "'<a href=\"https://h' || CAST((doc_id * 7 + {k}) % 37 AS VARCHAR)"
    " || '.example.com/x/' || CAST(doc_id + {k} AS VARCHAR) || '\"'"
    " || CASE WHEN (doc_id + {k}) % 3 = 0 THEN ' rel=\"nofollow\"'"
    "         ELSE '' END || '>t{k}</a>'"
)

_sql_tag_href_host = _SQL_HOST.format(
    u="regexp_extract(tag, 'href=\"([^\"]*)\"', 1)"
)

_SQL_NOFOLLOW_PAGE = f"""
    SELECT doc_id,
           'https://h' || CAST(doc_id % 37 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
           '<html><body><a href="/about">About</a>'
               || {_SQL_NOFOLLOW_ANCHOR.format(k=1)}
               || {_SQL_NOFOLLOW_ANCHOR.format(k=2)}
               || '</body></html>' AS html
    FROM documents
"""


def _nofollow_pages_df(spark, sf_dir):
    did = F.col("doc_id")

    def anchor(k: int):
        return F.concat(
            F.lit('<a href="https://h'),
            ((did * 7 + k) % 37).cast("string"),
            F.lit(".example.com/x/"),
            (did + k).cast("string"),
            F.lit('"'),
            F.when((did + k) % 3 == 0, F.lit(' rel="nofollow"')).otherwise(
                F.lit("")
            ),
            F.lit(f">t{k}</a>"),
        )

    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (did % 37).cast("string"),
            F.lit(".example.com/p/"),
            did.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<html><body><a href="/about">About</a>'),
            anchor(1),
            anchor(2),
            F.lit("</body></html>"),
        ).alias("html"),
    )


@query(
    "q_nofollow_edges",
    f"""
    WITH p AS ({_SQL_NOFOLLOW_PAGE}),
    tags AS (
        SELECT {_SQL_HOST.format(u='url')} AS src_host,
               unnest(regexp_extract_all(html,
                   '<a href="[^"]*"[^>]*>')) AS tag
        FROM p
    ),
    a AS (
        SELECT src_host,
               {_sql_tag_href_host}
                   AS dst0,
               CASE WHEN regexp_matches(tag,
                        'rel="([^"]* )?nofollow( [^"]*)?"')
                    THEN 0 ELSE 1 END AS followed
        FROM tags
    )
    SELECT src_host,
           CASE WHEN dst0 = '' THEN src_host ELSE dst0 END AS dst_host,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           CAST(SUM(followed) AS BIGINT) AS n_followed
    FROM a GROUP BY 1, 2
    """,
    doc="rel=nofollow-aware host edges: full-anchor-tag pull keeps the "
    "rel attribute in the match, token-boundary nofollow probe "
    "(nofollower does not match), relative hrefs self-resolve, one "
    "partial-agg shuffle carrying both n_links (crawl discovery) and "
    "n_followed (endorsement weight for pagerank/HITS) — the publisher's "
    "own paid/UGC disclaimer gates ranking without a second parse "
    "(operators/linkgraph.py host_edges_rel).",
)
def q_nofollow_edges(spark, sf_dir):
    from corsearch_project_spark.operators.linkgraph import host_edges_rel

    return host_edges_rel(_nofollow_pages_df(spark, sf_dir))


# ------------------------------------------------- HTML table extraction

# One spec-sheet-shaped table per page: a 2-cell header row, a 2-cell
# data row, an odd-docs ragged 1-cell row; every fifth page adds a second
# 1x1 table. Shapes hit: multi-table, ragged rows, th-vs-td cells.
_SQL_TABLE_PAGE = """
    SELECT doc_id,
           '<html><body><table>'
               || '<tr><th>k' || CAST(doc_id % 5 AS VARCHAR)
               || '</th><th>v</th></tr>'
               || '<tr><td>a' || CAST(doc_id % 7 AS VARCHAR)
               || '</td><td>b' || CAST(doc_id % 3 AS VARCHAR)
               || '</td></tr>'
               || CASE WHEN doc_id % 2 = 1
                       THEN '<tr><td>c</td></tr>' ELSE '' END
               || '</table>'
               || CASE WHEN doc_id % 5 = 0
                       THEN '<table><tr><td>x'
                            || CAST(doc_id % 4 AS VARCHAR)
                            || '</td></tr></table>'
                       ELSE '' END
               || '</body></html>' AS html
    FROM documents
"""


def _table_pages_df(spark, sf_dir):
    did = F.col("doc_id")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("<html><body><table><tr><th>k"),
            (did % 5).cast("string"),
            F.lit("</th><th>v</th></tr><tr><td>a"),
            (did % 7).cast("string"),
            F.lit("</td><td>b"),
            (did % 3).cast("string"),
            F.lit("</td></tr>"),
            F.when(did % 2 == 1, F.lit("<tr><td>c</td></tr>")).otherwise(
                F.lit("")
            ),
            F.lit("</table>"),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit("<table><tr><td>x"),
                    (did % 4).cast("string"),
                    F.lit("</td></tr></table>"),
                ),
            ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ).alias("html"),
    )


@query(
    "q_html_tables",
    f"""
    WITH p AS ({_SQL_TABLE_PAGE}),
    tc AS (
        SELECT doc_id,
               list_transform(
                   regexp_extract_all(html, '<table>(.*?)</table>', 1),
                   tb -> list_transform(
                       regexp_extract_all(tb, '<tr>(.*?)</tr>', 1),
                       r -> regexp_extract_all(
                           r, '<t[dh]>(.*?)</t[dh]>', 1))) AS tabs
        FROM p
    )
    SELECT doc_id,
           CAST(len(tabs) AS BIGINT) AS n_tables,
           CAST(COALESCE(list_sum(list_transform(tabs, tb -> len(tb))), 0)
                AS BIGINT) AS n_rows,
           CAST(COALESCE(list_sum(list_transform(tabs,
                    tb -> COALESCE(list_sum(
                        list_transform(tb, r -> len(r))), 0))), 0)
                AS BIGINT) AS n_cells,
           COALESCE(array_to_string(tabs[1][1], '|'), '') AS header
    FROM tc
    """,
    doc="HTML table extraction stats per page: nested transform/aggregate "
    "lambdas fold tables->rows->cells counts INSIDE one codegen "
    "projection (no explode, no shuffle, no Python); header = first "
    "table's first row joined '|' via NULL-safe 0-based F.get — the "
    "router separating spec-sheet tables from layout tables. Ragged "
    "rows, th/td mix, multi-table and (structurally) table-less shapes "
    "covered (operators/structured.py table_stats).",
)
def q_html_tables(spark, sf_dir):
    from corsearch_project_spark.operators.structured import table_stats

    return table_stats(_table_pages_df(spark, sf_dir))


# ------------------------------------------------ RSS/Atom feed surface

# doc_id%5 picks the advertisement: 0 -> RSS (with a title attribute
# between type and href, exercising the [^>]* extras slot), 1 -> Atom,
# 2 -> BOTH tags, 3/4 -> none. Every page also carries a stylesheet
# <link> decoy that must never match. Pages on the same host advertise
# the SAME site feed url, so n_feeds < n_pages exercises the distinct.
_SQL_FEED_PAGE = """
    SELECT doc_id,
           'https://h' || CAST(doc_id % 37 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
           '<html><head><link rel="stylesheet" href="/s.css">'
               || CASE WHEN doc_id % 5 IN (0, 2)
                  THEN '<link rel="alternate" type="application/rss+xml"'
                       || ' title="RSS" href="https://h'
                       || CAST(doc_id % 37 AS VARCHAR)
                       || '.example.com/feed.xml">'
                  ELSE '' END
               || CASE WHEN doc_id % 5 IN (1, 2)
                  THEN '<link rel="alternate" type="application/atom+xml"'
                       || ' href="https://h' || CAST(doc_id % 37 AS VARCHAR)
                       || '.example.com/atom.xml">'
                  ELSE '' END
               || '</head><body>x</body></html>' AS html
    FROM documents
"""


def _feed_pages_df(spark, sf_dir):
    """Spark twin of _SQL_FEED_PAGE."""
    did = F.col("doc_id")
    host = (did % 37).cast("string")
    rss = F.when(
        (did % 5).isin(0, 2),
        F.concat(
            F.lit('<link rel="alternate" type="application/rss+xml"'
                  ' title="RSS" href="https://h'),
            host, F.lit(".example.com/feed.xml\">"),
        ),
    ).otherwise(F.lit(""))
    atom = F.when(
        (did % 5).isin(1, 2),
        F.concat(
            F.lit('<link rel="alternate" type="application/atom+xml"'
                  ' href="https://h'),
            host, F.lit(".example.com/atom.xml\">"),
        ),
    ).otherwise(F.lit(""))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), host, F.lit(".example.com/p/"),
            did.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<html><head><link rel="stylesheet" href="/s.css">'),
            rss, atom, F.lit("</head><body>x</body></html>"),
        ).alias("html"),
    )


@query(
    "q_feed_discovery",
    f"""
    WITH p AS ({_SQL_FEED_PAGE}),
    tags AS (
        SELECT url,
               unnest(regexp_extract_all(html,
                   '<link rel="alternate"'
                   || ' type="application/(?:rss|atom)\\+xml"[^>]*>',
                   0)) AS tg
        FROM p
    ),
    f AS (
        SELECT {_SQL_HOST.format(u='url')} AS host,
               regexp_extract(tg, 'application/(rss|atom)\\+xml', 1)
                   AS ftype,
               regexp_extract(tg, 'href="([^"]*)"', 1) AS feed_url
        FROM tags
    )
    SELECT host, ftype,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(COUNT(DISTINCT feed_url) AS BIGINT) AS n_feeds
    FROM f WHERE feed_url <> ''
    GROUP BY host, ftype
    """,
    doc="RSS/Atom feed discovery census: advertised-feed <link> tags "
    "pulled from crawled HTML heads (full-tag pull + per-tag re-extract "
    "inside array lambdas — pure codegen, fused into the scan), exploded "
    "to (url, ftype, feed_url), one partial-agg shuffle on (host, ftype). "
    "n_feeds counts DISTINCT feed urls — the poll workload the re-crawl "
    "scheduler (C33) budgets, far smaller than advertising-page count. "
    "Stylesheet <link> decoys on every page pin selectivity; both-tags "
    "pages populate rss and atom rows; feed-less pages cost nothing "
    "(operators/structured.py feed_links/feed_census).",
)
def q_feed_discovery(spark, sf_dir):
    from corsearch_project_spark.operators.structured import feed_census

    return feed_census(_feed_pages_df(spark, sf_dir))


# doc_id%3 picks the payload: 0 -> RSS 2.0 (1 item, +1 when doc_id%2=0;
# channel-level <title> outside the items must never match), 1 -> Atom
# (1 entry, +1 when doc_id%4=1), 2 -> an HTML non-feed (kind '' -> zero
# rows, the broken-fetch robustness branch).
_SQL_FEED_XML = """
    SELECT doc_id,
           'https://h' || CAST(doc_id % 37 AS VARCHAR)
               || '.example.com/feed/' || CAST(doc_id AS VARCHAR)
               AS feed_url,
           CASE doc_id % 3
           WHEN 0 THEN
               '<rss version="2.0"><channel><title>Site '
               || CAST(doc_id % 37 AS VARCHAR) || '</title>'
               || '<item><title>Post ' || CAST(doc_id AS VARCHAR)
               || '-1</title><link>https://h'
               || CAST(doc_id % 37 AS VARCHAR) || '.example.com/p/'
               || CAST(doc_id AS VARCHAR) || '/1</link>'
               || '<pubDate>2026-01-'
               || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
               || '</pubDate></item>'
               || CASE WHEN doc_id % 2 = 0 THEN
                   '<item><title>Post ' || CAST(doc_id AS VARCHAR)
                   || '-2</title><link>https://h'
                   || CAST(doc_id % 37 AS VARCHAR) || '.example.com/p/'
                   || CAST(doc_id AS VARCHAR) || '/2</link>'
                   || '<pubDate>2026-01-'
                   || lpad(CAST(doc_id % 27 + 2 AS VARCHAR), 2, '0')
                   || '</pubDate></item>'
                  ELSE '' END
               || '</channel></rss>'
           WHEN 1 THEN
               '<feed xmlns="http://www.w3.org/2005/Atom"><title>F'
               || CAST(doc_id % 37 AS VARCHAR) || '</title>'
               || '<entry><title>E ' || CAST(doc_id AS VARCHAR)
               || '-1</title><link href="https://h'
               || CAST(doc_id % 37 AS VARCHAR) || '.example.com/a/'
               || CAST(doc_id AS VARCHAR) || '/1"/>'
               || '<updated>2026-02-'
               || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
               || '</updated></entry>'
               || CASE WHEN doc_id % 4 = 1 THEN
                   '<entry><title>E ' || CAST(doc_id AS VARCHAR)
                   || '-2</title><link href="https://h'
                   || CAST(doc_id % 37 AS VARCHAR) || '.example.com/a/'
                   || CAST(doc_id AS VARCHAR) || '/2"/>'
                   || '<updated>2026-02-'
                   || lpad(CAST(doc_id % 27 + 2 AS VARCHAR), 2, '0')
                   || '</updated></entry>'
                  ELSE '' END
               || '</feed>'
           ELSE '<html><body>not a feed</body></html>'
           END AS xml
    FROM documents
"""


def _feed_xml_df(spark, sf_dir):
    """Spark twin of _SQL_FEED_XML."""
    did = F.col("doc_id")
    host = (did % 37).cast("string")
    ds = did.cast("string")

    def rss_item(k, day):
        return F.concat(
            F.lit("<item><title>Post "), ds, F.lit(f"-{k}</title>"),
            F.lit("<link>https://h"), host, F.lit(".example.com/p/"),
            ds, F.lit(f"/{k}</link><pubDate>2026-01-"),
            F.lpad(day.cast("string"), 2, "0"),
            F.lit("</pubDate></item>"),
        )

    def atom_entry(k, day):
        return F.concat(
            F.lit("<entry><title>E "), ds, F.lit(f"-{k}</title>"),
            F.lit('<link href="https://h'), host, F.lit(".example.com/a/"),
            ds, F.lit(f'/{k}"/><updated>2026-02-'),
            F.lpad(day.cast("string"), 2, "0"),
            F.lit("</updated></entry>"),
        )

    rss = F.concat(
        F.lit('<rss version="2.0"><channel><title>Site '), host,
        F.lit("</title>"),
        rss_item(1, did % 28 + 1),
        F.when(did % 2 == 0, rss_item(2, did % 27 + 2)).otherwise(F.lit("")),
        F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><title>F'), host,
        F.lit("</title>"),
        atom_entry(1, did % 28 + 1),
        F.when(did % 4 == 1, atom_entry(2, did % 27 + 2)).otherwise(
            F.lit("")
        ),
        F.lit("</feed>"),
    )
    xml = (
        F.when(did % 3 == 0, rss)
        .when(did % 3 == 1, atom)
        .otherwise(F.lit("<html><body>not a feed</body></html>"))
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), host, F.lit(".example.com/feed/"), ds
        ).alias("feed_url"),
        xml.alias("xml"),
    )


@query(
    "q_feed_entries",
    f"""
    WITH fx AS ({_SQL_FEED_XML}),
    k AS (
        SELECT feed_url, xml,
               CASE WHEN contains(xml, '<rss') THEN 'rss'
                    WHEN contains(xml, '<feed') THEN 'atom'
                    ELSE '' END AS kind
        FROM fx
    ),
    b AS (
        SELECT feed_url, kind,
               unnest(regexp_extract_all(xml, '(?s)<item>(.*?)</item>', 1))
                   AS blk
        FROM k WHERE kind = 'rss'
        UNION ALL
        SELECT feed_url, kind,
               unnest(regexp_extract_all(xml, '(?s)<entry>(.*?)</entry>', 1))
                   AS blk
        FROM k WHERE kind = 'atom'
    )
    SELECT feed_url, kind,
           regexp_extract(blk, '<title>([^<]*)</title>', 1) AS title,
           CASE WHEN kind = 'rss'
                THEN regexp_extract(blk, '<link>([^<]*)</link>', 1)
                ELSE regexp_extract(blk, 'link href="([^"]*)"', 1)
           END AS link,
           CASE WHEN kind = 'rss'
                THEN regexp_extract(blk, '<pubDate>([^<]*)</pubDate>', 1)
                ELSE regexp_extract(blk, '<updated>([^<]*)</updated>', 1)
           END AS published
    FROM b
    """,
    doc="RSS/Atom feed-entry parsing: root sniff to kind, per-kind block "
    "pull (RSS <item> / Atom <entry>), per-block title/link/published "
    "re-extract resolved by CASE over ONE exploded projection — both "
    "formats parse in a single pass, pure codegen, no Python. "
    "Channel-level <title> tags sit outside the blocks and never match; "
    "non-feed payloads sniff to '' and yield zero rows (broken fetches "
    "are data, not task failures). Multi-item, single-item, and "
    "non-feed branches all populated "
    "(operators/structured.py feed_kind/feed_entries).",
)
def q_feed_entries(spark, sf_dir):
    from corsearch_project_spark.operators.structured import feed_entries

    return feed_entries(_feed_xml_df(spark, sf_dir))


# ------------------------------------------------- heading outline

# Synthesis arms: every page gets an attributed <h1>; doc_id%2==0 adds two
# <h2> parts (one carrying an entity to exercise unescape); doc_id%4==0
# nests an <h3> between them; a <p> decoy containing the literal text
# 'h2 level' must never match. Same construction both engines.
_SQL_OUTLINE_PAGE = """
    SELECT doc_id,
           'https://h' || CAST(doc_id % 37 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
           '<html><body><h1 class="t">Doc ' || CAST(doc_id AS VARCHAR)
               || '</h1><p>not a h2 level tag</p>'
               || CASE WHEN doc_id % 2 = 0
                       THEN '<h2>Part A &amp; intro</h2>'
                            || CASE WHEN doc_id % 4 = 0
                                    THEN '<h3>Sub '
                                         || CAST(doc_id % 5 AS VARCHAR)
                                         || '</h3>'
                                    ELSE '' END
                            || '<h2>Part B ' || CAST(doc_id % 7 AS VARCHAR)
                            || '</h2>'
                       ELSE '' END
               || '</body></html>' AS html
    FROM documents
"""


def _outline_pages_df(spark, sf_dir):
    did = F.col("doc_id")
    h2s = F.when(
        did % 2 == 0,
        F.concat(
            F.lit("<h2>Part A &amp; intro</h2>"),
            F.when(
                did % 4 == 0,
                F.concat(
                    F.lit("<h3>Sub "), (did % 5).cast("string"),
                    F.lit("</h3>"),
                ),
            ).otherwise(F.lit("")),
            F.lit("<h2>Part B "), (did % 7).cast("string"), F.lit("</h2>"),
        ),
    ).otherwise(F.lit(""))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (did % 37).cast("string"),
            F.lit(".example.com/p/"), did.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<html><body><h1 class="t">Doc '), did.cast("string"),
            F.lit("</h1><p>not a h2 level tag</p>"), h2s,
            F.lit("</body></html>"),
        ).alias("html"),
    )


from corsearch_project_spark.queries.training import _SQL_UNESC  # noqa: E402


@query(
    "q_html_outline",
    f"""
    WITH p AS ({_SQL_OUTLINE_PAGE}),
    tg0 AS (
        SELECT url,
               regexp_extract_all(html,
                   '<h[1-6][^>]*>.*?</h[1-6]>') AS tags
        FROM p
    ),
    tg AS (
        SELECT url, k - 1 AS pos, tags[k] AS tag
        FROM (SELECT url, tags,
                     unnest(generate_series(1, len(tags))) AS k
              FROM tg0)
    )
    SELECT url, CAST(pos AS INTEGER) AS pos,
           CAST(regexp_extract(tag, '^<h([1-6])', 1) AS INTEGER) AS level,
           trim(regexp_replace({_SQL_UNESC.format(x="regexp_extract(tag, '>(.*?)</', 1)")},
                '\\s+', ' ', 'g')) AS heading
    FROM tg
    """,
    doc="Heading outline (h1-h6 section skeleton in document order): the "
    "structure relation section-aware passage chunking and markdown "
    "heading emission consume. Scan-fused full-tag pull + posexplode + "
    "per-element level/text re-extract (the anchor_pairs two-step — "
    "regexp_extract_all is single-group), entity unescape, ws-normalize; "
    "no shuffle, no Python (operators/pagemeta.py heading_outline).",
)
def q_html_outline(spark, sf_dir):
    from corsearch_project_spark.operators.pagemeta import heading_outline

    return heading_outline(_outline_pages_df(spark, sf_dir))
