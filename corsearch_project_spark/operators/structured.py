"""Structured page content — JSON-LD entities and HTML tables, pure JVM.

Brand-monitoring and training-data pipelines both mine pages for the
machine-readable content embedded NEXT TO the prose: schema.org JSON-LD
blocks (``<script type="application/ld+json">``) carry typed entities
(Product / Organization / Article — exactly the objects a
corsearch-style brand watch tracks), and ``<table>`` markup carries the
spec sheets / price grids that plain boilerplate-stripped text mangles
into word soup. Both extractors here are narrow ``Column`` projections
over the raw html — Catalyst fuses them into the scan stage, zero
Python, zero shuffle — so a single pass over the pages table can emit
prose (webextract/htmlx), metadata (operators/pagemeta), link edges
(operators/linkgraph), AND structured entities.

Subset contract (documented, test-pinned, same policy as pagemeta):
conventional attribute order and double-quoted values for the script
tag; bare ``<table>``/``<tr>``/``<td>``/``<th>`` tags (attribute-carrying
variants belong in the Python-kernel extractor, not the codegen fast
path). JSON payloads are parsed by the engine's native JSON path
evaluator (``get_json_object`` — JVM, codegen-adjacent), not Python.

Scale shape (10^12 pages): ``jsonld_entities`` explodes one row per
embedded block (small constant per page) and every downstream census is
one partial-agg shuffle on (host, type); ``table_stats`` never explodes
at all — rows/cells are counted inside array lambdas (``aggregate``)
within the projection, so the operator adds no stage to whatever job it
rides on.

Reference basis: BASELINE.json:6 (config-driven extraction of typed
content from web pages); schema.org JSON-LD is the public embedding
convention (W3C JSON-LD 1.1, Google structured-data guidelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from corsearch_project_spark.operators.linkgraph import url_host

# One capture group: the raw JSON payload. (?s) so payloads may contain
# newlines; non-greedy so back-to-back blocks split correctly.
JSONLD_PATTERN = r'(?s)<script type="application/ld\+json">(.*?)</script>'

TABLE_PATTERN = r"(?s)<table>(.*?)</table>"
TR_PATTERN = r"(?s)<tr>(.*?)</tr>"
CELL_PATTERN = r"(?s)<t[dh]>(.*?)</t[dh]>"


def jsonld_payloads(html: Column) -> Column:
    """Raw JSON-LD payload strings in document order — array<string>."""
    return F.regexp_extract_all(html, F.lit(JSONLD_PATTERN), F.lit(1))


def jsonld_entities(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, jtype, name) — one row per embedded JSON-LD entity.

    ``jtype`` is the top-level ``@type`` and ``name`` the top-level
    ``name``, both '' when the payload omits them (Article blocks use
    ``headline``, kept out of scope for the codegen path on purpose) or
    when the payload is malformed JSON — a crawl-robustness guarantee:
    a broken block yields an empty-typed row, never a task failure.
    Spark's JSON path needs bracket form for the @-key
    (``$['@type']``); dotted ``$.name`` is portable.
    """
    e = pages.select(
        F.col(url_col).alias("url"),
        F.explode(jsonld_payloads(F.col(html_col))).alias("j"),
    )
    return e.select(
        "url",
        F.coalesce(F.get_json_object("j", "$['@type']"), F.lit("")).alias(
            "jtype"
        ),
        F.coalesce(F.get_json_object("j", "$.name"), F.lit("")).alias("name"),
    )


def jsonld_type_census(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, jtype, n_entities, n_names) — what entity types a host
    publishes and how many distinct names they carry: the brand-watch
    rollup (a host suddenly publishing 10k distinct Product names is a
    storefront — or a counterfeit mill). One partial-agg shuffle on the
    (host, jtype) key; distinct-name counting rides the same shuffle via
    partial aggregation."""
    ent = jsonld_entities(pages, url_col, html_col)
    return (
        ent.select(url_host(F.col("url")).alias("host"), "jtype", "name")
        .groupBy("host", "jtype")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entities"),
            F.countDistinct("name").cast("long").alias("n_names"),
        )
    )


def tables_cells(html: Column) -> Column:
    """tables -> rows -> cells as array<array<array<string>>> — pure
    codegen nested ``transform``s, no explode. Ragged rows survive (each
    row keeps its own cell count); cell text is the raw inner markup
    byte-range (entity unescaping is the Python kernel's job)."""
    return F.transform(
        F.regexp_extract_all(html, F.lit(TABLE_PATTERN), F.lit(1)),
        lambda tb: F.transform(
            F.regexp_extract_all(tb, F.lit(TR_PATTERN), F.lit(1)),
            lambda row: F.regexp_extract_all(
                row, F.lit(CELL_PATTERN), F.lit(1)
            ),
        ),
    )


def table_stats(
    pages: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, n_tables, n_rows, n_cells, header) per page.

    Counts are folded inside array lambdas (``F.aggregate``) so the
    operator stays a single projection — no explode, no shuffle, no
    Python. ``header`` is the first table's first row joined with '|'
    ('' for table-less pages): the cheap signal that routes spec-sheet
    tables (header row names attributes) away from layout tables.
    ``F.get`` (0-based) is used for the first-row probe because it is
    NULL-safe out of range even under ANSI mode, unlike element_at.
    """
    tc = tables_cells(F.col(html_col))
    zero = F.lit(0).cast("long")
    n_rows = F.aggregate(tc, zero, lambda acc, tb: acc + F.size(tb))
    n_cells = F.aggregate(
        tc,
        zero,
        lambda acc, tb: acc
        + F.aggregate(tb, zero, lambda a, row: a + F.size(row)),
    )
    header = F.coalesce(
        F.array_join(F.get(F.get(tc, 0), 0), "|"), F.lit("")
    )
    return pages.select(
        F.col(id_col),
        F.size(tc).cast("long").alias("n_tables"),
        n_rows.alias("n_rows"),
        n_cells.alias("n_cells"),
        header.alias("header"),
    )


def table_kv(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, key, value) — spec-sheet relation from exactly-2-cell rows.

    The classic product-attribute shape (``<tr><td>Weight</td><td>2
    kg</td></tr>``): flatten all tables' rows, keep rows with exactly
    two cells, emit (key, value). One explode (per qualifying row), no
    shuffle — downstream censuses decide their own keys."""
    rows = pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.flatten(tables_cells(F.col(html_col)))).alias("cells"),
    ).where(F.size("cells") == 2)
    return rows.select(
        "url",
        F.col("cells")[0].alias("key"),
        F.col("cells")[1].alias("value"),
    )


# --------------------------------------------------------- image assets

IMG_TAG_PATTERN = r"<img [^>]*>"
SRC_PATTERN = r'src="([^"]*)"'
SRCSET_PATTERN = r'srcset="([^"]*)"'


def image_assets(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, asset) — one row per referenced image asset URL.

    Covers both ``src`` and every ``srcset`` candidate (comma-separated
    ``url [descriptor]`` pairs; the descriptor is split off at the first
    space after trimming, per the HTML srcset microsyntax). Pure-codegen
    pull: full-tag match, per-tag re-extract inside lambdas, flatten,
    one explode. Empty srcset entries and src-less tags drop out.

    This is the multimodal crawl frontier's source relation: distinct
    absolute asset urls anti-joined against the fetched set become the
    image fetch plan, exactly the page-url frontier shape (C23) over a
    different asset class.
    """
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(IMG_TAG_PATTERN), F.lit(0)
    )
    per_tag = F.transform(
        tags,
        lambda tg: F.array_append(
            F.transform(
                F.split(F.regexp_extract(tg, SRCSET_PATTERN, 1), ","),
                lambda c: F.substring_index(F.trim(c), " ", 1),
            ),
            F.regexp_extract(tg, SRC_PATTERN, 1),
        ),
    )
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(F.flatten(per_tag)).alias("asset"),
        )
        .where(F.col("asset") != "")
    )


def image_asset_census(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, n_refs, n_assets, n_offsite) — per-host image footprint.

    n_refs counts asset references, n_assets distinct asset urls (the
    fetch workload), n_offsite distinct assets hosted elsewhere (CDN /
    hotlink split — the politeness planner budgets those against the
    CDN's host, not the page's). One partial-agg shuffle on host;
    distinct counting rides the same shuffle."""
    a = image_assets(pages, url_col, html_col)
    page_host = url_host(F.col("url"))
    asset_host = url_host(F.col("asset"))
    return (
        a.select(
            page_host.alias("host"),
            F.col("asset"),
            (
                (asset_host != "") & (asset_host != page_host)
            ).alias("offsite"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_refs"),
            F.countDistinct("asset").cast("long").alias("n_assets"),
            F.countDistinct(
                F.when(F.col("offsite"), F.col("asset"))
            ).cast("long").alias("n_offsite"),
        )
    )


# ------------------------------------------------ RSS/Atom feed surface
#
# Feeds are the OTHER discovery channel beside sitemaps (C16): a site's
# <link rel="alternate" type="application/rss+xml"> head tag advertises a
# change stream the re-crawl scheduler (C33) can poll far cheaper than
# re-fetching pages. Discovery reads the already-crawled HTML (zero extra
# IO); entry parsing reads the fetched feed payloads. Both stay in the
# same pure-codegen regime as the JSON-LD/table extractors: full-tag /
# full-block pulls with per-element re-extract inside array lambdas
# (regexp_extract_all is single-group, same two-step as
# linkgraph.anchor_pairs), so Catalyst fuses them into the scan — no
# Python, no shuffle until a census aggregates.
#
# Subset contract (test-pinned, same policy as the rest of this module):
# conventional attribute order `rel` then `type` then optional extras
# then `href`, double-quoted values; RSS 2.0 <item> children and Atom
# <entry> children as flat tags without nested markup (<title>, <link>/
# <link href=".."/>, <pubDate>/<updated>). Exotic layouts belong in a
# Python-kernel parser, not the codegen fast path.
#
# Reference basis: BASELINE.json:6 (config-driven typed-content
# extraction); RSS 2.0 (Harvard Berkman spec) and Atom (RFC 4287) are
# public formats.

FEED_LINK_TAG_PATTERN = (
    r'<link rel="alternate" type="application/(?:rss|atom)\+xml"[^>]*>'
)
FEED_TYPE_PATTERN = r"application/(rss|atom)\+xml"
RSS_ITEM_PATTERN = r"(?s)<item>(.*?)</item>"
ATOM_ENTRY_PATTERN = r"(?s)<entry>(.*?)</entry>"


def feed_links(html: Column) -> Column:
    """array<struct<ftype,href>> of advertised feeds — pure codegen.

    ``ftype`` is 'rss' | 'atom' from the MIME type; ``href`` '' when the
    tag omits it (dropped by ``feed_targets``). Stylesheet/canonical
    <link> tags never match (rel="alternate" + feed MIME required)."""
    tags = F.regexp_extract_all(html, F.lit(FEED_LINK_TAG_PATTERN), F.lit(0))
    return F.transform(
        tags,
        lambda tg: F.struct(
            F.regexp_extract(tg, FEED_TYPE_PATTERN, 1).alias("ftype"),
            F.regexp_extract(tg, r'href="([^"]*)"', 1).alias("href"),
        ),
    )


def feed_targets(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, ftype, feed_url) — one row per advertised feed.

    The discovery relation: DISTINCT feed_url anti-joined against the
    fetched set is the feed fetch plan (same frontier shape as C16/C23
    over the feed asset class). Explode of an empty array drops the
    page — feed-less pages cost nothing downstream."""
    f = pages.select(
        F.col(url_col).alias("url"),
        F.explode(feed_links(F.col(html_col))).alias("f"),
    )
    return f.select(
        "url", F.col("f.ftype").alias("ftype"), F.col("f.href").alias("feed_url")
    ).where(F.col("feed_url") != "")


def feed_census(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, ftype, n_pages, n_feeds) — per-host feed advertisement census.

    n_pages counts advertising pages, n_feeds distinct feed urls (the
    poll workload — many pages advertise the same site feed). One
    partial-agg shuffle on (host, ftype)."""
    tgt = feed_targets(pages, url_col, html_col)
    return (
        tgt.select(url_host(F.col("url")).alias("host"), "ftype", "feed_url")
        .groupBy("host", "ftype")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.countDistinct("feed_url").cast("long").alias("n_feeds"),
        )
    )


def feed_kind(xml: Column) -> Column:
    """'rss' | 'atom' | '' root sniff — '' (not an error) for non-feeds."""
    return (
        F.when(xml.contains("<rss"), F.lit("rss"))
        .when(xml.contains("<feed"), F.lit("atom"))
        .otherwise(F.lit(""))
    )


def feed_entries(
    feeds: DataFrame, feed_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, kind, title, link, published) — one row per item/entry.

    RSS items carry <link>text</link> + <pubDate>; Atom entries
    <link href=".."/> + <updated> — the per-kind shapes are resolved by
    CASE over the same exploded block column, so both formats parse in
    ONE projection (no union, one pass over the payload column).
    Non-feed payloads sniff to kind '' with zero blocks — a broken fetch
    yields zero rows, never a task failure. Channel/feed-level <title>
    tags live OUTSIDE the item/entry blocks and are never matched.

    Scale shape: pure projection + explode (fan-out = entries per feed,
    bounded by feed size); a census downstream is one partial-agg
    shuffle. 10^12 feed fetches stream through the scan stage."""
    xml = F.col(xml_col)
    kind = feed_kind(xml)
    blocks = (
        F.when(
            kind == "rss",
            F.regexp_extract_all(xml, F.lit(RSS_ITEM_PATTERN), F.lit(1)),
        )
        .when(
            kind == "atom",
            F.regexp_extract_all(xml, F.lit(ATOM_ENTRY_PATTERN), F.lit(1)),
        )
        .otherwise(F.expr("CAST(array() AS array<string>)"))
    )
    e = feeds.select(
        F.col(feed_col).alias("feed_url"),
        kind.alias("kind"),
        F.explode(blocks).alias("b"),
    )
    b = F.col("b")
    return e.select(
        "feed_url",
        "kind",
        F.regexp_extract(b, r"<title>([^<]*)</title>", 1).alias("title"),
        F.when(
            F.col("kind") == "rss",
            F.regexp_extract(b, r"<link>([^<]*)</link>", 1),
        )
        .otherwise(F.regexp_extract(b, r'<link href="([^"]*)"', 1))
        .alias("link"),
        F.when(
            F.col("kind") == "rss",
            F.regexp_extract(b, r"<pubDate>([^<]*)</pubDate>", 1),
        )
        .otherwise(F.regexp_extract(b, r"<updated>([^<]*)</updated>", 1))
        .alias("published"),
    )
