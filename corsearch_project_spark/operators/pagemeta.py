"""HTML head-metadata extraction as pure-codegen columns.

Extraction pipelines need page metadata (title, description, canonical
URL, OpenGraph fields, declared language) long before — and far more
cheaply than — a full DOM parse: metadata feeds crawl dedup
(rel=canonical collapses www/mobile/tracking URL variants), snippet
generation, and language routing. The full extractor (webextract/htmlx)
owns body text; this module owns the head, as narrow ``Column``
projections that stay inside whole-stage codegen — zero Python, zero
shuffle — so metadata can be projected during the same scan that feeds
any downstream operator.

Subset contract (documented, test-pinned): attributes are matched in
their conventional written order (``<meta name=".." content="..">``,
``<link rel="canonical" href="..">``) with double-quoted values — the
same subset `operators/linkgraph.py` pins for hrefs; a permuted-attribute
arm belongs in the Python-kernel extractor, not here. Entity unescaping
covers the five XML built-ins (&amp; &lt; &gt; &quot; &#39;), matching
what head metadata contains in practice; ``&amp;`` is resolved LAST so
``&amp;lt;`` yields the literal ``&lt;`` (double-escape safety).

Scale shape (10^12 pages): every function here is a projection over the
html column — Catalyst fuses them into the scan stage, so adding all six
metadata columns to an extraction job adds no stage, no shuffle, and no
Python boundary. ``canonical_groups`` is the one aggregating operator:
a single partial-agg shuffle on the canonical key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TITLE_PATTERN = r"(?s)<title[^>]*>\s*(.*?)\s*</title>"
META_NAME_PATTERN = r'<meta name="{name}" content="([^"]*)"'
META_PROP_PATTERN = r'<meta property="{prop}" content="([^"]*)"'
CANONICAL_PATTERN = r'<link rel="canonical" href="([^"]*)"'
LANG_PATTERN = r'<html[^>]*\slang="([^"]*)"'


def unescape_entities(col: Column) -> Column:
    """The five XML built-in entities, &amp; last (double-escape safe)."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _norm_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def html_title(html: Column) -> Column:
    """<title> text, entity-unescaped, whitespace-normalized ('' if none)."""
    return unescape_entities(_norm_ws(F.regexp_extract(html, TITLE_PATTERN, 1)))


def meta_content(html: Column, name: str) -> Column:
    """content of <meta name="{name}" ...> ('' if absent)."""
    return unescape_entities(
        F.regexp_extract(html, META_NAME_PATTERN.format(name=name), 1)
    )


def og_content(html: Column, prop: str) -> Column:
    """content of <meta property="og:{prop}" ...> ('' if absent)."""
    return unescape_entities(
        F.regexp_extract(html, META_PROP_PATTERN.format(prop=f"og:{prop}"), 1)
    )


def canonical_url(html: Column) -> Column:
    """href of <link rel="canonical"> ('' if the page declares none)."""
    return F.regexp_extract(html, CANONICAL_PATTERN, 1)


def html_lang(html: Column) -> Column:
    """lang attribute of the <html> tag, lowercased ('' if absent)."""
    return F.lower(F.regexp_extract(html, LANG_PATTERN, 1))


def page_metadata(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, title, description, canonical, og_title, lang) per page.

    One narrow projection — Catalyst keeps it in the scan stage.
    ``canonical`` falls back to the page's own url when undeclared, so it
    is always a usable dedup key.
    """
    h = F.col(html_col)
    return pages.select(
        F.col(url_col).alias("url"),
        html_title(h).alias("title"),
        meta_content(h, "description").alias("description"),
        F.coalesce(
            F.nullif(canonical_url(h), F.lit("")), F.col(url_col)
        ).alias("canonical"),
        og_content(h, "title").alias("og_title"),
        html_lang(h).alias("lang"),
    )


def canonical_groups(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(canonical, n_variants, n_self) — rel=canonical URL consolidation.

    Groups crawled URLs by their declared canonical target: n_variants
    counts distinct crawled urls collapsing onto the target (www/mobile/
    tracking variants), n_self how many of those ARE the target (0 means
    the canonical page itself was never fetched — a frontier candidate).
    Single partial-agg shuffle on the canonical key; map-side combine
    absorbs per-host variant fan-in. Skewed mega-targets are the AQE
    skew-join case the session enables.
    """
    m = page_metadata(pages, url_col=url_col, html_col=html_col)
    return m.groupBy("canonical").agg(
        F.countDistinct("url").cast("long").alias("n_variants"),
        F.sum(
            F.when(F.col("url") == F.col("canonical"), 1).otherwise(0)
        ).cast("long").alias("n_self"),
    )


# ------------------------------------------------------ hreflang alternates

HREFLANG_TAG_PATTERN = (
    r'<link rel="alternate" hreflang="[^"]*" href="[^"]*"'
)


def hreflang_pairs(html: Column) -> Column:
    """array<struct<lang,href>> of declared language alternates — pure
    codegen; same full-tag-pull + per-element re-extract two-step as
    ``linkgraph.anchor_pairs`` (regexp_extract_all is single-group)."""
    tags = F.regexp_extract_all(html, F.lit(HREFLANG_TAG_PATTERN), F.lit(0))
    return F.transform(
        tags,
        lambda t: F.struct(
            F.lower(
                F.regexp_extract(t, r'hreflang="([^"]*)"', 1)
            ).alias("lang"),
            F.regexp_extract(t, r'href="([^"]*)"', 1).alias("href"),
        ),
    )


def hreflang_reciprocity(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, n_alt, n_reciprocal) — hreflang link audit per host.

    An hreflang cluster is only valid when alternates are RECIPROCAL
    (Google's documented requirement: if A lists B, B must list A back,
    else the annotation is ignored) — dangling declarations are the
    classic multilingual-SEO defect and, for a crawler, phantom frontier
    entries. Edge relation (src, dst) from the declared pairs, reciprocity
    via one LEFT SEMI self-join on the reversed key (equi-join on both
    columns — shuffles on the url pair, no cartesian), then a host-keyed
    partial agg. At 10^12 pages the edge relation is ~|alternate links|,
    linear; the semi-join is the same shape as the resume anti-join.
    """
    edges = pages.select(
        F.col(url_col).alias("src"),
        F.explode(hreflang_pairs(F.col(html_col))).alias("a"),
    ).select("src", F.col("a.href").alias("dst"))
    back = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = edges.join(back, ["src", "dst"], "left_semi")
    from corsearch_project_spark.operators.linkgraph import url_host

    n_alt = (
        edges.select(url_host(F.col("src")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_alt"))
    )
    n_rec = (
        recip.select(url_host(F.col("src")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    return n_alt.join(n_rec, "host", "left").select(
        "host",
        "n_alt",
        F.coalesce(F.col("n_reciprocal"), F.lit(0).cast("long"))
        .alias("n_reciprocal"),
    )


# ------------------------------------------------------ template detection

TAG_PATTERN = r"<([a-zA-Z][a-zA-Z0-9]*)"


def tag_sequence(html: Column) -> Column:
    """Opening-tag name sequence, lowercased — array<string>, pure
    codegen. The DOM *shape* with all content stripped: two pages off the
    same template produce the same sequence regardless of their text."""
    return F.transform(
        F.regexp_extract_all(html, F.lit(TAG_PATTERN), F.lit(1)),
        F.lower,
    )


def template_hash(html: Column) -> Column:
    """Portable 32-bit hash of the tag sequence (functions/portable.phash
    over the space-joined names) — the page's template fingerprint."""
    from corsearch_project_spark.functions.portable import phash

    return phash(F.array_join(tag_sequence(html), " "))


def host_templates(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, n_pages, n_templates, top_template_n) — template census.

    A high top_template_n / n_pages ratio marks a template-dominated host
    (catalogs, forums, listings) where per-host boilerplate rules pay off
    most — the statistic that prioritizes which hosts get dedicated
    extraction configs (webextract/rules.py dispatch). Two partial-agg
    shuffles on (host, fingerprint) then host; the fingerprint projection
    itself is scan-fused codegen.
    """
    from corsearch_project_spark.operators.linkgraph import url_host

    per_tpl = (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            template_hash(F.col(html_col)).alias("tpl"),
        )
        .groupBy("host", "tpl")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return per_tpl.groupBy("host").agg(
        F.sum("n").cast("long").alias("n_pages"),
        F.count(F.lit(1)).cast("long").alias("n_templates"),
        F.max("n").cast("long").alias("top_template_n"),
    )


def meta_robots(html: Column) -> Column:
    """Page-level robots directives -> struct(noindex, nofollow).

    robots.txt (RFC 9309, C17) speaks for the HOST; ``<meta
    name="robots">`` speaks for the PAGE, and a crawl pipeline must honor
    both: ``noindex`` pages stay out of the search postings (C19) and
    ``nofollow`` pages contribute no edges to the link graph (C13/C26) —
    ignoring them inflates both with pages their publishers excluded.
    Directive tokens are comma-separated and case-insensitive per
    Google's/Bing's published semantics; ``none`` ≡ ``noindex,nofollow``.
    Pure codegen: one regex pull + lowercase token probes, no Python."""
    content = F.lower(
        F.regexp_extract(
            html, META_NAME_PATTERN.format(name="robots"), 1
        )
    )
    toks = F.transform(F.split(content, ","), lambda t: F.trim(t))
    has = lambda v: F.array_contains(toks, v)  # noqa: E731
    none = has("none")
    return F.struct(
        (none | has("noindex")).alias("noindex"),
        (none | has("nofollow")).alias("nofollow"),
    )


# Soft-404: the server said 200 but the page is an error shell. The
# classic detector (Bar-Yossef et al., WWW 2004 "Sic transit gloria
# telae") probes random non-existent URLs; at corpus scale the cheap
# batch proxy is phrase evidence + a thin body. Phrases are probed on
# the lowercased title AND body so template-cased variants match.
SOFT404_PHRASES = (
    "page not found",
    "404",
    "no longer available",
    "does not exist",
)


def soft404(html: Column, text: Column, max_chars: int = 500) -> Column:
    """Boolean: error-shell evidence (title or body phrase) AND a body
    under ``max_chars`` — both conditions, because '404' alone appears in
    legitimate prose and short pages alone are just stubs. Pure codegen.
    """
    hay = F.lower(F.concat(html_title(html), F.lit(" "), text))
    hit = F.lit(False)
    for p in SOFT404_PHRASES:
        hit = hit | F.contains(hay, F.lit(p))
    return hit & (F.length(text) < max_chars)


def soft404_census(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """(host, n_pages, n_soft404) — per-host error-shell rate.

    Feeds two consumers: the recrawl scheduler (soft-404s are churn, not
    content — deprioritize) and corpus curation (drop them before
    training). One partial-agg shuffle; the flag is a scan-fused
    projection."""
    flag = soft404(F.col(html_col), F.col(text_col))
    return (
        pages.select(F.col(host_col).alias("host"), flag.alias("s"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.sum(F.col("s").cast("int")).cast("long").alias("n_soft404"),
        )
    )


# Publish-date extraction: freshness is a first-class curation and
# recrawl signal, and pages declare it three ways with very different
# trust levels. Priority: explicit article meta > JSON-LD datePublished
# > a /YYYY/MM/ url path segment (the blog convention; month precision
# only). All comparisons stay on ISO-8601 date STRINGS — lexicographic
# order == chronological order, and string handling is bit-identical
# across engines where date parsing is not.
ARTICLE_TIME_PATTERN = (
    r'<meta property="article:published_time" content="([^"]*)"'
)
URL_DATE_PATTERN = r"/((19|20)\d\d)/(\d\d)/"


def publish_date(html: Column, url: Column) -> Column:
    """struct(date, src) — best-effort ISO date + provenance tag.

    src in ('meta', 'jsonld', 'url', 'none'); date is 'YYYY-MM-DD'
    ('YYYY-MM-01' for url-derived month precision, '' when undated).
    The JSON-LD probe takes the FIRST block carrying datePublished
    (filter + get inside the projection — no explode). Pure codegen.
    """
    from corsearch_project_spark.operators.structured import jsonld_payloads

    meta = F.substring(F.regexp_extract(html, ARTICLE_TIME_PATTERN, 1), 1, 10)
    jld_all = F.filter(
        F.transform(
            jsonld_payloads(html),
            lambda p: F.get_json_object(p, "$.datePublished"),
        ),
        lambda d: d.isNotNull(),
    )
    jld = F.substring(F.coalesce(F.get(jld_all, 0), F.lit("")), 1, 10)
    u_year = F.regexp_extract(url, URL_DATE_PATTERN, 1)
    u_month = F.regexp_extract(url, URL_DATE_PATTERN, 3)
    u_date = F.concat(u_year, F.lit("-"), u_month, F.lit("-01"))
    return (
        F.when(
            meta != "",
            F.struct(meta.alias("date"), F.lit("meta").alias("src")),
        )
        .when(
            jld != "",
            F.struct(jld.alias("date"), F.lit("jsonld").alias("src")),
        )
        .when(
            u_year != "",
            F.struct(u_date.alias("date"), F.lit("url").alias("src")),
        )
        .otherwise(
            F.struct(F.lit("").alias("date"), F.lit("none").alias("src"))
        )
    )


def freshness_census(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(host, n_pages, n_meta, n_jsonld, n_url, n_undated, max_date) —
    per-host dating coverage + latest publish date (the recrawl
    scheduler's freshness prior; string max is chronological for ISO
    dates). One partial-agg shuffle; the extraction is scan-fused."""
    pd = publish_date(F.col(html_col), F.col(url_col))
    d = pages.select(
        F.col(host_col).alias("host"),
        pd["date"].alias("date"),
        pd["src"].alias("src"),
    )
    return d.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum((F.col("src") == "meta").cast("int")).cast("long").alias(
            "n_meta"
        ),
        F.sum((F.col("src") == "jsonld").cast("int")).cast("long").alias(
            "n_jsonld"
        ),
        F.sum((F.col("src") == "url").cast("int")).cast("long").alias(
            "n_url"
        ),
        F.sum((F.col("src") == "none").cast("int")).cast("long").alias(
            "n_undated"
        ),
        F.max("date").alias("max_date"),
    )


def heading_tags(html: Column) -> Column:
    """All <h1>-<h6> elements of a page in document order (full tags; the
    caller posexplodes and re-extracts level/text per element — the same
    two-step as anchor_pairs, since regexp_extract_all is single-group).
    Pure codegen; feeds the section outline relation that section-aware
    passage chunking and markdown heading emission consume."""
    return F.expr(
        "regexp_extract_all(html, '<h[1-6][^>]*>.*?</h[1-6]>', 0)"
    )


def heading_outline(
    docs, id_col: str = "url", html_col: str = "html"
):
    """(id, pos, level, heading): the page's section skeleton — one
    posexplode over the scan-fused tag pull, level/text per element,
    whitespace-normalized unescaped text. No shuffle, no Python."""
    ex = docs.select(
        id_col,
        F.posexplode(heading_tags(F.col(html_col))).alias("pos", "tag"),
    )
    return ex.select(
        id_col,
        "pos",
        F.regexp_extract("tag", "^<h([1-6])", 1).cast("int").alias("level"),
        _norm_ws(
            unescape_entities(F.regexp_extract("tag", ">(.*?)</", 1))
        ).alias("heading"),
    )
