"""Host-level link-graph construction from raw page HTML — pure JVM.

Web-scale curation uses the link graph as a quality prior (C4/RefinedWeb
host filtering, harmonic-centrality seeds, spam-host isolation), and the
graph must be buildable from the same pages table the extractor reads
without a second parse: anchor extraction here is a single combined regex
over the raw html (``href="..."`` values), not a DOM walk, because the
graph needs only the edge set — malformed markup that the DOM builder
would repair yields the same href byte-ranges either way.

Scale shape (10^12 pages): ``extract_hrefs``/``url_host`` are narrow
codegen projections (zero shuffle, zero Python); ``host_edges`` explodes
to one row per anchor and partial-aggregates on (src_host, dst_host) —
map-side combine absorbs the within-page repeats that dominate real
markup (nav bars repeat the same ~10 targets on every page of a host), so
the shuffle carries edge keys, not anchors. ``host_degrees`` re-shuffles
only the already-aggregated edge relation (|hosts|^2 worst case, ~|edges|
real-world) twice — once per direction — then joins the two tiny degree
relations. Skewed mega-hosts (every page links to facebook.com) are
exactly the AQE skew-join case the session enables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# One capture group: the href attribute value, double-quoted form (the only
# form the synthetic corpus and the oracle twin emit; single-quoted/bare
# attrs would add alternations, not structure).
HREF_PATTERN = r'href="([^"]*)"'
HOST_PATTERN = r"^https?://([^/?#]+)"
# Anchor-scoped variant for the EDGE relation: `<base href>`, `<link
# href>` and hreflang alternates are attribute matches but not links a
# reader can follow, so host_edges must not count them. Case-insensitive
# ((?i) is common to Java regex and RE2, so the DuckDB twin matches).
ANCHOR_HREF_PATTERN = r'(?i)<a\s[^>]*href="([^"]*)"'
# First <base href> tag wins (HTML spec: only the first base element with
# an href is honored); regexp_extract returns the first match.
BASE_HREF_PATTERN = r'(?i)<base\s[^>]*href="([^"]*)"'


def extract_hrefs(html: Column) -> Column:
    """All href values in document order — array<string>, pure codegen."""
    return F.regexp_extract_all(html, F.lit(HREF_PATTERN), F.lit(1))


def url_host(url: Column) -> Column:
    """Lowercased authority of an absolute http(s) URL ('' if relative)."""
    return F.lower(F.regexp_extract(url, HOST_PATTERN, 1))


def extract_anchor_hrefs(html: Column) -> Column:
    """href values of ``<a>`` elements only — array<string>, pure codegen.

    The edge-relation extractor: unlike ``extract_hrefs`` (the bare
    attribute sweep WAT metadata keeps, which also surfaces <link>/<base>
    hrefs), this matches inside anchor tags, so stylesheet and base-URI
    declarations never become graph edges."""
    return F.regexp_extract_all(html, F.lit(ANCHOR_HREF_PATTERN), F.lit(1))


def extract_base_host(html: Column) -> Column:
    """Host of the page's first ``<base href>`` ('' if absent or the base
    href is itself relative — the latter falls back to document-URL
    resolution per the HTML spec, which at host granularity is the page's
    own host)."""
    return url_host(F.regexp_extract(html, BASE_HREF_PATTERN, 1))


def host_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level edge relation.

    Relative/unparseable hrefs resolve against the page's ``<base href>``
    host when one is declared (browser semantics — mirror/CDN-hosted
    pages use base to point relative links at the canonical host), else
    to the page's own host, so every anchor contributes exactly one edge
    and the relation is total. Only ``<a>`` hrefs count (see
    ``extract_anchor_hrefs``).
    """
    src = url_host(F.col(url_col))
    base = extract_base_host(F.col(html_col))
    links = pages.select(
        src.alias("src_host"),
        F.when(base == "", src).otherwise(base).alias("rel_base"),
        F.explode(extract_anchor_hrefs(F.col(html_col))).alias("href"),
    )
    dst = url_host(F.col("href"))
    return (
        links.select(
            "src_host",
            F.when(dst == "", F.col("rel_base")).otherwise(dst).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


# Full opening anchor tag (href first, the pinned subset order) so the
# rel attribute — conventionally written after href — stays in the match.
ANCHOR_OPEN_PATTERN = r'<a href="[^"]*"[^>]*>'
# RE2/Java-portable token-boundary match: "nofollow" as a whole token
# inside the space-separated rel value ("nofollower" must NOT match).
NOFOLLOW_PATTERN = r'rel="([^"]* )?nofollow( [^"]*)?"'


def anchor_rel(html: Column) -> Column:
    """array<struct<href,nofollow>> — anchors with their rel=nofollow bit.

    Same double-quoted-attribute subset as ``extract_hrefs``; the
    nofollow probe is token-boundary-safe (``rel="nofollowed"`` does not
    match). Pure codegen: full-tag pull then per-element re-extract
    inside ``transform`` (paired captures need the two-step, same as
    ``anchor_pairs``).
    """
    tags = F.regexp_extract_all(html, F.lit(ANCHOR_OPEN_PATTERN), F.lit(0))
    return F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, HREF_PATTERN, 1).alias("href"),
            (F.regexp_extract(t, NOFOLLOW_PATTERN, 0) != "").alias(
                "nofollow"
            ),
        ),
    )


def host_edges_rel(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links, n_followed) — nofollow-aware edges.

    rel=nofollow is the publisher's own statement that a link is not an
    endorsement (paid/UGC/spam), so ranking walks (pagerank, HITS) over
    endorsement-gated graphs should weight by ``n_followed``, while
    crawl-discovery keeps ``n_links`` — one relation serves both by
    carrying both counts through the same single partial-agg shuffle as
    ``host_edges``. Relative hrefs resolve to the page's own host; unlike
    ``host_edges`` this variant does NOT honor ``<base href>`` (its
    full-tag pull exists for the rel attribute, and the nofollow censuses
    it feeds are per-source-host, where base redirection is immaterial) —
    so totals reconcile with ``host_edges`` only on base-less corpora.
    """
    src = url_host(F.col(url_col))
    links = pages.select(
        src.alias("src_host"),
        F.explode(anchor_rel(F.col(html_col))).alias("a"),
    )
    dst = url_host(F.col("a.href"))
    return (
        links.select(
            "src_host",
            F.when(dst == "", F.col("src_host"))
            .otherwise(dst)
            .alias("dst_host"),
            (~F.col("a.nofollow")).cast("int").alias("followed"),
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.sum("followed").cast("long").alias("n_followed"),
        )
    )


def host_degrees(edges: DataFrame) -> DataFrame:
    """Per-host degree summary over the edge relation.

    out_hosts / in_hosts are DISTINCT neighbor counts (the graph metric);
    n_out_links / n_in_links are anchor totals (the volume metric). A full
    outer join keeps hosts that only ever appear on one side (pure sinks /
    pure sources).
    """
    out = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_hosts"),
        F.sum("n_links").alias("n_out_links"),
    )
    inn = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_hosts"),
        F.sum("n_links").alias("n_in_links"),
    )
    return (
        out.join(inn, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_hosts", F.lit(0)).cast("long").alias("out_hosts"),
            F.coalesce("in_hosts", F.lit(0)).cast("long").alias("in_hosts"),
            F.coalesce("n_out_links", F.lit(0)).cast("long").alias("n_out_links"),
            F.coalesce("n_in_links", F.lit(0)).cast("long").alias("n_in_links"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping_pct: int = 85,
    scale: int = 10**9,
) -> DataFrame:
    """(host, rank) — deterministic integer PageRank over the edge relation.

    Power iteration with ALL arithmetic in scaled integers (initial rank =
    ``scale`` per host, per-edge contribution = ``(rank * n_links) div
    out_total``, damping/teleport as integer percent math): BIGINT sums
    are associative, so Spark's partial/final aggregation order and a
    sequential SQL engine produce bit-identical ranks — float PageRank
    cannot be cross-engine exact. Floors lose mass deterministically
    (bounded by 1 unit per edge per round), which is irrelevant for the
    curation use (rank ORDER, host quality priors a la C4/RefinedWeb).

    Dangling hosts (appear only as destinations) redistribute their rank
    equally: ``dangling_total div n_hosts`` is added to every host's
    incoming mass before damping.

    Scale shape (10^8 hosts): each round is one equi-join of the rank
    relation (|hosts| rows) against the pre-aggregated edge relation on
    src_host + one partial-agg groupBy on dst_host + one broadcast of the
    1-row dangling aggregate; rank state is localCheckpoint'd per round to
    truncate lineage (same seam as dedup.connected_components). Overflow
    bound: ranks stay ~``scale`` on average; ``damping_pct * total_mass``
    must fit in int64 even under full mass concentration, so at 10^8 hosts
    pass ``scale=10**7`` (1e15 * 85 << 2^63).

    Fixed iteration count (not convergence-tested): the oracle twin is the
    same recurrence unrolled, so both engines run exactly ``iterations``
    rounds.
    """
    edges = edges.localCheckpoint(eager=True)
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_tot = edges.groupBy("src_host").agg(F.sum("n_links").alias("out_total"))
    # 1-row relations, broadcast into every round — no driver collect, the
    # constants stay inside the plan.
    n_hosts = hosts.agg(F.count(F.lit(1)).alias("n_hosts"))
    teleport = ((100 - damping_pct) * scale) // 100

    ranks = hosts.select("host", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src_host == ranks.host)
            .join(out_tot, "src_host")
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(rank * n_links) div out_total").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_sum"))
        )
        dangling = (
            ranks.join(
                out_tot, ranks.host == out_tot.src_host, "left_anti"
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dang_total"))
            .crossJoin(F.broadcast(n_hosts))
            .select(F.expr("dang_total div n_hosts").alias("share"))
        )
        ranks = (
            hosts.join(contrib, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(in_sum, 0) + share))"
                        " div 100"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


# ------------------------------------------------------------ crawl frontier

LOC_PATTERN = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"


def sitemap_locs(xml: Column) -> Column:
    """All <loc> URLs in a sitemap document — array<string>, pure codegen
    (sitemaps are flat XML; a regex pull is the whole parse)."""
    return F.regexp_extract_all(xml, F.lit(LOC_PATTERN), F.lit(1))


def crawl_frontier(sitemaps: DataFrame, crawled: DataFrame,
                   xml_col: str = "xml", url_col: str = "url") -> DataFrame:
    """(host, n_known, n_new) — sitemap-driven frontier discovery.

    Explode every sitemap's locs, dedupe (the same URL appears in many
    sitemap files), LEFT-ANTI join against the crawled url set to find
    never-fetched URLs, and aggregate both populations per host. The
    anti-join is the scale shape: the crawled set is the 10^12-row table,
    so the join must shuffle on url (equi-key), never broadcast the big
    side; the frontier relation afterwards is small. Same resume-anti-join
    pattern as P5 (sources/io.py done_buckets).
    """
    locs = (
        sitemaps.select(F.explode(sitemap_locs(F.col(xml_col))).alias("url"))
        .distinct()
    )
    crawled_urls = crawled.select(F.col(url_col).alias("url")).distinct()
    new = locs.join(crawled_urls, "url", "left_anti").select(
        url_host(F.col("url")).alias("host"),
        F.lit(1).alias("is_new"),
    )
    known = locs.join(crawled_urls, "url", "left_semi").select(
        url_host(F.col("url")).alias("host"),
        F.lit(0).alias("is_new"),
    )
    return (
        new.union(known)
        .groupBy("host")
        .agg(
            F.sum(F.lit(1) - F.col("is_new")).cast("long").alias("n_known"),
            F.sum("is_new").cast("long").alias("n_new"),
        )
    )


# ------------------------------------------------------- robots politeness

WILDCARD_UA = "User-agent: *"
URL_PATH_PATTERN = r"^https?://[^/?#]+(/[^?#]*)?"


def url_path(url: Column) -> Column:
    """Path component of an absolute http(s) URL ('/' if absent)."""
    p = F.regexp_extract(url, URL_PATH_PATTERN, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_rules(robots: Column) -> Column:
    """Wildcard-group rules of a robots.txt — array<struct<path,allow>>.

    RFC 9309 prefix-rule subset (no ``*``/``$`` wildcards): slice the text
    to the ``User-agent: *`` group (up to the next ``User-agent:`` line or
    EOF — named-agent groups like googlebot never leak in), pull
    ``Disallow:``/``Allow:`` values with two case-sensitive regexes
    ('Allow: ' cannot match inside 'Disallow: x'), and drop empty-path
    rules (an empty Disallow value means "no restriction" per the RFC).
    Pure codegen — no Python stage, no shuffle.
    """
    start = F.instr(robots, WILDCARD_UA)
    seg0 = F.substring(robots, start + len(WILDCARD_UA), F.lit(2**30))
    nxt = F.instr(seg0, "User-agent:")
    seg = F.when(start == 0, F.lit("")).otherwise(
        F.when(nxt > 0, F.substring(seg0, F.lit(1), nxt - 1)).otherwise(seg0)
    )

    def rules_of(pattern: str, allow: bool) -> Column:
        return F.transform(
            F.filter(
                F.regexp_extract_all(seg, F.lit(pattern), F.lit(1)),
                lambda p: p != F.lit(""),
            ),
            lambda p: F.struct(
                p.alias("path"), F.lit(allow).alias("allow")
            ),
        )

    return F.concat(
        rules_of(r"Disallow: ([^\n]*)", False),
        rules_of(r"Allow: ([^\n]*)", True),
    )


def robots_verdict(path: Column, rules: Column) -> Column:
    """struct<allowed:boolean, rule_path:string> — longest-match decision.

    Among rules whose path is a prefix of ``path``, the longest wins;
    equal-length ties go to Allow (RFC 9309 §2.2.2). No matching rule →
    allowed with rule_path ''. One fold over the per-host rule array
    (F.aggregate), so the decision is a narrow projection: the only
    shuffle in a crawl-permission pipeline is the urls⋈robots host
    equi-join that delivered the array.
    """
    matching = F.filter(rules, lambda r: F.startswith(path, r["path"]))
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).alias("len"),
            F.lit(True).alias("allow"),
            F.lit("").alias("path"),
        ),
        lambda acc, r: F.when(
            (F.length(r["path"]) > acc["len"])
            | ((F.length(r["path"]) == acc["len"]) & r["allow"]),
            F.struct(
                F.length(r["path"]).alias("len"),
                r["allow"].alias("allow"),
                r["path"].alias("path"),
            ),
        ).otherwise(acc),
    )
    return F.struct(
        best["allow"].alias("allowed"), best["path"].alias("rule_path")
    )


def crawl_permissions(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots",
) -> DataFrame:
    """(url, host, allowed, rule_path) — politeness filter for a frontier.

    ``robots`` holds one row per host (host, robots_txt). Rules are
    pre-parsed into a per-host array (narrow projection), the url relation
    equi-joins on host — LEFT, so hosts with no robots.txt row stay
    crawlable — and the verdict is a fold over the array. At 10^12 urls
    the join shuffles both sides on host (the robots relation is |hosts|
    rows — millions, too big to blanket-broadcast); mega-host skew is the
    AQE skew-join case the session enables. Zero Python stages.
    """
    rules = robots.select(
        F.col(host_col).alias("host"),
        robots_rules(F.col(robots_col)).alias("rules"),
    )
    u = urls.select(
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        url_path(F.col(url_col)).alias("path"),
    )
    v = robots_verdict(
        F.col("path"),
        F.coalesce(F.col("rules"), F.array()),
    )
    return (
        u.join(rules, "host", "left")
        .select("url", "host", v["allowed"].alias("allowed"),
                v["rule_path"].alias("rule_path"))
    )


def robots_crawl_delay(robots: Column, default_s: int = 1) -> Column:
    """Wildcard-group ``Crawl-delay:`` seconds (int, ``default_s`` if
    absent/unparseable). Same group-slice subset as ``robots_rules`` —
    a named agent's delay never leaks into the wildcard decision."""
    start = F.instr(robots, WILDCARD_UA)
    seg0 = F.substring(robots, start + len(WILDCARD_UA), F.lit(2**30))
    nxt = F.instr(seg0, "User-agent:")
    seg = F.when(start == 0, F.lit("")).otherwise(
        F.when(nxt > 0, F.substring(seg0, F.lit(1), nxt - 1)).otherwise(seg0)
    )
    raw = F.regexp_extract(seg, r"Crawl-delay: ([0-9]+)", 1)
    return F.coalesce(
        F.nullif(raw, F.lit("")).cast("int"), F.lit(default_s)
    )


def fetch_plan(
    frontier: DataFrame,
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots",
    default_delay_s: int = 1,
) -> DataFrame:
    """(host, n_new, crawl_delay_s, est_fetch_s) — politeness-bounded
    crawl scheduling.

    Per-host serial fetch time = n_new * crawl-delay (politeness makes
    the per-host queue sequential regardless of cluster size, so the
    wall-clock of a crawl round is max over hosts, not sum — exactly why
    the frontier must be partitioned BY HOST and why one mega-host with a
    large delay dominates a round; this relation is what a scheduler
    splits rounds on). LEFT join keeps robots-less hosts (default
    delay); one small equi-join on host after the frontier agg.
    """
    delays = robots.select(
        F.col(host_col).alias("host"),
        robots_crawl_delay(
            F.col(robots_col), default_s=default_delay_s
        ).alias("crawl_delay_s"),
    )
    return (
        frontier.select("host", "n_new")
        .join(delays, "host", "left")
        .select(
            "host",
            F.col("n_new").cast("long").alias("n_new"),
            F.coalesce(F.col("crawl_delay_s"), F.lit(default_delay_s))
            .alias("crawl_delay_s"),
            (F.col("n_new") * F.coalesce(
                F.col("crawl_delay_s"), F.lit(default_delay_s)
            )).cast("long").alias("est_fetch_s"),
        )
    )


# ---------------------------------------------------------- anchor text

ANCHOR_TAG_PATTERN = r'<a href="[^"]*">[^<]*</a>'


def anchor_pairs(html: Column) -> Column:
    """array<struct<href,text>> of simple anchors — pure codegen.

    Full-tag pull (group 0) then per-element href/text re-extract inside
    ``transform``: regexp_extract_all returns a single group, so paired
    captures need the two-step. Same double-quoted-attribute subset as
    ``extract_hrefs``.
    """
    tags = F.regexp_extract_all(html, F.lit(ANCHOR_TAG_PATTERN), F.lit(0))
    return F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, r'href="([^"]*)"', 1).alias("href"),
            F.trim(
                F.regexp_replace(
                    F.regexp_extract(t, r">([^<]*)<", 1), r"\s+", " "
                )
            ).alias("text"),
        ),
    )


def anchor_text_index(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    top_k: int = 3,
) -> DataFrame:
    """(dst_host, anchor, n, rank) — what OTHER pages' link text calls a
    host; the classic off-page relevance signal (anchor text describes
    the target better than the target describes itself).

    Explode anchors, resolve relative hrefs to the linking page's own
    host (same convention as ``host_edges``), lowercase-normalize the
    text, partial-agg count per (dst_host, anchor), then keep the top-k
    anchors per host by a rank window with (n desc, anchor asc) total
    order. Two shuffles — one agg, one window both keyed on dst_host, so
    AQE's skew handling covers mega-hosts; the window input is the
    already-aggregated (host × distinct-anchor) relation, not the raw
    anchor stream.
    """
    src_host = url_host(F.col(url_col))
    a = pages.select(
        src_host.alias("src_host"),
        F.explode(anchor_pairs(F.col(html_col))).alias("a"),
    ).select(
        "src_host",
        url_host(F.col("a.href")).alias("dst0"),
        F.lower(F.col("a.text")).alias("anchor"),
    ).where(F.col("anchor") != "")
    counted = (
        a.select(
            F.when(F.col("dst0") == "", F.col("src_host"))
            .otherwise(F.col("dst0")).alias("dst_host"),
            "anchor",
        )
        .groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("dst_host").orderBy(
        F.desc("n"), F.asc("anchor")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def frontier_urls(sitemaps: DataFrame, crawled: DataFrame,
                  xml_col: str = "xml", url_col: str = "url") -> DataFrame:
    """(url) — deduped sitemap URLs never fetched (the raw frontier).

    The url-level form of :func:`crawl_frontier` (which aggregates to
    per-host counts): same distinct + LEFT-ANTI equi-join shape, exposed
    separately so a scheduler can run per-url politeness filtering
    (``crawl_permissions``) before counting.
    """
    locs = (
        sitemaps.select(F.explode(sitemap_locs(F.col(xml_col))).alias("url"))
        .distinct()
    )
    crawled_urls = crawled.select(F.col(url_col).alias("url")).distinct()
    return locs.join(crawled_urls, "url", "left_anti")


def hits(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(host, auth, hub) — deterministic integer HITS over the host graph.

    Kleinberg's hubs-and-authorities as UNNORMALIZED integer power
    iteration: auth_r(v) = Σ_{u→v} hub_{r-1}(u), then hub_r(u) =
    Σ_{u→v} auth_r(v) — the classic update order, over the DISTINCT edge
    set (presence, not n_links: multiplicity weighting belongs to
    PageRank's mass model, and unweighted presence bounds growth).
    Skipping the usual L2 normalization keeps every value an exact BIGINT,
    so Spark's partial/final aggregation is bit-identical to a sequential
    engine — same determinism recipe as :func:`pagerank`; HITS scoring is
    only ever used for ORDER (hub/authority ranking), which normalization
    does not change. Overflow bound: values grow by ≤ max_degree per
    half-round, so ``max_degree^(2*iterations) * n_hosts`` must fit in
    int64 — at web scale (10^8 hosts, degree ≤ 10^4) that allows 3
    rounds, exactly the published guidance that HITS ranking stabilizes
    in a handful of iterations.

    Hosts with no in-edges hold auth 0, no out-edges hub 0 (LEFT join +
    coalesce keeps the relation total). Each round: two equi-joins of the
    score relation against the pre-aggregated edge set + two partial-agg
    groupBys; score state localCheckpoint'd per round (lineage
    truncation, the connected-components seam).
    """
    e = edges.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    scores = nodes.select(
        "host",
        F.lit(1).cast("long").alias("auth"),
        F.lit(1).cast("long").alias("hub"),
    ).localCheckpoint(eager=True)

    for _ in range(iterations):
        a = (
            e.join(
                scores.select(F.col("host").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = nodes.join(a, "host", "left").select(
            "host", F.coalesce(F.col("auth"), F.lit(0)).cast("long")
            .alias("auth"),
        )
        h = (
            e.join(
                auth.select(F.col("host").alias("dst"), "auth"), "dst"
            )
            .groupBy(F.col("src").alias("host"))
            .agg(F.sum("auth").alias("hub"))
        )
        scores = (
            auth.join(h, "host", "left")
            .select(
                "host", "auth",
                F.coalesce(F.col("hub"), F.lit(0)).cast("long").alias("hub"),
            )
            .localCheckpoint(eager=True)
        )
    return scores


# ------------------------------------------------------ redirect resolution

def resolve_redirects(
    redirects: DataFrame, max_hops: int = 16
) -> DataFrame:
    """(url, final_url, resolved) — transitive 3xx-chain resolution.

    ``redirects`` is a functional graph (one dst per src: the latest
    fetch's Location header). Resolution is pointer DOUBLING — each round
    LEFT-joins the pointer relation against itself (terminals absorb:
    a pointer whose target has no outgoing edge keeps it), so
    ``ceil(log2(max_hops))`` rounds follow up to ``max_hops`` hops.
    O(log h) shuffles instead of the O(h) of naive iteration — the
    connected-components trick applied to chains. A url still pointing at
    a non-terminal after the cap sits on a cycle (or an over-long chain):
    ``resolved`` false, and a crawler drops it rather than loop.

    At 10^12 urls each round is one equi-join of the pointer relation on
    the pointee — linear shuffle, AQE-skew-safe for mega-targets.
    """
    import math

    f = redirects.select(
        F.col("src").alias("url"), F.col("dst").alias("ptr")
    )
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        nxt = f.select(
            F.col("url").alias("ptr"), F.col("ptr").alias("ptr2")
        )
        f = (
            f.join(nxt, "ptr", "left")
            .select(
                "url", F.coalesce(F.col("ptr2"), F.col("ptr")).alias("ptr")
            )
        )
    srcs = redirects.select(F.col("src").alias("ptr")).distinct()
    return (
        f.join(srcs.withColumn("cyc", F.lit(True)), "ptr", "left")
        .select(
            "url",
            F.col("ptr").alias("final_url"),
            F.coalesce(~F.col("cyc"), F.lit(True)).alias("resolved"),
        )
    )


SITEMAP_DIRECTIVE = r"Sitemap: ([^\n ]+)"


def robots_sitemaps(robots: Column) -> Column:
    """``Sitemap:`` directive URLs — array<string>, pure codegen.

    Per RFC 9309 §2.3 the Sitemap field is NOT group-scoped: it applies
    file-wide regardless of which User-agent block it appears in, so this
    pull deliberately scans the WHOLE text (no wildcard-group slice —
    the opposite scoping of ``robots_rules``). Feeding these into
    ``crawl_frontier``'s sitemap side closes the discovery loop:
    robots -> sitemaps -> frontier -> politeness -> fetch plan.
    """
    return F.regexp_extract_all(robots, F.lit(SITEMAP_DIRECTIVE), F.lit(1))


def recrawl_schedule(
    history: DataFrame,
    scale: int = 1000,
    hot_permille: int = 500,
    cold_permille: int = 0,
) -> DataFrame:
    """Change-rate recrawl scheduling from a per-url fetch history.

    ``history`` has one row per (url, fetch_seq, digest) — the content
    digest each fetch observed (the extraction pipeline's per-url sha256,
    E18, makes this free). A crawler re-visiting 10^12 urls cannot afford
    uniform revisit intervals: the Cho & Garcia-Molina result (TOIT 2003,
    "Estimating frequency of change") is that revisit frequency should
    track each page's observed change rate. This operator computes the
    observed-change statistics and buckets urls into hot/warm/cold tiers:

    - ``n_fetches``     — observations of the url;
    - ``n_changes``     — fetches whose digest differs from the PREVIOUS
      fetch's digest (lag over fetch_seq, not count-distinct: A->B->A is
      two changes, two distinct digests would say one);
    - ``change_permille`` — ``n_changes * scale / (n_fetches - 1)``,
      integer arithmetic so the DuckDB oracle twin is bit-exact (the
      float Poisson MLE -log((n-X+.5)/(n+.5)) orders identically at
      fixed n, so the tier decision is unchanged by the integer form);
    - ``tier`` — 'hot' (>= hot_permille), 'cold' (<= cold_permille, i.e.
      never seen changing), else 'warm'; single-fetch urls have no
      comparison and land in 'new'.

    Scale shape: one window over (url ORDER BY fetch_seq) + the groupBy
    on url — both hash-partition on url, and AQE coalesces; per-url state
    is the fetch count (bounded, ~dozens), never corpus-sized. The tier
    CASE is a narrow codegen projection.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("fetch_seq")
    changed = (
        F.col("digest") != F.lag("digest").over(w)
    ).cast("long")
    per_url = (
        history.select("url", "fetch_seq", "digest")
        .withColumn("chg", F.coalesce(changed, F.lit(0)))
        .groupBy("url")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("chg").alias("n_changes"),
        )
    )
    permille = F.when(
        F.col("n_fetches") > 1,
        (F.col("n_changes") * scale).cast("long")
        / (F.col("n_fetches") - 1),
    ).otherwise(F.lit(None))
    permille = F.floor(permille).cast("long")
    return per_url.select(
        "url",
        "n_fetches",
        "n_changes",
        permille.alias("change_permille"),
        F.when(F.col("n_fetches") <= 1, F.lit("new"))
        .when(permille >= hot_permille, F.lit("hot"))
        .when(permille <= cold_permille, F.lit("cold"))
        .otherwise(F.lit("warm"))
        .alias("tier"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-url crawl-snapshot delta: (url, host, change) with change in
    {'added','removed','changed','unchanged'}.

    The report every recrawl round ends with — what did the web do since
    last time — and the input to S11's merge decisions and C29's
    change-rate estimator. Both sides are (url, digest) relations (the
    extraction pipeline's per-url sha256, E18, so no content re-read);
    the diff is ONE full outer join on url, the null pattern of each
    side classifying the row. At 10^12 urls both sides shuffle on url —
    the same key the tables are already bucketed by (P1), so with
    bucketed inputs this is a zero-exchange sort-merge join; the
    classification is a narrow projection on top."""
    o = old.select(F.col("url"), F.col("digest").alias("old_digest"))
    n = new.select(F.col("url"), F.col("digest").alias("new_digest"))
    joined = o.join(n, "url", "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        "url", url_host(F.col("url")).alias("host"), change.alias("change")
    )


def url_template(url: Column) -> Column:
    """URL path template: query dropped, digit runs collapsed to 'N',
    32+ hex-ish runs to 'H' — `/cal/2026/08/19?sid=x` -> `/cal/N/N/N`.
    Pure codegen; the URL-space analogue of pagemeta.template_hash's
    DOM-shape fingerprint."""
    path = F.regexp_replace(
        F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
        r"[?#].*$", "",
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"[0-9a-fA-F]{32,}", "H")
    return F.regexp_replace(path, r"[0-9]+", "N")


def crawl_traps(urls: DataFrame, min_urls: int = 100,
                max_per_template: int = 50) -> DataFrame:
    """Per-host crawl-trap statistics from the url inventory.

    Calendar pages, session-id links and faceted search generate
    INFINITE url spaces over a handful of path shapes — the classic
    crawler trap. Frontier urls that collapse onto few templates are the
    signature: this operator reports per host (n_urls, n_templates,
    urls_per_template = n_urls div n_templates, top_template,
    top_template_n) so a scheduler can cap per-template fetches (the
    url-space counterpart of the per-domain doc cap, C33).

    Shape: template is a narrow codegen projection; then one
    (host, template) partial agg and one host rollup — same two-shuffle
    pattern as the DOM template census (C21), linear in |urls|."""
    t = urls.select(
        url_host(F.col("url")).alias("host"),
        url_template(F.col("url")).alias("template"),
    )
    per_t = t.groupBy("host", "template").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.desc("n"), F.asc("template")
    )
    ranked = per_t.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("host")
        .agg(
            F.sum("n").alias("n_urls"),
            F.count("*").alias("n_templates"),
            F.max(F.when(F.col("rk") == 1, F.col("template"))).alias("top_template"),
            F.max(F.when(F.col("rk") == 1, F.col("n"))).alias("top_template_n"),
        )
        .select(
            "host", "n_urls",
            F.col("n_templates").cast("long").alias("n_templates"),
            F.expr("n_urls div n_templates").alias("urls_per_template"),
            "top_template",
            F.col("top_template_n").cast("long").alias("top_template_n"),
        )
    )


def paginate_chains(next_edges: DataFrame, max_len: int = 32) -> DataFrame:
    """(url, head_url, pos, chain_len, resolved) — rel=next chain assembly.

    ``next_edges`` is (src, dst): src declares ``<link rel="next">`` dst.
    Multi-page articles must be reassembled before curation (each part
    alone fails quality gates; concatenated they are one document), and
    the chain id IS the head url. Inverting next gives each member ONE
    predecessor pointer, so chain-head resolution is the redirect
    resolver's pointer doubling — here extended to carry DISTANCE: each
    round keeps (url, ptr, d) and the join adds the stepped-over hop
    count (d += d[ptr]), so after ceil(log2(max_len)) rounds ``pos`` is
    the exact offset from the head in O(log L) linear shuffles.

    Heads (members with no inbound next) anchor at pos 0; a member whose
    final pointer is NOT a head sits on a cycle or an over-long chain —
    ``resolved`` false with ('', -1, -1) normalized outputs, exactly the
    redirect resolver's drop-don't-loop policy. chain_len counts
    resolved members per head (one more groupBy + broadcast-size join).
    """
    import math

    src_urls = next_edges.select(F.col("src").alias("url"))
    dst_urls = next_edges.select(F.col("dst").alias("url"))
    members = src_urls.union(dst_urls).distinct()
    heads = members.join(
        dst_urls.distinct(), "url", "left_anti"
    )

    # prev relation: each dst's single predecessor, one hop away. Real
    # markup yields one rel=next per page (src unique), but recrawl
    # duplicates can point two pages at the same next — min(src) keeps
    # the relation functional DETERMINISTICALLY rather than forking the
    # doubling joins.
    f = (
        next_edges.groupBy(F.col("dst").alias("url"))
        .agg(F.min("src").alias("ptr"))
        .withColumn("d", F.lit(1).cast("long"))
    )
    for _ in range(max(1, math.ceil(math.log2(max_len)))):
        nxt = f.select(
            F.col("url").alias("ptr"),
            F.col("ptr").alias("ptr2"),
            F.col("d").alias("d2"),
        )
        f = f.join(nxt, "ptr", "left").select(
            "url",
            F.coalesce(F.col("ptr2"), F.col("ptr")).alias("ptr"),
            (F.col("d") + F.coalesce(F.col("d2"), F.lit(0))).alias("d"),
        )

    head_set = heads.select(F.col("url").alias("ptr")).withColumn(
        "is_head", F.lit(True)
    )
    tails = f.join(head_set, "ptr", "left").select(
        "url",
        F.col("ptr").alias("head_url"),
        F.col("d").alias("pos"),
        F.coalesce(F.col("is_head"), F.lit(False)).alias("resolved"),
    )
    resolved = tails.where("resolved").select("url", "head_url", "pos")
    head_rows = heads.select(
        "url", F.col("url").alias("head_url"), F.lit(0).cast("long").alias("pos")
    )
    ok = resolved.union(head_rows)
    sizes = ok.groupBy("head_url").agg(
        F.count(F.lit(1)).cast("long").alias("chain_len")
    )
    ok_out = ok.join(sizes, "head_url").select(
        "url", "head_url", "pos", "chain_len", F.lit(True).alias("resolved")
    )
    bad = tails.where(~F.col("resolved")).select(
        "url",
        F.lit("").alias("head_url"),
        F.lit(-1).cast("long").alias("pos"),
        F.lit(-1).cast("long").alias("chain_len"),
        F.lit(False).alias("resolved"),
    )
    return ok_out.union(bad)


NEXT_LINK_PATTERN = r'<link rel="next" href="([^"]*)"'


def next_links(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(src, dst) rel=next edges from page markup — scan-fused pull."""
    dst = F.regexp_extract(F.col(html_col), NEXT_LINK_PATTERN, 1)
    return pages.select(
        F.col(url_col).alias("src"), dst.alias("dst")
    ).where(F.col("dst") != "")


def link_spam_features(edges: DataFrame) -> DataFrame:
    """Nepotistic-link features per source host (Fetterly et al. 2004 /
    Davison 2000 'recognizing nepotistic links'): the cheap structural
    signals that separate link farms from organic sites, feeding the
    quality prior alongside C13's PageRank — a host whose outlinks are
    mostly self-links, concentrated on one partner, or fully reciprocated
    is linking for rank, not for readers.

    edges (src_host, dst_host, n_links) ->
      (host, n_out_links, out_hosts, self_permille, top_dst_permille,
       recip_permille)
    where self_permille = self-link anchors / all anchors,
    top_dst_permille = largest single non-self destination's share of
    non-self anchors (link concentration), recip_permille = fraction of
    distinct non-self out-neighbors that link back (the mutual-admiration
    signal). Integer permille (div) for bit-exact oracle twins.

    Plan: three partial aggs keyed src_host over the (already host-level)
    edge relation, plus ONE equi-semi-join of the non-self edges against
    their own reversal on (dst_host, src_host) for reciprocity — linear
    shuffle volume in |edges|; the per-host aggregates joined at the end
    are #hosts-sized, orders smaller than the edge relation.
    """
    src, dst = F.col("src_host"), F.col("dst_host")
    nonself = edges.where(src != dst)
    tot = edges.groupBy(src.alias("host")).agg(
        F.sum("n_links").cast("long").alias("n_out_links")
    )
    agg = nonself.groupBy(src.alias("host")).agg(
        F.sum("n_links").cast("long").alias("total_out"),
        F.count(F.lit(1)).cast("long").alias("out_hosts"),
        F.max("n_links").cast("long").alias("top_dst"),
    )
    reversed_ = nonself.select(
        dst.alias("src_host"), src.alias("dst_host")
    )
    rc = (
        nonself.join(reversed_, ["src_host", "dst_host"], "left_semi")
        .groupBy(src.alias("host"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_recip"))
    )
    j = (
        tot.join(agg, "host", "left")
        .join(rc, "host", "left")
        .select(
            "host",
            "n_out_links",
            F.coalesce("out_hosts", F.lit(0)).cast("long").alias("out_hosts"),
            F.coalesce("total_out", F.lit(0)).alias("total_out"),
            F.coalesce("top_dst", F.lit(0)).alias("top_dst"),
            F.coalesce("n_recip", F.lit(0)).alias("n_recip"),
        )
    )
    return j.select(
        "host",
        "n_out_links",
        "out_hosts",
        F.expr(
            "((n_out_links - total_out) * 1000) div n_out_links"
        ).cast("long").alias("self_permille"),
        F.expr(
            "CASE WHEN total_out > 0 THEN (top_dst * 1000) div total_out "
            "ELSE 0 END"
        ).cast("long").alias("top_dst_permille"),
        F.expr(
            "CASE WHEN out_hosts > 0 THEN (n_recip * 1000) div out_hosts "
            "ELSE 0 END"
        ).cast("long").alias("recip_permille"),
    )


def pdf_link_edges(assets: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) from the PDF assets catalog — the
    document arm of the link graph.

    ``assets`` is the ``doc_assets`` table the extraction pipeline writes
    with ``--with-doc-assets`` (PDF rows carry the links) (url, ..., links: array<struct<page,uri>>):
    /Subtype /Link annotation targets are the ``<a href>`` of documents,
    so they feed the SAME edge relation HTML anchors do. URI actions in
    PDFs are absolute by spec intent; the rare relative target resolves to
    the document's own host, mirroring ``host_edges``. Shape: explode →
    (src, dst) partial agg — one shuffle, identical to the HTML arm, and
    the two relations union by name:

        edges = host_edges(pages).unionByName(pdf_link_edges(assets))
                .groupBy("src_host", "dst_host").agg(F.sum("n_links")...)
    """
    src = url_host(F.col("url"))
    links = assets.select(
        src.alias("src_host"),
        F.explode(F.col("links")).alias("l"),
    ).select("src_host", url_host(F.col("l.uri")).alias("dst"))
    return (
        links.select(
            "src_host",
            F.when(F.col("dst") == "", F.col("src_host"))
            .otherwise(F.col("dst"))
            .alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
