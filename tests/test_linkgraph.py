"""Host link-graph operator (operators/linkgraph.py).

The registry-wide parity gate (test_queries.py) cross-checks
q_link_hostgraph against DuckDB on the synthesized anchor corpus; this
file pins the individual pieces on hand-written inputs the synthesis
doesn't produce (multiple anchors per line, single-quoted attrs ignored,
relative-href self-resolution, pure sinks/sources in the degree join)
plus the plan shape.
"""

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators import linkgraph as L

HREF_CASES = [
    # two double-quoted anchors, attribute order irrelevant
    (
        '<a id="x" href="https://a.com/1">A</a><a href="/rel">B</a>',
        ["https://a.com/1", "/rel"],
    ),
    # no anchors
    ("<p>plain</p>", []),
    # href inside other markup text is still an attribute match (regex
    # extraction is deliberately DOM-free: the graph needs byte-ranges,
    # not tree repair)
    ('<link href="https://cdn.b.com/app.css">', ["https://cdn.b.com/app.css"]),
    # empty href value survives as ''
    ('<a href="">self</a>', [""]),
]


@pytest.mark.parametrize("html,want", HREF_CASES)
def test_extract_hrefs(spark, html, want):
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(L.extract_hrefs(F.col("html")).alias("h")).head()["h"]
    assert got == want, f"{html!r}: got {got!r}"


@pytest.mark.parametrize(
    "url,want",
    [
        ("https://WWW.Ex.COM/a/b?q=1", "www.ex.com"),
        ("http://h1.example.com", "h1.example.com"),
        ("/relative/path", ""),
        ("mailto:x@y.com", ""),
        ("https://h.com:8443/p", "h.com:8443"),
    ],
)
def test_url_host(spark, url, want):
    df = spark.createDataFrame([(url,)], "url string")
    assert df.select(L.url_host(F.col("url")).alias("h")).head()["h"] == want


def test_host_edges_and_degrees(spark):
    rows = [
        # a.com -> b.com twice (nav repeat), -> itself via relative href
        ("https://a.com/1", '<a href="https://b.com/x">1</a><a href="/rel">s</a>'),
        ("https://a.com/2", '<a href="https://b.com/y">2</a>'),
        # b.com -> a.com once; c.com is a pure source, b.com a near-sink
        ("https://b.com/1", '<a href="https://a.com/z">3</a>'),
        ("https://c.com/1", '<a href="https://a.com/w">4</a>'),
        # d.com has no anchors at all: absent from the edge relation
        ("https://d.com/1", "<p>no links</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in L.host_edges(pages).collect()
    }
    assert edges == {
        ("a.com", "b.com"): 2,
        ("a.com", "a.com"): 1,
        ("b.com", "a.com"): 1,
        ("c.com", "a.com"): 1,
    }
    deg = {r["host"]: r for r in L.host_degrees(L.host_edges(pages)).collect()}
    assert set(deg) == {"a.com", "b.com", "c.com"}
    a = deg["a.com"]
    # out: {b.com, a.com}; in: {a.com, b.com, c.com}
    assert (a["out_hosts"], a["in_hosts"], a["n_out_links"], a["n_in_links"]) == (
        2, 3, 3, 3,
    )
    c = deg["c.com"]  # pure source
    assert (c["out_hosts"], c["in_hosts"], c["n_out_links"], c["n_in_links"]) == (
        1, 0, 1, 0,
    )


def test_extraction_is_pure_projection(spark):
    """Anchor extraction + host mapping must stay narrow codegen: no
    shuffle, no Python stage before the edge groupBy."""
    df = spark.range(10).select(
        F.concat(F.lit("https://h"), F.col("id").cast("string"), F.lit(".com/p")).alias("url"),
        F.concat(
            F.lit('<a href="https://t'),
            F.col("id").cast("string"),
            F.lit('.com/x">l</a>'),
        ).alias("html"),
    )
    proj = df.select(
        L.url_host(F.col("url")).alias("src"),
        L.extract_hrefs(F.col("html")).alias("hrefs"),
    )
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan, plan


def test_pagerank_matches_reference_integer_recurrence(spark):
    """Exact check against an independent pure-Python implementation of
    the same integer recurrence, on a graph with a pure sink (dangling
    host 's' — its mass must redistribute) and a self-loop."""
    rows = [
        ("a", "b", 2),
        ("a", "a", 1),
        ("b", "a", 1),
        ("c", "a", 1),
        ("a", "s", 1),  # s never appears as src: dangling
    ]
    edges = spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )
    iters, damp, scale = 3, 85, 10**9

    hosts = sorted({s for s, _, _ in rows} | {d for _, d, _ in rows})
    out_tot = {}
    for s, _, n in rows:
        out_tot[s] = out_tot.get(s, 0) + n
    rank = {h: scale for h in hosts}
    teleport = ((100 - damp) * scale) // 100
    for _ in range(iters):
        in_sum = {h: 0 for h in hosts}
        for s, d, n in rows:
            in_sum[d] += (rank[s] * n) // out_tot[s]
        share = sum(rank[h] for h in hosts if h not in out_tot) // len(hosts)
        rank = {
            h: teleport + (damp * (in_sum[h] + share)) // 100 for h in hosts
        }

    from corsearch_project_spark.operators.linkgraph import pagerank

    got = {
        r["host"]: r["rank"]
        for r in pagerank(edges, iterations=iters, damping_pct=damp,
                          scale=scale).collect()
    }
    assert got == rank
    # a receives from b, c and the self-loop: must outrank the others
    assert max(rank, key=rank.get) == "a"


def test_sitemap_locs_extraction(spark):
    """<loc> pull handles surrounding whitespace, multiple entries, and
    ignores nested-tag noise; pure-codegen (no Python stage)."""
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<loc> https://a.com/1 </loc>"
        "<loc>https://a.com/2</loc>"
        "<lastmod>2026-01-01</lastmod>"
        "<loc></loc>"  # empty loc: no capture (pattern needs 1+ non-space)
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    got = df.select(L.sitemap_locs(F.col("xml")).alias("u")).head()["u"]
    assert got == ["https://a.com/1", "https://a.com/2"]
    plan = df.select(L.sitemap_locs(F.col("xml"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_crawl_frontier_counts(spark):
    """Known vs new split per host: duplicate locs across sitemap files
    collapse, crawled URLs count as known, never-fetched as new."""
    sitemaps = spark.createDataFrame(
        [
            ("<urlset><loc>https://a.com/1</loc>"
             "<loc>https://a.com/2</loc></urlset>",),
            # second sitemap repeats /2 and adds a b.com url
            ("<urlset><loc>https://a.com/2</loc>"
             "<loc>https://b.com/x</loc></urlset>",),
        ],
        "xml string",
    )
    crawled = spark.createDataFrame(
        [("https://a.com/1",), ("https://c.com/only-crawled",)],
        "url string",
    )
    got = {
        r["host"]: (r["n_known"], r["n_new"])
        for r in L.crawl_frontier(sitemaps, crawled).collect()
    }
    # a.com: /1 known, /2 new (deduped); b.com: /x new.
    # c.com never appears in a sitemap -> absent from the frontier relation.
    assert got == {"a.com": (1, 1), "b.com": (0, 1)}


def test_robots_rules_wildcard_group_only(spark):
    """Named-agent groups never leak; empty Disallow dropped; missing
    wildcard group -> no rules. Rule parse is pure codegen."""
    txt = (
        "User-agent: googlebot\nDisallow: /\n"
        "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: \n"
        "User-agent: bingbot\nDisallow: /c\n"
    )
    df = spark.createDataFrame([(txt,), ("User-agent: googlebot\nDisallow: /\n",)],
                               "robots string")
    sel = df.select(L.robots_rules(F.col("robots")).alias("r"))
    got = [[(x["path"], x["allow"]) for x in row["r"]] for row in sel.collect()]
    assert got[0] == [("/a", False), ("/a/b", True)]
    assert got[1] == []  # no wildcard group at all
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_crawl_permissions_longest_match_and_ties(spark):
    """Longest prefix wins; exact-length tie goes to Allow; hosts with no
    robots row stay crawlable; single host equi-join, no cartesian."""
    robots = spark.createDataFrame(
        [("a.com",
          "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"
          "Allow: /p/3\nDisallow: /p/3\n")],
        "host string, robots string")
    urls = spark.createDataFrame(
        [("https://a.com/p/1",), ("https://a.com/p/120",),
         ("https://a.com/p/3",), ("https://a.com/free",),
         ("https://norobots.com/x",)],
        "url string")
    out = L.crawl_permissions(urls, robots)
    got = {r["url"]: (r["allowed"], r["rule_path"]) for r in out.collect()}
    assert got == {
        "https://a.com/p/1": (False, "/p/1"),
        "https://a.com/p/120": (True, "/p/12"),   # longer Allow overrides
        "https://a.com/p/3": (True, "/p/3"),      # tie -> Allow wins
        "https://a.com/free": (True, ""),         # no matching rule
        "https://norobots.com/x": (True, ""),     # no robots row at all
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_robots_crawl_delay_group_isolation(spark):
    """googlebot's delay never leaks; missing/absent values default."""
    df = spark.createDataFrame(
        [("User-agent: googlebot\nCrawl-delay: 99\nUser-agent: *\nCrawl-delay: 4\n",),
         ("User-agent: googlebot\nCrawl-delay: 99\nUser-agent: *\nDisallow: /\n",),
         ("User-agent: googlebot\nCrawl-delay: 99\n",)],
        "robots string")
    got = [r["d"] for r in
           df.select(L.robots_crawl_delay(F.col("robots")).alias("d")).collect()]
    assert got == [4, 1, 1]


def test_fetch_plan_serial_bound(spark):
    """est_fetch_s = n_new * delay; robots-less hosts use the default."""
    frontier = spark.createDataFrame(
        [("a.com", 2, 10), ("b.com", 0, 3)],
        "host string, n_known int, n_new int")
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 5\n")],
        "host string, robots string")
    got = {r["host"]: (r["n_new"], r["crawl_delay_s"], r["est_fetch_s"])
           for r in L.fetch_plan(frontier, robots).collect()}
    assert got == {"a.com": (10, 5, 50), "b.com": (3, 1, 3)}


def test_anchor_pairs_extraction(spark):
    """Full-tag pull + per-element href/text re-extract; text trimmed and
    ws-collapsed; pure codegen."""
    html = ('<a href="https://a.com/x">  First  link </a>'
            '<a href="/rel">rel</a><a href="https://b.com/y"></a>')
    df = spark.createDataFrame([(html,)], "html string")
    sel = df.select(L.anchor_pairs(F.col("html")).alias("a"))
    got = [(x["href"], x["text"]) for x in sel.head()["a"]]
    assert got == [("https://a.com/x", "First link"), ("/rel", "rel"),
                   ("https://b.com/y", "")]
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_anchor_text_index_ranks(spark):
    """Counts aggregate across pages; relative hrefs attribute to the
    linking host; top-k rank is (n desc, anchor asc) total-ordered;
    empty anchor text dropped."""
    pages = spark.createDataFrame(
        [
            ("https://s1.com/p1",
             '<a href="https://t.com/a">Best Docs</a>'
             '<a href="https://t.com/b">best docs</a>'  # case-folds together
             '<a href="/home">Home</a>'
             '<a href="https://t.com/c"> </a>'),  # whitespace-only: dropped
            ("https://s2.com/p2",
             '<a href="https://t.com/d">best docs</a>'
             '<a href="https://t.com/e">api ref</a>'
             '<a href="https://t.com/f">zzz</a>'
             '<a href="https://t.com/g">api ref</a>'),
        ],
        "url string, html string",
    )
    got = {(r["dst_host"], r["rank"]): (r["anchor"], r["n"])
           for r in L.anchor_text_index(pages, top_k=2).collect()}
    assert got == {
        ("t.com", 1): ("best docs", 3),
        ("t.com", 2): ("api ref", 2),
        ("s1.com", 1): ("home", 1),
    }


def test_hits_matches_reference_integer_recurrence(spark):
    """3-round unnormalized integer HITS vs an independent pure-Python
    reference on a hub/authority-shaped graph: d is the directory (links
    to everything), a is the endorsed authority, s a pure sink."""
    E = [("d", "a"), ("d", "b"), ("d", "s"), ("b", "a"), ("a", "s")]
    edges = spark.createDataFrame(
        [(s, t, 1) for s, t in E], "src_host string, dst_host string, n_links long"
    )
    nodes = sorted({x for e in E for x in e})
    auth = {n: 1 for n in nodes}
    hub = {n: 1 for n in nodes}
    for _ in range(3):
        auth = {n: sum(hub[s] for s, t in E if t == n) for n in nodes}
        hub = {n: sum(auth[t] for s, t in E if s == n) for n in nodes}
    got = {r["host"]: (r["auth"], r["hub"])
           for r in L.hits(edges, iterations=3).collect()}
    assert got == {n: (auth[n], hub[n]) for n in nodes}
    # structural sanity: the pure sink is authority-only, the directory
    # hub-only, and the endorsed page out-authorities everyone
    assert got["s"][1] == 0 and got["d"][0] == 0
    assert max(got, key=lambda n: got[n][0]) in ("a", "s")
    assert max(got, key=lambda n: got[n][1]) == "d"


def test_resolve_redirects_chains_and_cycles(spark):
    """Doubling follows chains to terminals in O(log h) joins; cycles
    and over-cap chains come back resolved=False."""
    redirects = spark.createDataFrame(
        [
            # chain a -> b -> c -> T (3 hops)
            ("https://x/a", "https://x/b"),
            ("https://x/b", "https://x/c"),
            ("https://x/c", "https://x/T"),
            # 2-cycle
            ("https://y/1", "https://y/2"),
            ("https://y/2", "https://y/1"),
            # self-loop
            ("https://z/s", "https://z/s"),
        ],
        "src string, dst string",
    )
    got = {r["url"]: (r["final_url"], r["resolved"])
           for r in L.resolve_redirects(redirects, max_hops=16).collect()}
    assert got["https://x/a"] == ("https://x/T", True)
    assert got["https://x/b"] == ("https://x/T", True)
    assert got["https://x/c"] == ("https://x/T", True)
    assert got["https://y/1"][1] is False
    assert got["https://y/2"][1] is False
    assert got["https://z/s"] == ("https://z/s", False)
    assert len(got) == 6  # total: one verdict per redirect source


def test_robots_sitemaps_file_wide(spark):
    """Sitemap: directives are file-wide (RFC 9309 §2.3) — collected from
    every group AND outside groups, unlike Disallow/Allow."""
    txt = ("Sitemap: https://a.com/sm0.xml\n"
           "User-agent: googlebot\nSitemap: https://a.com/sm1.xml\n"
           "User-agent: *\nDisallow: /x\nSitemap: https://a.com/sm2.xml\n")
    df = spark.createDataFrame([(txt,)], "robots string")
    got = df.select(L.robots_sitemaps(F.col("robots")).alias("s")).head()["s"]
    assert got == ["https://a.com/sm0.xml", "https://a.com/sm1.xml",
                   "https://a.com/sm2.xml"]
    # and the rules parse still scopes to the wildcard group only
    rules = df.select(L.robots_rules(F.col("robots")).alias("r")).head()["r"]
    assert [(x["path"], x["allow"]) for x in rules] == [("/x", False)]


def test_sitemap_locs_handles_sitemapindex(spark):
    """A sitemap INDEX (<sitemapindex><sitemap><loc>..) yields its child
    sitemap urls through the same <loc> pull — the crawler feeds them
    back through fetch + sitemap_locs until urlsets remain."""
    xml = ('<?xml version="1.0"?><sitemapindex>'
           "<sitemap><loc>https://a.com/sm-a.xml</loc></sitemap>"
           "<sitemap><loc> https://a.com/sm-b.xml </loc></sitemap>"
           "</sitemapindex>")
    df = spark.createDataFrame([(xml,)], "xml string")
    got = df.select(L.sitemap_locs(F.col("xml")).alias("u")).head()["u"]
    assert got == ["https://a.com/sm-a.xml", "https://a.com/sm-b.xml"]


def test_recrawl_schedule_tiers_and_lag_semantics(spark):
    """Change counting is lag-based (A->B->A = two changes), tiers follow
    change_permille, and a single observation is 'new' (no comparison)."""
    hist = spark.createDataFrame(
        [
            # flips every fetch -> 3/3 changes -> hot
            ("u/hot", 0, "a"), ("u/hot", 1, "b"),
            ("u/hot", 2, "c"), ("u/hot", 3, "d"),
            # A->B->A: two changes despite only two DISTINCT digests
            ("u/aba", 0, "a"), ("u/aba", 1, "b"), ("u/aba", 2, "a"),
            # never changes -> cold
            ("u/cold", 0, "x"), ("u/cold", 1, "x"), ("u/cold", 2, "x"),
            # one change in three comparisons -> warm (333 permille)
            ("u/warm", 0, "x"), ("u/warm", 1, "x"),
            ("u/warm", 2, "y"), ("u/warm", 3, "y"),
            # single fetch -> new, NULL permille
            ("u/new", 0, "x"),
        ],
        "url string, fetch_seq int, digest string",
    )
    got = {r["url"]: r.asDict() for r in L.recrawl_schedule(hist).collect()}
    assert got["u/hot"]["tier"] == "hot"
    assert got["u/hot"]["change_permille"] == 1000
    assert got["u/aba"]["n_changes"] == 2  # count-distinct would say 1
    assert got["u/aba"]["tier"] == "hot"  # 2/2 comparisons
    assert got["u/cold"] == {
        "url": "u/cold", "n_fetches": 3, "n_changes": 0,
        "change_permille": 0, "tier": "cold",
    }
    assert got["u/warm"]["change_permille"] == 333
    assert got["u/warm"]["tier"] == "warm"
    assert got["u/new"]["tier"] == "new"
    assert got["u/new"]["change_permille"] is None


def test_recrawl_schedule_plan_shape(spark):
    """One url-keyed window + the url-keyed agg, zero Python stages —
    the whole estimator stays JVM-side."""
    hist = spark.createDataFrame(
        [("u", i, "d%d" % (i // 2)) for i in range(4)],
        "url string, fetch_seq int, digest string",
    )
    plan = L.recrawl_schedule(hist)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_snapshot_diff_all_branches(spark):
    old = spark.createDataFrame(
        [("https://a/x", "d1"), ("https://a/y", "d2"), ("https://a/z", "d3")],
        "url string, digest string",
    )
    new = spark.createDataFrame(
        [("https://a/x", "d1"), ("https://a/y", "D2"), ("https://a/w", "d4")],
        "url string, digest string",
    )
    got = {r["url"]: r["change"]
           for r in L.snapshot_diff(old, new).collect()}
    assert got == {
        "https://a/x": "unchanged",
        "https://a/y": "changed",
        "https://a/z": "removed",
        "https://a/w": "added",
    }


def test_url_template_and_crawl_traps(spark):
    """Digit/hex collapse, query strip, empty-path default; the trap
    host's calendar space folds to ONE template while the organic host
    keeps distinct shapes."""
    from corsearch_project_spark.operators.linkgraph import url_template

    cases = [
        ("https://h/cal/2026/08/19?sid=9", "/cal/N/N/N"),
        ("https://h/p/" + "a1" * 20, "/p/H"),  # 40-char hex id
        ("https://h", "/"),
        ("https://h/a9b/x10y20", "/aNb/xNyN"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["t"] for r in df.select(url_template(F.col("url")).alias("t")).collect()]
    assert got == [w for _, w in cases]

    urls = spark.createDataFrame(
        [(f"https://trap.com/cal/{2000+i}/{i%12}?s={i}",) for i in range(60)]
        + [(f"https://ok.org/{p}",) for p in ("about", "contact", "blog/x")],
        "url string",
    )
    stats = {r["host"]: r.asDict() for r in L.crawl_traps(urls).collect()}
    assert stats["trap.com"]["n_templates"] == 1
    assert stats["trap.com"]["urls_per_template"] == 60
    assert stats["trap.com"]["top_template"] == "/cal/N/N"
    assert stats["ok.org"]["n_templates"] == 3
    assert stats["ok.org"]["urls_per_template"] == 1


def test_link_spam_features_branches(spark):
    """Hand graph pinning every link_spam_features branch: a link-farm
    pair (full reciprocity + total concentration), an organic host
    (spread links, partial reciprocity), a pure self-linker (zero
    non-self out -> both ELSE-0 guards), and self-link share math."""
    from corsearch_project_spark.operators.linkgraph import link_spam_features

    edges = spark.createDataFrame(
        [
            # farm1 <-> farm2: all eggs in one basket, fully reciprocated
            ("farm1", "farm2", 40), ("farm1", "farm1", 10),
            ("farm2", "farm1", 40),
            # organic: 4 destinations, one links back, some self links
            ("organic", "a", 5), ("organic", "b", 3), ("organic", "c", 1),
            ("organic", "farm1", 1), ("organic", "organic", 10),
            ("a", "organic", 2),
            # hermit: only self links
            ("hermit", "hermit", 7),
        ],
        "src_host string, dst_host string, n_links long",
    )
    got = {r["host"]: r for r in link_spam_features(edges).collect()}

    f1 = got["farm1"]
    assert (f1["n_out_links"], f1["out_hosts"]) == (50, 1)
    assert f1["self_permille"] == 200          # 10/50
    assert f1["top_dst_permille"] == 1000      # all non-self to farm2
    assert f1["recip_permille"] == 1000        # farm2 links back

    org = got["organic"]
    assert (org["n_out_links"], org["out_hosts"]) == (20, 4)
    assert org["self_permille"] == 500         # 10/20
    assert org["top_dst_permille"] == 500      # 5 of 10 non-self to 'a'
    assert org["recip_permille"] == 250        # 1 of 4 neighbors (a) back

    h = got["hermit"]
    assert (h["n_out_links"], h["out_hosts"]) == (7, 0)
    assert h["self_permille"] == 1000
    assert h["top_dst_permille"] == 0 and h["recip_permille"] == 0

    # 'a' links only to organic, reciprocated; 'farm2' fully reciprocated
    assert got["a"]["recip_permille"] == 1000
    assert got["farm2"]["recip_permille"] == 1000


def test_base_href_resolution(spark):
    """<base href> redirects RELATIVE anchors to the declared host;
    absolute anchors, <link>/<base> hrefs themselves never become edges."""
    rows = [
        # relative anchor + base tag -> edge a.com -> cdn.x.net
        ("https://a.com/1",
         '<base href="https://cdn.x.net/r/"><a href="/rel">s</a>'
         '<a href="https://b.com/y">abs</a>'),
        # base tag present but anchor absolute: base is ignored
        ("https://a.com/2",
         '<BASE HREF="https://cdn.x.net/"><A HREF="https://b.com/z">up</A>'),
        # relative base href: falls back to the page's own host
        ("https://a.com/3", '<base href="/sub/"><a href="/rel">s</a>'),
        # no base: relative anchor resolves to own host; the <link> href
        # (stylesheet) must NOT appear as an edge
        ("https://a.com/4",
         '<link href="https://assets.b.com/app.css"><a href="/rel">s</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in L.host_edges(df).collect()
    }
    assert got == {
        ("a.com", "cdn.x.net"): 1,   # row 1 relative via base
        ("a.com", "b.com"): 2,       # rows 1+2 absolute anchors
        ("a.com", "a.com"): 2,       # rows 3+4 relative, own host
    }


def test_extract_anchor_vs_bare_hrefs(spark):
    html = ('<base href="https://cdn.c.net/"><link href="https://s.c.net/a.css">'
            '<a class="x" href="https://a.com/1">A</a>')
    df = spark.createDataFrame([(html,)], "html string")
    row = df.select(
        L.extract_anchor_hrefs(F.col("html")).alias("a"),
        L.extract_hrefs(F.col("html")).alias("all"),
        L.extract_base_host(F.col("html")).alias("b"),
    ).head()
    assert row["a"] == ["https://a.com/1"]
    assert len(row["all"]) == 3  # WAT's bare sweep keeps everything
    assert row["b"] == "cdn.c.net"
