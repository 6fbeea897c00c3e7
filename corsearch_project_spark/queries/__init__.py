"""Query registry — importing this package registers every named query.

``REGISTRY`` maps name -> QueryDef(fn, oracle); ``__spark_entry__`` exposes
it through the driver contract (queries() / oracle_sql()).
"""

from corsearch_project_spark.queries.base import REGISTRY, QueryDef  # noqa: F401
from corsearch_project_spark.queries import relational  # noqa: F401
from corsearch_project_spark.queries import textsim  # noqa: F401
from corsearch_project_spark.queries import extensions  # noqa: F401
from corsearch_project_spark.queries import analytics  # noqa: F401
from corsearch_project_spark.queries import training  # noqa: F401
from corsearch_project_spark.queries import structured  # noqa: F401
from corsearch_project_spark.queries import webqa  # noqa: F401


# The driver sweep caps at ~50 queries per round while the registry holds
# 70+, so coverage rotates: each round, the queries WITHOUT a green row in
# the latest CORRECTNESS_r{N}.json are surfaced FIRST, guaranteeing every
# query a driver-green row within any two consecutive rounds by
# construction (round-3 verdict, "Next round" item 2). The displaced
# queries all hold a green row from the immediately preceding round.
# Round 4: exactly the 22 queries absent from CORRECTNESS_r03.json
# (computed by set difference), plus this round's new registrations.
# ROUND 5 NOTE: recompute this list as (registry minus green rows in
# CORRECTNESS_r04.json) — i.e. surface the r3-green queries this
# round's window displaced PLUS the late-round-4 registrations that
# did not fit the 50-slot window (q_domain_quality, q_mixture_sample,
# q_domain_cap, q_meta_robots, q_snapshot_diff, q_token_rarity,
# q_crawl_traps, q_jsonld_types, q_nofollow_edges, q_html_tables,
# q_mojibake, q_soft404, q_image_assets, q_publish_dates,
# q_pagination_chains, q_mirror_hosts, q_link_spam, q_blocklist,
# q_image_neardup, q_script_census, q_search_bm25, q_search_phrase,
# q_search_proximity, q_more_like_this, q_bpe_merges, q_bpe_census,
# q_bpe_fertility, q_cms_heavy_hitters, q_bloom_membership,
# q_kmeans_cells, q_semdedup, q_passage_chunks;
# all already exact-parity-green in pytest) — plus any round-5
# registrations, so the two-round guarantee keeps holding by
# construction.
_SWEEP_FIRST = [
    # scalar-function and set-op rows last green in r2
    "q_math_fns", "q_array_fns", "q_json_fns", "q_cond_fns",
    "q_set_exceptall",
    # window/session batch twins last green in r2
    "q_window_tumbling", "q_window_sliding", "q_session_window",
    "q_agg_cube", "q_window_percentrank", "q_dedupe_latest_agg",
    "q_join_interval",
    # the queries/textsim.py dedup/similarity surface, last green in r2
    "q_dedup_exact", "q_dedup_jaccard", "q_dedup_minhash_lsh",
    "q_dedup_simhash", "q_dedup_embed", "q_dedup_embed_lsh",
    "q_sim_topk", "q_sim_lsh_ann", "q_sim_lsh_multiprobe",
    "q_text_tokens",
    # round-4 additions — new, so they need their first driver-green row
    "q_multimodal_png", "q_schema_evolution", "q_multimodal_wav",
    "q_manifest_lookup", "q_boilerplate_lines", "q_pii_scrub",
    "q_decontaminate", "q_link_hostgraph", "q_dedup_canonical",
    "q_link_pagerank", "q_quality_classifier", "q_multimodal_mp4",
    "q_dedup_substring", "q_crawl_frontier", "q_robots_politeness",
    "q_page_metadata", "q_canonical_groups", "q_search_conjunctive",
    "q_fetch_plan", "q_anchor_text", "q_lang_mismatch",
    "q_hreflang_reciprocity", "q_template_census", "q_search_snippets", "q_link_hits", "q_resolve_redirects",
    "q_url_surt", "q_recrawl_schedule",
]


def _ordered():
    first = [n for n in _SWEEP_FIRST if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in _SWEEP_FIRST]
    return first + rest


def spark_queries():
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracle_queries():
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
