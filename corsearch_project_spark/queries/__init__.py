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
from corsearch_project_spark.queries import curation  # noqa: F401


# The driver sweep caps at ~50 queries per round while the registry holds
# 144, so coverage rotates on one rule: queries with NO driver-green row
# in ANY CORRECTNESS_r{N}.json surface first (oldest-evidence-first after
# that). With 152 queries and a 50-slot window, full rotation takes three
# rounds; every displaced query carries exact pytest parity (stricter
# than the driver's hash) each round regardless.
# ROUND 5 NOTE: recompute the window as (registry minus the union of
# green rows across all CORRECTNESS_r*.json, oldest rows next) — i.e.
# surface _SWEEP_OVERFLOW's 22 never-swept queries plus any round-5
# registrations first, then the 22 r2-only rows, then the oldest greens.
# The 50-slot window below holds round-4 registrations that have NO
# driver-green row in any CORRECTNESS_r{N}.json yet (73 such queries
# exist; the 15 that do not fit — the head of _SWEEP_OVERFLOW — are the
# ones with the strongest alternative evidence: exact pytest parity
# verified at BOTH sf0.001 and sf0.01 in-session, per COVERAGE.md).
# Enforced by tests/test_sweep_order.py against the committed
# CORRECTNESS_r02/r03 artifacts.
_SWEEP_FIRST = [
    # round-4 additions, never driver-swept — first driver-green row due
    "q_multimodal_png", "q_schema_evolution", "q_multimodal_wav",
    "q_manifest_lookup", "q_boilerplate_lines", "q_pii_scrub",
    "q_decontaminate", "q_link_hostgraph", "q_dedup_canonical",
    "q_link_pagerank", "q_quality_classifier", "q_multimodal_mp4",
    "q_dedup_substring", "q_crawl_frontier", "q_robots_politeness",
    "q_page_metadata", "q_canonical_groups", "q_search_conjunctive",
    "q_fetch_plan", "q_anchor_text", "q_lang_mismatch",
    "q_hreflang_reciprocity", "q_template_census", "q_search_snippets",
    "q_link_hits", "q_resolve_redirects", "q_url_surt",
    "q_recrawl_schedule", "q_domain_quality", "q_mixture_sample",
    "q_domain_cap", "q_meta_robots", "q_snapshot_diff", "q_token_rarity",
    "q_crawl_traps", "q_jsonld_types", "q_nofollow_edges",
    "q_html_tables", "q_mojibake", "q_soft404", "q_image_assets",
    "q_publish_dates", "q_mirror_hosts", "q_link_spam", "q_blocklist",
    "q_image_neardup", "q_search_bm25", "q_bpe_merges", "q_kmeans_cells",
    "q_semdedup",
]

# Never-driver-swept queries displaced from the 50-slot window; each is
# exact-parity-verified at sf0.001 AND sf0.01 by pytest (COVERAGE.md rows).
# They queue immediately after the window so any widening of the driver
# cap — or the round-5 sweep — picks them up next.
_SWEEP_OVERFLOW = [
    # newest registrations (never driver-swept) queue at the head so the
    # round-5 window recompute picks them up first
    "q_pdf_tables", "q_docx_tables", "q_readability", "q_embed_pca",
    "q_char_entropy", "q_change_rate", "q_host_scorecard",
    "q_html_outline",
    "q_filter_cascade", "q_lm_perplexity", "q_bitext_mine",
    "q_dsir_weights", "q_cdc_chunks", "q_hll_distinct",
    "q_winnow_spans",
    "q_feed_discovery", "q_feed_entries",
    "q_token_drift", "q_length_hist", "q_zorder_key",
    "q_search_phrase", "q_search_proximity", "q_more_like_this",
    "q_bpe_census", "q_bpe_fertility", "q_cms_heavy_hitters",
    "q_bloom_membership", "q_passage_chunks", "q_pagination_chains",
    "q_script_census",
    # rows last driver-green in r2 (all exact-parity-green in pytest)
    "q_math_fns", "q_array_fns", "q_json_fns", "q_cond_fns",
    "q_set_exceptall",
    "q_window_tumbling", "q_window_sliding", "q_session_window",
    "q_agg_cube", "q_window_percentrank", "q_dedupe_latest_agg",
    "q_join_interval",
    "q_dedup_exact", "q_dedup_jaccard", "q_dedup_minhash_lsh",
    "q_dedup_simhash", "q_dedup_embed", "q_dedup_embed_lsh",
    "q_sim_topk", "q_sim_lsh_ann", "q_sim_lsh_multiprobe",
    "q_text_tokens",
]


def _ordered():
    first = [n for n in _SWEEP_FIRST if n in REGISTRY]
    overflow = [n for n in _SWEEP_OVERFLOW if n in REGISTRY]
    queued = set(first) | set(overflow)
    rest = [n for n in REGISTRY if n not in queued]
    return first + overflow + rest


def spark_queries():
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracle_queries():
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
