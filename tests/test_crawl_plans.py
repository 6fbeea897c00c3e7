"""Plan gates for the round-4 crawl/search/metadata query surface.

Every one of these queries is pure-JVM by design: no Python stage may
appear in any executed plan, and no cartesian product anywhere. The one
sanctioned BroadcastNestedLoopJoin is q_search_conjunctive's 1-row
corpus-size broadcast (a conditionless join against a single aggregate
row — constant cost, documented in operators/search.py).
"""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

PURE_JVM_QUERIES = [
    "q_crawl_frontier",
    "q_robots_politeness",
    "q_page_metadata",
    "q_canonical_groups",
    "q_search_conjunctive",
    "q_fetch_plan",
    "q_anchor_text",
    "q_lang_mismatch",
    "q_hreflang_reciprocity",
    "q_template_census",
    # round-4 close additions — same pure-JVM contract
    "q_url_surt",
    "q_recrawl_schedule",
    "q_domain_quality",
    "q_mixture_sample",
    "q_domain_cap",
    "q_meta_robots",
    "q_snapshot_diff",
    "q_token_rarity",
    "q_crawl_traps",
]


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", PURE_JVM_QUERIES)
def test_no_python_stage_no_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, \
        f"{name}: Python stage leaked into a pure-JVM query"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name != "q_search_conjunctive":
        assert "BroadcastNestedLoopJoin" not in plan, \
            f"{name}: unexpected conditionless join"
