"""SQL-string entry surface (SURVEY §3.3): the same ANSI SQL text must run
unmodified on BOTH engines — spark.sql() over registered temp views and
DuckDB over the same parquet — and the Spark-SQL result must equal the
DataFrame-API plan's result exactly. This pins (a) the temp-view surface,
(b) Catalyst's parser path, (c) dialect portability of the oracle corpus."""

import pytest

from corsearch_project_spark.queries import REGISTRY
from corsearch_project_spark.queries.base import register_views

from conftest import SF_SMOKE

# Oracle strings verified ANSI-portable (run unmodified on Spark 4 AND
# DuckDB 1.0). The rest use DuckDB-only dialect (QUALIFY, MAP literals,
# string_split, list fns) — their Spark twin is the DataFrame program.
PORTABLE = [
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_stats",
    "q_cond_fns",
    "q_dedup_exact",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_cross",
    "q_join_range",
    "q_join_semi",
    "q_join_smj",
    "q_local_supplier_volume",
    "q_math_fns",
    "q_predicates",
    "q_pricing_summary",
    "q_project_filter",
    "q_returned_items",
    "q_session_window",
    "q_set_except",
    "q_set_exceptall",
    "q_set_intersect",
    "q_set_union",
    "q_sort_topk",
    "q_top_parts_by_size",
    "q_udaf_grouped_pandas",
    "q_udf_grouped_map",
    "q_window_frame",
    "q_window_ntile",
    "q_window_percentrank",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows, key=repr)


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, SF_SMOKE)


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_dataframe_plan(spark, name):
    qd = REGISTRY[name]
    via_sql = _canon(spark.sql(qd.oracle))
    via_df = _canon(qd.fn(spark, SF_SMOKE))
    assert via_sql == via_df
