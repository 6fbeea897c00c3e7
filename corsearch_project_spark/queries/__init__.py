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


# The round-2 driver sweep verified only the first ~50 registered queries,
# leaving these 20 with judge-side-only verification (VERDICT.md round 2,
# "Next round" item 3). Surface them FIRST so a capped sweep covers them;
# the queries they displace all have green CORRECTNESS_r02 rows already, so
# the union across rounds stays fully driver-verified.
_SWEEP_FIRST = [
    "q_dedup_components", "q_sim_ivf_ann",
    "q_udf_scalar_pandas", "q_udaf_grouped_pandas", "q_udtf_explode",
    "q_udf_grouped_map", "q_map_fns", "q_multimodal_meta",
    "q_text_quality", "q_text_langid", "q_text_fingerprint",
    "q_sample_hash_split", "q_pack_sequences", "q_ngram_topk",
    "q_shipping_priority", "q_local_supplier_volume", "q_returned_items",
    "q_top_parts_by_size", "q_volume_shipping", "q_market_share",
    # round-3 additions — new, so they need their first driver-green row
    "q_text_repetition", "q_url_canonical",
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
