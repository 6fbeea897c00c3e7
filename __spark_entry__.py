"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Every name maps to an operator row in SURVEY.md §2 (see the ``doc`` field on
each registration in ``corsearch_project_spark/queries/``). Queries without
an oracle entry (approx aggregates) get the documented rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from corsearch_project_spark.queries import oracle_queries, spark_queries  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped pricing
    summary — scan → pushed filter → partial/final hash aggregate, fully
    inside whole-stage codegen (SURVEY §3.2)."""
    return spark_queries()["q_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data dedup/similarity/text-analysis surface)."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins; keys match ``queries()``. Missing
    keys (q_approx_distinct) are approximate by construction → rows-only."""
    return oracle_queries()
