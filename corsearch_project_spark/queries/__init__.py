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


def spark_queries():
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_queries():
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
