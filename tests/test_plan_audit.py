"""Registry-wide plan anti-pattern gate (jobs/audit_plans.py): no query may
plan a row-at-a-time Python stage (BatchEvalPython) or an unbroadcast
all-pairs join (CartesianProduct). This is the standing CI form of the
per-query plan gates scattered through the suite — a new query cannot ship
a 100-TB-killer plan without failing here."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
import audit_plans as A  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_no_query_plans_row_python_or_cartesian(spark):
    report = A.audit(spark, SF)
    assert report["n_queries"] >= 140
    assert report["violating"] == {}, report["violating"]


def test_audit_detects_row_python(spark):
    """The gate must actually fire: a deliberate row-UDF projection is
    reported as BatchEvalPython."""
    from pyspark.sql import functions as F

    bad = F.udf(lambda s: (s or "") + "!", "string")

    def q(spark_, sf_dir):
        from corsearch_project_spark.queries.base import t

        return t(spark_, sf_dir, "region").select(bad(F.col("r_name")))

    row = A.audit_one(spark, q, SF)
    assert row["violations"] == ["BatchEvalPython"]


def test_audit_rejects_unknown_names(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown query names"):
        A.audit(spark, SF, names=["q_no_such_query"])
