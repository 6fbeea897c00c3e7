#!/usr/bin/env python3
"""Plan audit: CI for scale regressions. Build every registered query's
physical plan and grep it for the anti-patterns that kill 100-TB runs:

  * ``BatchEvalPython`` — row-at-a-time Python in the plan. The engine's
    contract is Arrow-batched stages only (mapInArrow / mapInPandas /
    pandas UDFs); one row-UDF sneaking into a projection is a 10-100x
    slowdown that correctness tests cannot see.
  * ``CartesianProduct`` — an unbroadcast all-pairs join. Every deliberate
    cross join in the registry rides a broadcast tiny side
    (BroadcastNestedLoopJoin); a plain CartesianProduct means a join lost
    its equi-keys or its broadcast hint somewhere upstream.

Also recorded per query (informational, not gated): Python-stage count,
Exchange count, whether whole-stage codegen appears. One JSON line out;
exit 1 if any query violates.

    python jobs/audit_plans.py [--sf-dir /root/testdata/sf0.001] [--names a,b]

Note: building a plan requires calling the query fn, and the iterative
operators (PageRank, connected components) execute their rounds eagerly —
at sf0.001 the full sweep is a couple of minutes, which is the price of
auditing the plans that actually run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ArrowEvalPython also matches ArrowEvalPythonUDTF (the Arrow-optimized
# UDTF operator) — deliberately: both are batched, one marker each.
PY_MARKERS = (
    "MapInArrow",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
)
VIOLATION_MARKERS = ("BatchEvalPython", "CartesianProduct")


def audit_one(spark, fn, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    row = {
        "python_stages": sum(plan.count(m) for m in PY_MARKERS),
        "exchanges": plan.count("Exchange"),
        "codegen": "WholeStageCodegen" in plan,
        "violations": [m for m in VIOLATION_MARKERS if m in plan],
    }
    return row


def audit(spark, sf_dir: str, names=None) -> dict:
    from corsearch_project_spark.queries import spark_queries

    qs = spark_queries()
    if names:
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise ValueError(f"unknown query names: {unknown}")
        qs = {n: qs[n] for n in names}
    rows = {}
    violations = {}
    for name, fn in qs.items():
        try:
            row = audit_one(spark, fn, sf_dir)
        except Exception as e:  # a query that cannot even plan is a finding
            row = {"error": repr(e)[:200], "violations": ["PLAN_ERROR"]}
        rows[name] = row
        if row["violations"]:
            violations[name] = row["violations"]
        spark.catalog.clearCache()
    return {
        "n_queries": len(rows),
        "violating": violations,
        "queries": rows,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--names", default=None,
                    help="comma-separated subset (default: whole registry)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    from corsearch_project_spark.plans.session import build_session

    names = [n for n in (args.names or "").split(",") if n] or None
    if names:
        # validate BEFORE building a session so a typo is a usage error,
        # not an unexplained crash (per-query plan failures are already
        # recorded as PLAN_ERROR rows inside audit(), never raised)
        from corsearch_project_spark.queries import spark_queries

        unknown = [n for n in names if n not in spark_queries()]
        if unknown:
            print(f"error: unknown query names: {unknown}", file=sys.stderr)
            return 2
    spark = build_session("audit_plans", master=args.master)
    report = audit(spark, args.sf_dir, names)
    compact = {
        "n_queries": report["n_queries"],
        "violating": report["violating"],
        "python_stage_total": sum(
            r.get("python_stages", 0) for r in report["queries"].values()
        ),
    }
    print(json.dumps(compact))
    return 1 if report["violating"] else 0


if __name__ == "__main__":
    sys.exit(main())
