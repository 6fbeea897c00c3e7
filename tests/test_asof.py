"""As-of join: the two physical strategies (range-join+rank vs tagged-union
merge) must be semantically identical; the merge strategy is the one that
survives scale (single shuffle, no pairwise intermediate)."""

from pyspark.sql import functions as F

from corsearch_project_spark.operators.asof import asof_join_rownum, asof_join_union

from conftest import SF_SMOKE


def _inputs(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    return events, orders


def test_strategies_agree(spark):
    events, orders = _inputs(spark)
    kw = dict(
        on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        left_key="event_id", right_order="o_orderkey",
    )
    a = asof_join_rownum(events, orders, **kw)
    b = asof_join_union(events, orders, **kw)
    ra = {(r["event_id"], r["o_orderkey"]) for r in a.collect()}
    rb = {(r["event_id"], r["o_orderkey"]) for r in b.collect()}
    assert ra == rb
    assert len(ra) == events.count()  # left join: every event present


def test_union_strategy_is_single_shuffle(spark):
    """Plan shape: the merge strategy contains no Join at all — one window
    over the union is the whole physical story."""
    import contextlib, io

    events, orders = _inputs(spark)
    df = asof_join_union(
        events, orders, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey"], left_key="event_id", right_order="o_orderkey",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "Join" not in plan.replace("unionByName", "")
    assert "Window" in plan


def test_matches_oracle_semantics(spark):
    """Cross-check against DuckDB's native ASOF JOIN on the same parquet."""
    import duckdb

    events, orders = _inputs(spark)
    got = {
        (r["event_id"], r["o_orderkey"])
        for r in asof_join_union(
            events, orders, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
            right_cols=["o_orderkey"], left_key="event_id", right_order="o_orderkey",
        ).collect()
    }
    con = duckdb.connect()
    want = {
        (eid, ok)
        for eid, ok in con.execute(
            f"""
            WITH e AS (SELECT event_id, user_id, ts FROM '{SF_SMOKE}/events.parquet'),
            o AS (SELECT o_custkey AS user_id, o_orderdate, o_orderkey
                  FROM '{SF_SMOKE}/orders.parquet')
            SELECT e.event_id,
                   (SELECT max(o.o_orderkey) FROM o
                    WHERE o.user_id = e.user_id
                      AND o.o_orderdate = (
                          SELECT max(o2.o_orderdate) FROM o o2
                          WHERE o2.user_id = e.user_id AND o2.o_orderdate <= e.ts))
            FROM e
            """
        ).fetchall()
    }
    assert got == want
