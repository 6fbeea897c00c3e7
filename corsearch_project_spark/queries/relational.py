"""Relational operator surface (SURVEY.md §2.4–2.8): projections, filters,
every join family, aggregations, window functions, sorts/limits/set ops, and
the scalar-function catalog — each as an idiomatic DataFrame program with a
DuckDB oracle twin.

These queries run JVM-only (whole-stage codegen end to end; SURVEY §3.2) —
no Python workers are launched for any of them.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from corsearch_project_spark.queries.base import (
    davg,
    dsum,
    query,
    sql_davg,
    sql_dsum,
    t,
)

# ------------------------------------------------------------------ §2.6 A1

@query(
    "q_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1 hash aggregate, TPC-H Q1 shape: partial+final HashAggregateExec.",
)
def q_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ------------------------------------------------------------- §2.4 R1/R2

@query(
    "q_project_filter",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    """,
    doc="R1/R2: projection + filter; predicates push to the parquet scan.",
)
def q_project_filter(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_quantity").between(10, 20)
            & F.to_date("l_shipdate").between(
                F.lit("1996-01-01").cast("date"), F.lit("1996-12-31").cast("date")
            )
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("revenue"),
            "l_returnflag",
        )
    )


@query(
    "q_predicates",
    """
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_acctbal BETWEEN 0 AND 5000
      AND NOT (c_nationkey = 3)
      AND c_name LIKE 'Customer%'
    """,
    doc="R3/R4: compound boolean predicates, isin, between, NOT, LIKE.",
)
def q_predicates(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(0, 5000)
        & ~(F.col("c_nationkey") == 3)
        & F.col("c_name").like("Customer%")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "q_like_regexp",
    """
    SELECT p_partkey, p_name, p_brand,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS type_tail
    FROM part
    WHERE regexp_matches(p_type, '.*BRASS.*') OR p_brand LIKE 'Brand#1%'
    """,
    doc="R4/O6: rlike + LIKE predicates, regexp_extract projection.",
)
def q_like_regexp(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").rlike(".*BRASS.*") | F.col("p_brand").like("Brand#1%")
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_tail"),
    )


# ------------------------------------------------------------------ §2.5

@query(
    "q_join_broadcast",
    f"""
    SELECT r.r_name, COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal', 2)} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="J1: two explicit broadcast hash joins (dims ≪ fact); no shuffle of "
    "the customer side until the final aggregate.",
)
def q_join_broadcast(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "q_join_smj",
    f"""
    SELECT o.o_orderkey, o.o_orderstatus,
           COALESCE({sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}, 0.0) AS revenue,
           COUNT(l.l_orderkey) AS n_lines
    FROM orders o
    LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
    doc="J2: sort-merge left outer join on the two big tables (both sides "
    "shuffle-partitioned on the join key), orders without lineitems kept.",
)
def q_join_smj(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.coalesce(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), F.lit(0.0)
            ).alias("revenue"),
            F.count(F.col("l_orderkey")).alias("n_lines"),
        )
    )


@query(
    "q_join_semi",
    """
    SELECT c_nationkey, COUNT(*) AS n_active
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
    doc="J3: left-semi join (EXISTS) — customers with at least one order.",
)
def q_join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "q_join_anti",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_nationkey = c.c_nationkey AND s.s_acctbal > 8000)
    """,
    doc="J4: left-anti join (NOT EXISTS) — customers in nations without a "
    "well-capitalized supplier; same shape as resume's pending-buckets "
    "computation (SURVEY §2.3 P5).",
)
def q_join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 8000)
    return c.join(s, c.c_nationkey == s.s_nationkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@query(
    "q_join_range",
    """
    WITH bands(band, lo, hi) AS (
        VALUES ('small', 0.0, 20000.0), ('mid', 20000.0, 100000.0),
               ('large', 100000.0, 1e18)
    )
    SELECT b.band, COUNT(*) AS n_orders,
           CAST(MIN(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
    doc="J5 theta/band join: non-equi predicate against a tiny literal dim "
    "→ BroadcastNestedLoopJoin (the only sane physical plan for theta).",
)
def q_join_range(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 20000.0), ("mid", 20000.0, 100000.0), ("large", 100000.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("min_price"),
            F.max(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("max_price"),
        )
    )


@query(
    "q_join_asof",
    """
    SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
    FROM events e JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    QUALIFY row_number() OVER (
        PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
    ) = 1
    """,
    doc="J6 as-of join: latest order at-or-before each event's ts per user. "
    "Registered plan = operators.asof.asof_join_union: tagged union + ONE "
    "window sort over |events|+|orders| — linear, no pairwise (event, "
    "earlier-order) materialization. The range-join+row_number form "
    "(asof_join_rownum) stays as the tested control arm (tests/test_asof.py); "
    "it is quadratic-risk on users with many orders and dies at 100×.",
)
def q_join_asof(spark, sf_dir):
    from corsearch_project_spark.operators.asof import asof_join_union

    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    joined = asof_join_union(
        e,
        o,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
        left_key="event_id",
        right_order="o_orderkey",
    )
    # inner semantics (match the oracle): drop events with no prior order
    return joined.where(F.col("o_orderkey").isNotNull()).select(
        "event_id", "user_id", F.col("o_orderkey").alias("asof_orderkey")
    )


@query(
    "q_join_cross",
    """
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    doc="J8: cross join of two tiny relations.",
)
def q_join_cross(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.select("r_name").crossJoin(s)


# ------------------------------------------------------------------ §2.6

@query(
    "q_agg_distinct",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
    doc="A2: count-distinct (expand+two-phase aggregate in Spark).",
)
def q_agg_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "q_agg_rollup",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n, {sql_dsum('c_acctbal', 2)} AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="A4: ROLLUP grouping sets over the dim hierarchy.",
)
def q_agg_rollup(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n",
            "total_bal",
        )
    )


@query(
    "q_agg_stats",
    f"""
    SELECT c_nationkey,
           COUNT(*) AS n,
           CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
           CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal,
           {sql_davg('c_acctbal', 2)} AS avg_bal
    FROM customer GROUP BY c_nationkey
    """,
    doc="A1: min/max/avg/count per group, decimal-exact across engines.",
)
def q_agg_stats(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("min_bal"),
        F.max(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("max_bal"),
        davg(F.col("c_acctbal"), 2).alias("avg_bal"),
    )


@query(
    "q_agg_string",
    """
    SELECT r_regionkey, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_regionkey
    """,
    doc="A6: bounded collect_set, emitted as a deterministic sorted CSV.",
)
def q_agg_string(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_regionkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("n_name"))).alias("nations")
        )
    )


@query(
    "q_percentile",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
    doc="A7: exact linear-interpolation percentiles (Spark `percentile` ≡ "
    "DuckDB `quantile_cont`), rounded to absorb ulp-level divergence.",
)
def q_percentile(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
    )


@query(
    "q_approx_distinct",
    None,  # approximate by construction — rows-only check (SURVEY A3)
    doc="A3: HyperLogLog++ approx count-distinct — the 10^12-scale "
    "cardinality primitive; no exact oracle by design.",
)
def q_approx_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers")
    )


# ------------------------------------------------------------------ §2.7

@query(
    "q_window_rownum",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
    """,
    doc="W1: latest-wins dedupe via row_number window — the control-arm "
    "plan (plans.extract_pipeline.dedupe_latest_window); the pipeline's "
    "partial-agg variant is q_dedupe_latest_agg.",
)
def q_window_rownum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_price"),
        )
    )


@query(
    "q_window_lag",
    """
    SELECT event_id, user_id,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS delta_us
    -- Spark side casts TIMESTAMP_NTZ -> TIMESTAMP under the fixed UTC
    -- session zone, so the epoch difference is offset-free on both engines.
    FROM events
    """,
    doc="W2: lag — inter-event gap in microseconds per user.",
)
def q_window_lag(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts = F.col("ts").cast("timestamp")  # parquet NTZ -> TZ under UTC session
    us = (F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))).cast("long")
    return e.select("event_id", "user_id", us.alias("delta_us"))


@query(
    "q_window_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling3
    FROM orders
    """,
    doc="W3: rowsBetween frame aggregate — rolling 3-order spend.",
)
def q_window_frame(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("rolling3"),
    )


@query(
    "q_window_ntile",
    """
    SELECT c_custkey,
           CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS decile,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pr
    FROM customer
    """,
    doc="W4: ntile deciles + percent_rank with a total deterministic order.",
)
def q_window_ntile(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@query(
    "q_window_lastnn",
    """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    doc="W5: last(..., ignorenulls) carry-forward — the as-of fill primitive.",
)
def q_window_lastnn(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(marked, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# ------------------------------------------------------------------ §2.8

@query(
    "q_sort_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
    doc="O1/O2: global top-k → TakeOrderedAndProject (no full sort at scale).",
)
def q_sort_topk(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="O5: INTERSECT (distinct) of nation keys present on both sides.",
)
def q_set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_set_except",
    """
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    doc="O5: EXCEPT — nations with no well-capitalized supplier.",
)
def q_set_except(spark, sf_dir):
    n = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return n.exceptAll(s.distinct()).distinct()


@query(
    "q_set_union",
    """
    SELECT k, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer
        UNION ALL
        SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k
    """,
    doc="O4: UNION ALL then aggregate.",
)
def q_set_union(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_string_fns",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substr(c_name, 1, 8) AS name8,
           CAST(length(c_name) AS BIGINT) AS name_len,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           levenshtein(c_mktsegment, 'BUILDING') AS lev,
           replace(c_name, 'Customer', 'Cst') AS short_name
    FROM customer
    """,
    doc="O6: string function catalog, row-level exact.",
)
def q_string_fns(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nat"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("lev"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cst")).alias("short_name"),
    )


@query(
    "q_date_fns",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
               AS days_since_base,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date
    FROM orders
    """,
    doc="O7: date/time function catalog.",
)
def q_date_fns(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_base"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
    )


@query(
    "q_math_fns",
    """
    SELECT l_orderkey, l_linenumber,
           round(CAST(l_extendedprice AS DOUBLE), 1) AS price_r1,
           CAST(floor(CAST(l_quantity AS DOUBLE)) AS BIGINT) AS qty_floor,
           abs(CAST(l_quantity AS DOUBLE) - 25.0) AS qty_dev,
           sqrt(CAST(l_quantity AS DOUBLE)) AS qty_sqrt,
           CAST(CAST(l_orderkey AS BIGINT) % 97 AS BIGINT) AS key_mod
    FROM lineitem
    """,
    doc="O8: math catalog — round/floor/abs/sqrt/pmod (IEEE-deterministic "
    "choices only; no libm-divergent log/pow in the hashed surface).",
)
def q_math_fns(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice").cast("double"), 1).alias("price_r1"),
        F.floor(q).cast("long").alias("qty_floor"),
        F.abs(q - 25.0).alias("qty_dev"),
        F.sqrt(q).alias("qty_sqrt"),
        F.pmod(F.col("l_orderkey").cast("long"), F.lit(97)).cast("long").alias("key_mod"),
    )


@query(
    "q_array_fns",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(round(CAST(embedding[1] AS DOUBLE) * 1000.0, 0) AS BIGINT) AS q_first,
           CAST(list_sum(list_transform(embedding[1:8],
                x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))) AS BIGINT) AS q_head_sum
    FROM embeddings
    """,
    doc="O9: array functions — size, element_at, slice, transform+aggregate "
    "(quantized so the sum is exact integer math).",
)
def q_array_fns(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    quant = lambda c: F.round(c.cast("double") * 1000.0, 0).cast("long")  # noqa: E731
    head = F.transform(F.slice("embedding", 1, 8), lambda x: quant(x))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        quant(F.element_at("embedding", 1)).alias("q_first"),
        F.aggregate(head, F.lit(0).cast("long"), lambda s, v: s + v).alias("q_head_sum"),
    )


@query(
    "q_json_fns",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
    doc="O11: JSON extraction from the events.props JSON-string column.",
)
def q_json_fns(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
    )


@query(
    "q_cond_fns",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 20000 THEN 'mid'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           greatest(CAST(o_totalprice AS DOUBLE), 1000.0) AS floor_price,
           least(CAST(o_totalprice AS DOUBLE), 500000.0) AS capped_price
    FROM orders
    """,
    doc="O12: when/otherwise, coalesce, nullif, greatest/least.",
)
def q_cond_fns(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("double")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 20000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest(p, F.lit(1000.0)).alias("floor_price"),
        F.least(p, F.lit(500000.0)).alias("capped_price"),
    )


# -------------------------------------------- §2.9 batch-mode time windows

@query(
    "q_window_tumbling",
    f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events GROUP BY 1
    """,
    doc="T2: tumbling event-time window — `F.window` in batch mode; the "
    "identical expression runs under readStream + watermark (streaming/).",
)
def q_window_tumbling(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n_events", "total_value")
    )


@query(
    "q_window_sliding",
    """
    SELECT w_start, COUNT(*) AS n_events
    FROM (
        SELECT time_bucket(INTERVAL '5 minutes', ts)
                   - to_microseconds(g * 300000000) AS w_start
        FROM events CROSS JOIN (VALUES (0), (1)) t(g)
    )
    GROUP BY w_start
    """,
    doc="T3: sliding window (10 min length, 5 min slide) — each event lands "
    "in exactly two window instances.",
)
def q_window_sliding(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


@query(
    "q_session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    doc="T4: session window (30 min gap) — Spark `session_window` vs the "
    "classic lag+cumsum sessionization in SQL.",
)
def q_session_window(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


# ---------------------------------------------------- §2.6/§2.7/§2.8 extras

@query(
    "q_agg_cube",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n, {sql_dsum('c_acctbal', 2)} AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (r_name, c_mktsegment)
    """,
    doc="A4: CUBE grouping sets — every (region × segment) marginal in one "
    "pass (4 grouping sets materialized by Expand, one shuffle).",
)
def q_agg_cube(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        j.cube("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n",
            "total_bal",
        )
    )


@query(
    "q_set_exceptall",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="O5: EXCEPT ALL — bag difference with multiplicity (each supplier "
    "occurrence cancels one customer occurrence of the same key).",
)
def q_set_exceptall(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "q_window_percentrank",
    """
    SELECT s_suppkey, s_nationkey,
           percent_rank() OVER w AS pr,
           cume_dist()    OVER w AS cd
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
    doc="W4: percent_rank + cume_dist per nation — exact rational values "
    "((rank-1)/(n-1), peers/n) so the doubles are bit-identical cross-engine.",
)
def q_window_percentrank(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "q_dedupe_latest_agg",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
    """,
    doc="Latest-wins dedupe as max(struct(...)) — the PARTIAL-aggregating "
    "plan plans.extract_pipeline.dedupe_latest uses for CC re-crawls "
    "(map-side reduction; contrast with q_window_rownum's window plan, "
    "which shuffles every replica).",
)
def q_dedupe_latest_agg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    picked = o.groupBy("o_custkey").agg(
        F.max(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("m")
    )
    return picked.select(
        "o_custkey",
        F.col("m.o_orderkey").alias("latest_orderkey"),
        F.col("m.o_totalprice").alias("latest_price"),
    )


@query(
    "q_join_interval",
    """
    SELECT a.event_id AS purchase_id, COUNT(*) AS n_views,
           CAST(SUM(CAST(round(v.value * 100.0, 0) AS BIGINT)) AS BIGINT) AS qvalue
    FROM events a
    JOIN events v
      ON v.user_id = a.user_id
     AND v.event_type = 'view'
     AND v.ts >= a.ts - INTERVAL '1 hour'
     AND v.ts < a.ts
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    """,
    doc="J7: point-in-interval join — views falling in the hour before each "
    "purchase by the same user: equi key (user) as the join key, the time "
    "band as a join filter (hash/SMJ + filter, no BNL). Values quantized "
    "for cross-engine exactness.",
)
def q_join_interval(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"), "value"
    )
    cond = (
        (F.col("v_user") == F.col("a_user"))
        & (F.col("v_ts") >= F.col("a_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") < F.col("a_ts"))
    )
    return (
        a.join(v, cond)
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).alias("qvalue"),
        )
    )
