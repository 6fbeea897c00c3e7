"""Cross-engine parity checker: run a registered query in Spark and its
oracle SQL in DuckDB on the same parquet, compare row count + column names +
exact values (stricter than the driver's order-insensitive hash — if this
passes, any value-hash over the same rows matches too)."""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal
from typing import List, Optional, Tuple

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: full double precision
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


def _rows(df_pandas, cols: List[str]):
    recs = df_pandas[cols].to_dict("records")
    out = [tuple(_canon(r[c]) for c in cols) for r in recs]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> Tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    if sp_cols != du_cols:
        return False, f"schema mismatch: spark={sp_cols} duckdb={du_cols}"
    if len(sp) != len(du):
        return False, f"row count mismatch: spark={len(sp)} duckdb={len(du)}"
    a = _rows(sp, sp_cols)
    b = _rows(du, sp_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch ({len([1 for x, y in zip(a, b) if x != y])} rows), first: {diffs}"
    return True, f"ok rows={len(sp)}"


def check_all(
    spark, sf_dir: str, names: Optional[List[str]] = None
) -> List[Tuple[str, bool, str]]:
    from corsearch_project_spark.queries import REGISTRY

    con = duck_connection(sf_dir)
    results = []
    for name, qd in sorted(REGISTRY.items()):
        if names and name not in names:
            continue
        try:
            df = qd.fn(spark, sf_dir)
            if qd.oracle is None:
                n = df.count()
                results.append((name, n >= 0, f"rows-only rows={n}"))
                continue
            ok, msg = compare(df, con, qd.oracle)
            results.append((name, ok, msg))
        except Exception as e:  # surface per-query failures, keep going
            results.append((name, False, f"EXC {type(e).__name__}: {str(e)[:300]}"))
    return results
