"""URL-hash bucketing and skew-aware salted repartitioning (SURVEY §2.3).

P1: ``url_bucket = pmod(xxhash64(url), B)`` — the Iceberg ``bucket(B, url)``
transform emulated with Spark built-ins (no Iceberg jars offline, SURVEY
§0.1); swap-in point for real Iceberg DDL is sources.io.TableFormat.

P2: hot hosts (by row share) get a salt column so one mega-host fans out
across S kernel tasks. AQE's skew split only rebalances shuffle *reads*;
compute skew inside the Python kernel stage needs this explicit salt
(BASELINE.json:6 "salted repartitioning for skewed hosts"). The hot-host set
is found with one cheap aggregate on the (pruned) url column and broadcast
as a literal isin() — no join on the big side.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

DEFAULT_BUCKETS = 64
DEFAULT_SALT = 8

def host_expr(url_col: str = "url"):
    return F.lower(
        F.regexp_extract(
            F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1
        )
    )


def with_url_bucket(df: DataFrame, b: int = DEFAULT_BUCKETS, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "url_bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(b)).cast("int")
    )


def hot_hosts(pages: DataFrame, hot_frac: float = 0.05, max_hosts: int = 64) -> List[str]:
    """Hosts owning more than ``hot_frac`` of rows. One narrow agg over the
    url column only (column pruning keeps html out of this scan)."""
    total = pages.count()
    if total == 0:
        return []
    rows = (
        pages.select(host_expr().alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > int(hot_frac * total))
        .orderBy(F.desc("n"))
        .limit(max_hosts)
        .collect()
    )
    return [r["host"] for r in rows if r["host"]]


def with_salt(
    df: DataFrame,
    hot: Optional[List[str]] = None,
    s: int = DEFAULT_SALT,
    url_col: str = "url",
) -> DataFrame:
    """salt ∈ [0, S) for rows of hot hosts, 0 otherwise. Derived from
    xxhash64(url, seed) so it is deterministic and uniform per url."""
    if not hot:
        return df.withColumn("salt", F.lit(0))
    salt = F.pmod(F.xxhash64(F.col(url_col), F.lit("salt-seed-1")), F.lit(s)).cast("int")
    return df.withColumn(
        "salt", F.when(host_expr(url_col).isin(list(hot)), salt).otherwise(F.lit(0))
    )


def repartition_for_kernel(
    df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """Shuffle on (url_bucket, salt) ahead of the Python kernel stage so each
    task is one bucket-shard: bounded memory, bounded skew, and the write
    side sees rows already grouped by their output partition."""
    cols = [F.col("url_bucket"), F.col("salt")]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)
