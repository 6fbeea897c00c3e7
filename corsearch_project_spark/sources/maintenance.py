"""Table maintenance: snapshot expiration + crash-leftover vacuum (the
Iceberg ``expireSnapshots`` / ``removeOrphanFiles`` actions for the emulated
table format).

A 10^12-doc table re-crawled incrementally accumulates one snapshot row and
B lineage rows per commit forever; after 10^5 merge commits the metadata
tables dwarf their purpose and every ``validate_table`` reconciliation
window ranks an ever-growing ledger. Iceberg bounds this with
``expireSnapshots`` — history older than a retention window is dropped,
EXCEPT state still referenced by live data. The emulation has the same
invariant, at run granularity:

  a run (its snapshot row + its lineage rows) may be expired only when it
  is (1) outside the keep-last window AND (2) not the LATEST writer of any
  bucket — the latest writer's lineage row is what ``validate_table``
  reconciles the bucket's bytes against and what the merge pipeline treats
  as current, so expiring it would orphan the bucket's provenance.

Consequences, both documented Iceberg behaviors too: an expired run can no
longer be ``--resume``d (its per-bucket done markers are gone), and history
queries can't see expired commits.

Metadata tables are driver-small by construction (one row per commit, B
rows per run — the same boundedness argument as ``io.done_buckets``), so
the expiry set is computed driver-side; the rewrites stay Spark writes.
Single-writer-per-table-root assumption, as everywhere in this emulation:
the swap is write-new → move-old-aside → move-new-in, not a catalog CAS.

Vacuum: Spark's dynamic partition overwrite stages output under
``_temporary`` and removes it on job commit; a killed job leaves the
directory behind. Readers ignore underscore-prefixed paths, so the leftovers
are invisible but billable — at crawl scale, terabytes. ``vacuum_staging``
removes them.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

from pyspark.sql import SparkSession, functions as F

from corsearch_project_spark.sources.schemas import LINEAGE_SCHEMA
from corsearch_project_spark.sources.snapshots import SNAPSHOT_SCHEMA, read_snapshots


def _swap_in(new_dir: str, live_dir: str) -> None:
    """write-new → aside → move-in; the aside copy is removed last so an
    interruption leaves either the old or the new table, never neither."""
    aside = live_dir.rstrip("/") + ".__expired__"
    if os.path.exists(aside):
        shutil.rmtree(aside)
    os.rename(live_dir, aside)
    os.rename(new_dir, live_dir)
    shutil.rmtree(aside)


def latest_writers(snap_rows: List[dict]) -> Dict[int, str]:
    """bucket -> run_id of the run that last rewrote it, replayed from the
    snapshot ledger's commit order (each row records the buckets it
    touched)."""
    latest: Dict[int, str] = {}
    for r in sorted(snap_rows, key=lambda r: r["seq"]):
        for b in r["buckets"]:
            latest[int(b)] = r["run_id"]
    return latest


def expire_snapshots(
    spark: SparkSession, output_path: str, keep_last: int = 3
) -> Optional[dict]:
    """Expire runs outside the keep-last window that are not latest writer
    of any bucket; compact the snapshots + lineage tables accordingly.
    Returns a report dict, or None when there is no snapshots table."""
    root = output_path.rstrip("/")
    snap_path = root + "/snapshots"
    lin_path = root + "/lineage"

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = read_snapshots(spark, snap_path)
    if snaps is None:
        return None
    rows = [r.asDict() for r in snaps.collect()]  # one row per commit
    seqs = sorted(r["seq"] for r in rows)
    cutoff = seqs[-keep_last] if keep_last <= len(seqs) else seqs[0]
    window_runs = {r["run_id"] for r in rows if r["seq"] >= cutoff}
    writer_runs = set(latest_writers(rows).values())
    keep_runs = window_runs | writer_runs
    expired_runs = sorted({r["run_id"] for r in rows} - keep_runs)

    report = {
        "snapshots_before": len(rows),
        "keep_last": keep_last,
        "kept_runs": sorted(keep_runs),
        "expired_runs": expired_runs,
        "kept_for_latest_writer": sorted(writer_runs - window_runs),
    }
    if not expired_runs:
        report["snapshots_after"] = len(rows)
        report["lineage_rows_expired"] = 0
        return report

    keep_lit = list(keep_runs)
    new_snaps = (
        spark.read.schema(SNAPSHOT_SCHEMA)
        .parquet(snap_path)
        .where(F.col("run_id").isin(keep_lit))
    )
    new_snaps.coalesce(1).write.parquet(snap_path + ".__compact__")
    _swap_in(snap_path + ".__compact__", snap_path)

    lin = spark.read.schema(LINEAGE_SCHEMA).parquet(lin_path)
    n_before = lin.count()
    kept_lin = lin.where(F.col("run_id").isin(keep_lit))
    kept_lin.coalesce(1).write.parquet(lin_path + ".__compact__")
    _swap_in(lin_path + ".__compact__", lin_path)

    # run_ids and snapshot rows are not 1:1 (a resume-append commits a new
    # row under the original run_id), so count kept ROWS, not kept runs
    report["snapshots_after"] = sum(1 for r in rows if r["run_id"] in keep_runs)
    report["lineage_rows_expired"] = n_before - spark.read.schema(
        LINEAGE_SCHEMA
    ).parquet(lin_path).count()
    return report


def vacuum_staging(output_path: str) -> dict:
    """Remove crash-leftover Spark staging dirs (``_temporary``) under the
    table root. Underscore paths are invisible to readers, so this never
    changes query results — it reclaims storage after killed writes."""
    removed, freed = [], 0
    for dirpath, dirnames, _ in os.walk(output_path):
        if "_temporary" in dirnames:
            t = os.path.join(dirpath, "_temporary")
            for dp, _, files in os.walk(t):
                for fn in files:
                    try:
                        freed += os.path.getsize(os.path.join(dp, fn))
                    except OSError:
                        pass
            shutil.rmtree(t, ignore_errors=True)
            removed.append(os.path.relpath(t, output_path))
            dirnames.remove("_temporary")
    return {"staging_dirs_removed": removed, "bytes_freed": freed}
