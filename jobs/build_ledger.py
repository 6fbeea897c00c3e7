#!/usr/bin/env python3
"""Build (or incrementally update) the Bloom crawl-ledger over a pages /
extracted table — the broadcast-sized "have we crawled this url" gate a
frontier filter consults before scheduling fetches:

    spark-submit --py-files csp.zip jobs/build_ledger.py \
        --input /data/out/extracted --output /data/ledger \
        [--column url] [--bits 1048576] [--hashes 3] \
        [--increment /data/out2/extracted] [--probe url1,url2]

Full build: one explode + bit_or partial-agg pass over the key column
(operators/sketches.py bloom_build — shuffle volume #tasks * words, not
corpus-sized). With --increment, the increment's filter is MERGED into
the persisted one by word-wise bit_or — the sketch merge operator IS the
incremental update, no rebuild, no read of the original corpus. Probes
answer through the broadcast filter with zero false negatives by
construction; the printed fp estimate is the standard (1-e^(-kn/m))^k.

Prints ONE JSON line: n_keys (this input), words, bits_set, fp_est,
plus per-probe claims when --probe is given.

At 10^12 urls size m accordingly (the filter is m/8 bytes: 2^30 bits =
128 MiB — still one broadcast); the build stays a single linear pass.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.operators.sketches import bloom_build, bloom_probe
from corsearch_project_spark.plans.session import build_session


def build_ledger(
    spark,
    input_path: str,
    output: str,
    column: str = "url",
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    increment: str | None = None,
    probe: str | None = None,
):
    src = increment or input_path
    keys = spark.read.parquet(src).select(F.col(column).alias("item"))
    n_keys = keys.count()
    bl = bloom_build(keys, n_bits=n_bits, n_hashes=n_hashes)
    meta_path = os.path.join(output, "_meta.json")
    if increment:
        # Shape guard: bit_or-merging filters built under different
        # (n_bits, n_hashes) silently breaks the zero-false-negative
        # contract (word index spaces and hash positions disagree), so the
        # persisted shape must match the requested one. The _ prefix keeps
        # the sidecar out of Spark's parquet file discovery. Ledgers
        # written before the sidecar existed merge as before and gain one.
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if (meta.get("n_bits"), meta.get("n_hashes")) != (n_bits, n_hashes):
                raise ValueError(
                    f"ledger shape mismatch: persisted (n_bits={meta.get('n_bits')}, "
                    f"n_hashes={meta.get('n_hashes')}) vs requested "
                    f"(n_bits={n_bits}, n_hashes={n_hashes}) — merging "
                    "incompatible Bloom filters would claim false for "
                    "member urls; rebuild instead"
                )
        prior = spark.read.parquet(output)
        bl = (
            bl.unionByName(prior)
            .groupBy("word_idx")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
    # two-phase write: the merge reads the live ledger, so materialize the
    # new one aside before overwriting (same discipline as the snapshot
    # ledger's staging writes)
    staged = output + ".__staged__"
    bl.coalesce(1).write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).coalesce(1).write.mode("overwrite").parquet(
        output
    )
    with open(meta_path, "w") as f:
        json.dump({"n_bits": n_bits, "n_hashes": n_hashes, "column": column}, f)
    final = spark.read.parquet(output)
    bits_set = final.select(
        F.sum(F.bit_count(F.col("bits"))).cast("long").alias("b")
    ).collect()[0]["b"] or 0
    # fp estimate from the LIVE filter's fill ratio (covers merged builds):
    # p(bit set) = bits_set/m, fp ~= p^k
    fp_est = (bits_set / n_bits) ** n_hashes
    report = {
        "n_keys": n_keys,
        "column": column,
        "n_bits": n_bits,
        "n_hashes": n_hashes,
        "words": final.count(),
        "bits_set": int(bits_set),
        "fp_est": round(fp_est, 6),
        "output": output,
        "merged_increment": bool(increment),
    }
    if probe:
        probes = spark.createDataFrame(
            [(p,) for p in probe.split(",")], "item string"
        )
        claims = bloom_probe(probes, final, n_bits=n_bits, n_hashes=n_hashes)
        report["probes"] = {
            r["item"]: bool(r["claimed"]) for r in claims.collect()
        }
    import shutil

    shutil.rmtree(staged, ignore_errors=True)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--column", default="url")
    ap.add_argument("--bits", type=int, default=1 << 20)
    ap.add_argument("--hashes", type=int, default=3)
    ap.add_argument("--increment", default=None)
    ap.add_argument("--probe", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not os.path.exists(args.input):
        print(f"error: path does not exist: {args.input}", file=sys.stderr)
        return 1
    if args.increment and not os.path.exists(args.increment):
        print(f"error: path does not exist: {args.increment}", file=sys.stderr)
        return 1
    spark = build_session("build_ledger", master=args.master)
    report = build_ledger(
        spark, args.input, args.output, column=args.column,
        n_bits=args.bits, n_hashes=args.hashes,
        increment=args.increment, probe=args.probe,
    )
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
