#!/usr/bin/env python3
"""Credit-aware launcher for the 2M-doc N→4N scaling run (BENCH/BASELINE.md §4.2).

The burstable-vCPU credit pool on this host resets on reboot and refills
only while the host idles (~+2k probe-docs/s per 20 min, measured §4.2), so
a scaling run launched at the wrong moment self-invalidates on its probe
brackets — exactly what happened to the r2 and first r3 attempts. This
sentinel automates the documented gen-once + rest + single-rep protocol:

1. generate the corpus ONCE into a persistent dir (cheap even when
   throttled: it only pauses accrual for its own wall time);
2. probe every --interval seconds, appending each reading to
   BENCH/sentinel_log.jsonl so the recovery curve itself is an artifact;
3. when the probe is rested (>= --run-at) or has plateaued (>= --plateau-at
   and < 3% above the previous reading — the pool is as full as this host
   will get), exec jobs/bench_scaling.py with --input-dir/--reps 1/
   --order heavy-first; its probe brackets remain the validity gate;
4. after --deadline-min minutes, run regardless and let the brackets and
   the absolute numbers speak (a self-invalidated artifact in a fresh file
   never overwrites earlier evidence).

Runs detached (tmux) because recovery takes hours of wall clock.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOG = os.path.join(REPO, "BENCH", "sentinel_log.jsonl")


def log(event: dict) -> None:
    event = {"t": round(time.time(), 1), **event}
    with open(LOG, "a") as f:
        f.write(json.dumps(event) + "\n")
    print(json.dumps(event), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--input-dir", default="/tmp/csp_corpus_2m")
    ap.add_argument("--interval", type=int, default=480)
    ap.add_argument("--run-at", type=float, default=16_000.0,
                    help="probe docs/s at which the pool counts as rested")
    ap.add_argument("--plateau-at", type=float, default=14_000.0,
                    help="probe docs/s above which a <3%% rise over the "
                         "previous probe counts as 'as rested as it gets'")
    ap.add_argument("--deadline-min", type=float, default=240.0)
    ap.add_argument("--out", default="scaling_2m_r3b.json")
    ap.add_argument("--masters", default="local[2],local[8]")
    ap.add_argument("--kernel-partitions", type=int, default=128)
    ap.add_argument("--ceiling", action="store_true",
                    help="include the hardware-ceiling calibration (only "
                         "sensible when both legs are credit-sustainable)")
    args = ap.parse_args()

    from jobs.bench_scaling import credit_probe_median

    t0 = time.time()
    pages = os.path.join(args.input_dir, "pages.parquet")
    if not (os.path.isdir(pages) and os.listdir(pages)):
        log({"event": "gen_start", "docs": args.docs})
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "bench_scaling.py"),
             "--docs", str(args.docs), "--input-dir", args.input_dir,
             "--gen-only"],
            cwd=REPO).returncode
        log({"event": "gen_done", "rc": rc, "wall_s": round(time.time() - t0, 1)})
        if rc != 0:
            return rc
    else:
        log({"event": "gen_skipped", "path": pages})

    prev = None
    while True:
        p = credit_probe_median()  # median-of-3: single probes jitter ±30%
        log({"event": "probe", "docs_per_sec": p})
        elapsed_min = (time.time() - t0) / 60
        # Plateau = non-decreasing AND risen <3% since the last probe. The
        # lower bound matters: a bare `p < prev*1.03` is satisfied by ANY
        # drop, so one noisy dip above --plateau-at would launch while the
        # pool is still recovering — the failure mode the sentinel exists
        # to avoid.
        ready = (
            p >= args.run_at
            or (prev is not None and p >= args.plateau_at
                and prev <= p < prev * 1.03)
        )
        if ready or elapsed_min >= args.deadline_min:
            log({"event": "launch", "probe": p,
                 "reason": "rested" if p >= args.run_at
                 else ("plateau" if ready else "deadline")})
            break
        prev = p
        time.sleep(args.interval)

    cmd = [sys.executable, os.path.join(REPO, "jobs", "bench_scaling.py"),
           "--docs", str(args.docs), "--input-dir", args.input_dir,
           "--reps", "1", "--order", "heavy-first",
           "--masters", args.masters,
           "--kernel-partitions", str(args.kernel_partitions),
           "--out", args.out]
    if not args.ceiling:
        cmd.append("--skip-ceiling")
    rc = subprocess.run(cmd, cwd=REPO).returncode
    log({"event": "bench_done", "rc": rc, "out": args.out})
    return rc


if __name__ == "__main__":
    sys.exit(main())
