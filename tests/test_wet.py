"""WET export/import — sources/wet.py.

Round-trip (write -> read), per-record gzip-member splittability, retry
idempotence, and byte determinism of re-exports.
"""

import datetime as dt
import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.sources import wet as W


@pytest.fixture()
def extracted(spark):
    rows = [
        (f"https://h{i % 3}.example.com/p/{i}",
         dt.datetime(2026, 1, 1, 12, 0, i),
         f"doc {i} text with unicode é中" if i != 5 else "")
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    ).repartition(4)


def test_round_trip(spark, extracted, tmp_path):
    out = str(tmp_path / "wet")
    manifest = W.write_wet(extracted, out).collect()
    assert sum(r["n_records"] for r in manifest) == 20
    assert all(os.path.exists(r["file"]) for r in manifest)
    back = W.read_wet(spark, out)
    orig = {(r["url"], r["warc_ts"], r["text"] or "")
            for r in extracted.collect()}
    got = {(r["url"], r["warc_ts"], r["text"]) for r in back.collect()}
    assert got == orig


def test_one_gzip_member_per_record(spark, extracted, tmp_path):
    """Every record is its own gzip member (the splittability contract
    read_warc_ranges' member resync relies on)."""
    out = str(tmp_path / "wet")
    W.write_wet(extracted, out).collect()
    total_members = 0
    for f in glob.glob(os.path.join(out, "*.warc.wet.gz")):
        data = open(f, "rb").read()
        # each member starts with the gzip magic; strict count via
        # sequential decompression
        members = list(
            __import__(
                "corsearch_project_spark.sources.warc", fromlist=["x"]
            )._iter_gzip_members(data)
        )
        total_members += len(members)
        for m in members:
            assert m.startswith(b"WARC/1.0\r\n")
    assert total_members == 20


def test_reexport_byte_identical(spark, extracted, tmp_path):
    """Deterministic record IDs + pinned gzip mtime: same snapshot ->
    byte-identical WET files (lineage-digest friendly)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    W.write_wet(extracted, a).collect()
    W.write_wet(extracted, b).collect()
    fa = sorted(glob.glob(os.path.join(a, "*.gz")))
    fb = sorted(glob.glob(os.path.join(b, "*.gz")))
    assert [os.path.basename(f) for f in fa] == \
        [os.path.basename(f) for f in fb]
    for x, y in zip(fa, fb):
        assert open(x, "rb").read() == open(y, "rb").read()


def test_no_inprogress_leftovers_and_empty_partitions(spark, tmp_path):
    """Empty partitions write nothing; no .inprogress files survive."""
    df = spark.createDataFrame(
        [("https://a.com/1", dt.datetime(2026, 1, 1), "t")],
        "url string, warc_ts timestamp, text string",
    ).repartition(8)
    out = str(tmp_path / "wet")
    m = W.write_wet(df, out).collect()
    assert len(m) == 1  # 7 empty partitions emit no manifest row, no file
    files = os.listdir(out)
    assert len(files) == 1
    assert not [f for f in files if f.endswith(".inprogress")]


def test_malformed_wet_skips(spark):
    """Garbage and response-type records are skipped, conversion kept."""
    good = W.wet_record_bytes(
        "https://a.com/x", dt.datetime(2026, 2, 2), "hello"
    )
    resp = good.replace(b"WARC-Type: conversion", b"WARC-Type: response")
    blob = b"garbage" + resp + good + b"\xff\xfe trailing"
    recs = list(W.iter_wet_records(blob))
    assert len(recs) == 1
    assert recs[0][0] == "https://a.com/x" and recs[0][2] == "hello"


def test_read_wet_ranges_split_equals_whole(spark, extracted, tmp_path):
    """Range scan at a split size far smaller than the files must yield
    exactly the whole-file parse — member resync loses nothing and
    duplicates nothing (each record counted once across range tasks)."""
    out = str(tmp_path / "wet")
    W.write_wet(extracted, out).collect()
    whole = {(r["url"], r["warc_ts"], r["text"])
             for r in W.read_wet(spark, out + "/*.warc.wet.gz").collect()}
    ranged = [(r["url"], r["warc_ts"], r["text"])
              for r in W.read_wet_ranges(spark, out, split_bytes=200).collect()]
    assert len(ranged) == len(whole) == 20  # no dupes across ranges
    assert set(ranged) == whole
    plan_df = W.read_wet_ranges(spark, out, split_bytes=200)
    # one Python stage (the Arrow scan), nothing else
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("MapInArrow") <= 2
