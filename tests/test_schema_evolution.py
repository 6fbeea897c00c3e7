"""Schema evolution over the emulated table (sources/io.py S16): old-layout
data files remain readable after column ADD / RENAME / type WIDENING, with
Iceberg's semantics (missing -> typed NULL, rename lineage resolution,
cast-before-coalesce). Round-3 verdict 'Next round' item 7."""

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F, types as T

from corsearch_project_spark.sources.io import (
    read_evolved,
    read_schema_descriptor,
    write_schema_descriptor,
)
from corsearch_project_spark.sources.schemas import PAGES_SCHEMA

V1_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("body", T.BinaryType()),  # later renamed to 'html'
        T.StructField("text", T.StringType()),
        # no 'lang' yet — added in v2
    ]
)

RENAMES = {"html": ["body"]}


def _shape(schema):
    """(name, type) pairs — nullability is not part of the evolution
    contract (coalesce/cast output is always nullable)."""
    return [(f.name, f.dataType) for f in schema.fields]


def _write_two_layouts(spark, root):
    """v1 files (body, no lang) + v2 files (html, lang) in one table dir."""
    ts = dt.datetime(2024, 1, 1)
    old = spark.createDataFrame(
        [(f"https://old.example.com/{i}", ts, b"<p>old</p>", "t-old") for i in range(4)],
        V1_SCHEMA,
    )
    old.coalesce(1).write.mode("append").parquet(root)
    new = spark.createDataFrame(
        [
            (f"https://new.example.com/{i}", ts, b"<p>new</p>", "t-new", "en")
            for i in range(3)
        ],
        PAGES_SCHEMA,
    )
    new.coalesce(1).write.mode("append").parquet(root)


def test_add_and_rename_read_old_layout(spark, tmp_path):
    root = str(tmp_path / "pages_evo")
    _write_two_layouts(spark, root)

    df = read_evolved(spark, root, PAGES_SCHEMA, RENAMES)
    assert _shape(df.schema) == _shape(PAGES_SCHEMA)
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 7
    # old rows: html resolved through the rename lineage, lang is NULL
    old = rows["https://old.example.com/0"]
    assert bytes(old["html"]) == b"<p>old</p>" and old["lang"] is None
    # new rows read natively
    new = rows["https://new.example.com/0"]
    assert bytes(new["html"]) == b"<p>new</p>" and new["lang"] == "en"


def test_descriptor_roundtrip_and_descriptor_driven_read(spark, tmp_path):
    root = str(tmp_path / "pages_desc")
    _write_two_layouts(spark, root)
    write_schema_descriptor(root, PAGES_SCHEMA, RENAMES)
    got_schema, got_renames = read_schema_descriptor(root)
    assert got_schema == PAGES_SCHEMA and got_renames == RENAMES

    # read with no explicit schema: the table self-describes
    df = read_evolved(spark, root)
    assert _shape(df.schema) == _shape(PAGES_SCHEMA) and df.count() == 7
    # the descriptor file is underscore-prefixed -> invisible to plain scans
    plain = spark.read.option("mergeSchema", True).parquet(root)
    assert plain.count() == 7

    # no descriptor and no schema -> explicit error, not a guess
    with pytest.raises(FileNotFoundError):
        read_evolved(spark, str(tmp_path / "nowhere"))


def test_type_widening(spark, tmp_path):
    """Widened reads take the union_schema path: Spark's parquet reader
    upcasts int->long / float->double under an EXPLICIT read schema, while
    footer merging (mergeSchema) refuses to merge INT with BIGINT — which
    is exactly why Iceberg keeps the schema in table metadata instead of
    file footers, and why read_evolved documents the same rule."""
    root = str(tmp_path / "widen")
    spark.createDataFrame([(1, 2.5)], "k int, v float").write.mode("append").parquet(root)
    spark.createDataFrame([(2, 3.5)], "k bigint, v double").write.mode("append").parquet(root)
    target = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    df = read_evolved(spark, root, target, union_schema=target)
    assert _shape(df.schema) == _shape(target)
    assert {(r["k"], r["v"]) for r in df.collect()} == {(1, 2.5), (2, 3.5)}


def test_union_schema_skips_footer_merge_and_pushdown_survives(spark, tmp_path):
    """The 10^6-file path: caller supplies the union schema (from the
    snapshot ledger), so no mergeSchema footer sweep happens — and filters
    on evolved columns still reach the parquet scan."""
    root = str(tmp_path / "pages_union")
    _write_two_layouts(spark, root)
    union = T.StructType(
        list(PAGES_SCHEMA.fields) + [T.StructField("body", T.BinaryType())]
    )
    df = read_evolved(spark, root, PAGES_SCHEMA, RENAMES, union_schema=union)
    assert df.count() == 7
    q = df.where(F.col("url").startswith("https://old."))
    assert q.count() == 4
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "StartsWith(url" in plan
    assert "Python" not in plan  # pure-JVM projection


def test_dropped_column_is_just_not_selected(spark, tmp_path):
    """Iceberg DROP COLUMN: the data stays in old files; the read schema
    simply no longer includes it."""
    root = str(tmp_path / "dropped")
    _write_two_layouts(spark, root)
    no_text = T.StructType([f for f in PAGES_SCHEMA.fields if f.name != "text"])
    df = read_evolved(spark, root, no_text, RENAMES)
    assert "text" not in df.columns and df.count() == 7
