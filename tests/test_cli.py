"""jobs/run_extract.py CLI: in-process main() coverage — arg parsing, rules
config loading, warc input format, error paths. (The spark-submit form is
exercised by the verify recipe; these pin the same code under pytest.)"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
import run_extract as CLI  # noqa: E402

from corsearch_project_spark.fixtures.gen_pages import gen_pages, pages_to_pandas
from corsearch_project_spark.sources.warc import build_warc


@pytest.fixture()
def pages_src(spark, tmp_path):
    src = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(pages_to_pandas(gen_pages(60, seed=11))).write.parquet(src)
    return src


def _run(argv, capsys):
    rc = CLI.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_pages_with_rules_json(spark, pages_src, tmp_path, capsys):
    rules_path = os.path.join(str(tmp_path), "rules.json")
    with open(rules_path, "w") as f:
        json.dump(
            {
                "example.com": {
                    "source_key": "example.com",
                    "strip_selectors": ["nav", "footer", "aside"],
                    "keep_selectors": ["article"],
                    "min_text_density": 10.0,
                }
            },
            f,
        )
    out = os.path.join(str(tmp_path), "out")
    rc, rep = _run(
        [
            "--input", pages_src, "--output", out,
            "--run-id", "CLI1", "--buckets", "8",
            "--rules-json", rules_path,
        ],
        capsys,
    )
    assert rc == 0
    assert rep["docs_out"] == 60
    assert len(rep["buckets_written"]) == 8
    assert "phase_wall_s" in rep


def test_cli_warc_input(spark, tmp_path, capsys):
    import datetime as dt

    wpath = os.path.join(str(tmp_path), "s.warc.gz")
    recs = [
        (
            "http://cli.example/x",
            dt.datetime(2024, 2, 1, 0, 0, 0),
            b"<html><body><p>cli warc body text that is long enough to keep "
            b"after scoring thresholds are applied here.</p></body></html>",
        )
    ]
    with open(wpath, "wb") as f:
        f.write(build_warc(recs, gzip_members=True))
    out = os.path.join(str(tmp_path), "wout")
    rc, rep = _run(
        ["--input", wpath, "--output", out, "--run-id", "CLI2",
         "--buckets", "4", "--input-format", "warc"],
        capsys,
    )
    assert rc == 0 and rep["docs_out"] == 1


def test_cli_missing_input_exits_nonzero(tmp_path, capsys, spark):
    rc = CLI.main(
        ["--input", os.path.join(str(tmp_path), "nope"),
         "--output", os.path.join(str(tmp_path), "o")]
    )
    assert rc == 1


def test_rules_from_plain_ignores_unknown_keys():
    from corsearch_project_spark.webextract.rules import rules_from_plain

    rules = rules_from_plain(
        {"x.com": {"source_key": "x.com", "min_text_density": 5.0,
                   "future_knob": 42, "another_new_field": "y"}}
    )
    assert rules["x.com"].min_text_density == 5.0


def test_validate_table_pass_and_fail(spark, pages_src, tmp_path, capsys):
    """validate_table passes on a clean run and flags a corrupted table."""
    import validate_table as V
    from pyspark.sql import functions as F

    from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract

    out = os.path.join(str(tmp_path), "vout")
    run_extract(spark, ExtractConfig(input_path=pages_src, output_path=out, run_id="VT", buckets=8))
    rep = V.validate_table(
        spark, os.path.join(out, "extracted"), os.path.join(out, "lineage"), "VT", 8
    )
    assert rep["ok"] and rep["buckets_present"] == 8 and rep["docs"] == 60

    # corrupt: append a duplicate-url row with a wrong digest into bucket 0
    ext = spark.read.parquet(os.path.join(out, "extracted"))
    victim = ext.limit(1)
    bad = victim.withColumn("text_sha256", F.lit("0" * 64)).withColumn(
        "url_bucket", F.lit(0)
    )
    bad.write.mode("append").partitionBy("url_bucket").parquet(
        os.path.join(out, "extracted")
    )
    rep2 = V.validate_table(
        spark, os.path.join(out, "extracted"), os.path.join(out, "lineage"), "VT", 8
    )
    assert not rep2["ok"]
    checks = {f["check"] for f in rep2["failures"]}
    assert "url_uniqueness" in checks
    assert "lineage_reconciliation" in checks
    assert "digest_integrity" in checks
