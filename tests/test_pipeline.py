"""Integration tests: golden byte-identity, lineage, resume, skew
(SURVEY §5.2 layers 2–4). The single-process pure-Python core is the
operational definition of the reference scripts' output (BASELINE.json:6)."""

import os

import pytest
from pyspark.sql import functions as F

from corsearch_project_spark.fixtures.gen_pages import (
    default_rules,
    gen_pages,
    pages_to_pandas,
)
from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract
from corsearch_project_spark.webextract.extract import extract_document
from corsearch_project_spark.webextract.rules import rule_for_url


def _golden_digests(rows, rules):
    """Single-process oracle: latest-wins dedupe then extract per url."""
    best = {}
    for r in rows:
        key = r["url"]
        rank = (r["warc_ts"], len(r["html"] or b""), r["text"] or "")
        if key not in best or rank > best[key][0]:
            best[key] = (rank, r)
    out = {}
    for url, (_, r) in best.items():
        res = extract_document(url, r["html"], r["text"], rule_for_url(url, rules))
        out[url] = res.text_sha256
    return out


def _write_pages(spark, tmp_path, rows, name="pages"):
    path = os.path.join(str(tmp_path), name)
    pdf = pages_to_pandas(rows)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def smoke_corpus():
    return gen_pages(200, seed=42, skew="mild", dup_frac=0.05)


def test_golden_byte_identity(spark, tmp_path, smoke_corpus):
    rules = default_rules()
    inp = _write_pages(spark, tmp_path, smoke_corpus)
    out = os.path.join(str(tmp_path), "out")
    cfg = ExtractConfig(input_path=inp, output_path=out, run_id="golden", buckets=16)
    run_extract(spark, cfg, rules)

    got = {
        r["url"]: r["text_sha256"]
        for r in spark.read.parquet(cfg.extracted_path)
        .select("url", "text_sha256")
        .collect()
    }
    want = _golden_digests(smoke_corpus, rules)
    assert set(got) == set(want), "url set mismatch"
    mismatches = {u for u in want if got[u] != want[u]}
    assert not mismatches, f"{len(mismatches)} digest mismatches, e.g. {sorted(mismatches)[:3]}"

    # each url exactly once (dedupe) and JVM sha2 == python hashlib digest
    ext = spark.read.parquet(cfg.extracted_path)
    assert ext.count() == ext.select("url").distinct().count()
    bad = ext.where(
        F.sha2(F.col("extracted_text").cast("binary"), 256) != F.col("text_sha256")
    ).count()
    assert bad == 0


def test_lineage_rows(spark, tmp_path, smoke_corpus):
    rules = default_rules()
    inp = _write_pages(spark, tmp_path, smoke_corpus)
    out = os.path.join(str(tmp_path), "out_lin")
    cfg = ExtractConfig(input_path=inp, output_path=out, run_id="lin1", buckets=8)
    run_extract(spark, cfg, rules)

    lin = spark.read.parquet(cfg.lineage_path)
    ext = spark.read.parquet(cfg.extracted_path)
    assert lin.count() == ext.select("url_bucket").distinct().count()
    assert lin.agg(F.sum("doc_count")).first()[0] == ext.count()
    row = lin.first()
    assert row["status"] == "done" and len(row["sha256_rollup"]) == 64
    assert row["input_split"].startswith(inp)


def test_resume_skips_done_buckets_and_matches_full_run(spark, tmp_path, smoke_corpus):
    rules = default_rules()
    inp = _write_pages(spark, tmp_path, smoke_corpus)

    # uninterrupted reference run
    full = ExtractConfig(input_path=inp, output_path=os.path.join(str(tmp_path), "full"),
                         run_id="R", buckets=8)
    run_extract(spark, full, rules)
    want = {
        r["url"]: r["text_sha256"]
        for r in spark.read.parquet(full.extracted_path).select("url", "text_sha256").collect()
    }

    # interrupted run: only buckets 0..3 complete
    out = os.path.join(str(tmp_path), "resumed")
    part1 = ExtractConfig(input_path=inp, output_path=out, run_id="R", buckets=8,
                          bucket_whitelist=[0, 1, 2, 3])
    rep1 = run_extract(spark, part1, rules)
    assert set(rep1["buckets_written"]) <= {0, 1, 2, 3}
    lin1 = {r["url_bucket"]: r["wall_ms"] for r in spark.read.parquet(part1.lineage_path).collect()}

    # resume: must skip completed buckets and finish the rest
    part2 = ExtractConfig(input_path=inp, output_path=out, run_id="R", buckets=8, resume=True)
    rep2 = run_extract(spark, part2, rules)
    assert set(rep2["buckets_skipped"]) == set(rep1["buckets_written"])
    assert not (set(rep2["buckets_written"]) & set(rep1["buckets_written"]))

    got = {
        r["url"]: r["text_sha256"]
        for r in spark.read.parquet(part2.extracted_path).select("url", "text_sha256").collect()
    }
    assert got == want, "resumed table differs from uninterrupted run"

    # completed buckets were not recomputed: their lineage rows are unchanged
    lin2 = spark.read.parquet(part2.lineage_path)
    for b in rep1["buckets_written"]:
        rows = lin2.where(F.col("url_bucket") == b).collect()
        assert len(rows) == 1 and rows[0]["wall_ms"] == lin1[b]


def test_skew_salting_preserves_output(spark, tmp_path):
    rules = default_rules()
    rows = gen_pages(300, seed=7, skew="heavy", dup_frac=0.0)
    inp = _write_pages(spark, tmp_path, rows, "pages_skew")

    salted = ExtractConfig(input_path=inp, output_path=os.path.join(str(tmp_path), "s1"),
                           run_id="s1", buckets=8, salt=8, hot_frac=0.05)
    unsalted = ExtractConfig(input_path=inp, output_path=os.path.join(str(tmp_path), "s2"),
                             run_id="s2", buckets=8, salt=1, hot_frac=1.1)  # no host is 'hot'
    r1 = run_extract(spark, salted, rules)
    r2 = run_extract(spark, unsalted, rules)
    assert r1["hot_hosts"], "heavy-skew fixture should trigger hot-host detection"
    assert not r2["hot_hosts"]

    a = {(r["url"], r["text_sha256"])
         for r in spark.read.parquet(salted.extracted_path).select("url", "text_sha256").collect()}
    b = {(r["url"], r["text_sha256"])
         for r in spark.read.parquet(unsalted.extracted_path).select("url", "text_sha256").collect()}
    assert a == b

    # rollup digest is order-insensitive: per-bucket rollups match across layouts
    la = {(r["url_bucket"], r["sha256_rollup"])
          for r in spark.read.parquet(salted.lineage_path).collect()}
    lb = {(r["url_bucket"], r["sha256_rollup"])
          for r in spark.read.parquet(unsalted.lineage_path).collect()}
    assert la == lb


def test_kernel_poison_doc_degrades_to_error_row(spark, monkeypatch):
    """A document that makes the core raise must become a deterministic
    'error' row, not a task failure (10^12-doc poison-doc guard)."""
    import pandas as pd

    from corsearch_project_spark.operators import kernel as K

    real = K.extract_document

    def exploding(url, data, fb, rule):
        if url.endswith("/poison"):
            raise ValueError("boom")
        return real(url, data, fb, rule)

    monkeypatch.setattr(K, "extract_document", exploding)
    pdf = pd.DataFrame(
        {
            "url": ["http://x.example/ok", "http://x.example/poison"],
            "html": [b"<html><body><p>fine body text that scores well enough to keep.</p></body></html>", b"<p>x</p>"],
            "text": [None, None],
        }
    )
    out = pd.concat(list(K.make_kernel({})([pdf])), ignore_index=True)
    by_url = {r["url"]: r for _, r in out.iterrows()}
    assert by_url["http://x.example/poison"]["doc_kind"] == "error"
    assert by_url["http://x.example/poison"]["extracted_text"] == ""
    assert by_url["http://x.example/ok"]["doc_kind"] == "html"


def test_snapshot_ledger_grows_and_reconciles(spark, tmp_path, pages_parquet=None):
    """Every commit appends one snapshot row; resume reruns that skip all
    buckets append none; totals reconcile with lineage."""
    import os as _os

    import pyarrow as pa, pyarrow.parquet as pq

    from corsearch_project_spark.fixtures.gen_pages import gen_pages, pages_to_pandas
    from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract
    from corsearch_project_spark.sources.snapshots import read_snapshots

    src = _os.path.join(str(tmp_path), "p.parquet")
    pq.write_table(
        pa.Table.from_pandas(pages_to_pandas(gen_pages(120, seed=77))),
        src, coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    out = _os.path.join(str(tmp_path), "out")
    rep1 = run_extract(spark, ExtractConfig(input_path=src, output_path=out, run_id="S1", buckets=8))
    assert rep1["snapshot"]["seq"] == 0
    assert rep1["snapshot"]["operation"] == "overwrite"
    assert rep1["snapshot"]["doc_count"] == rep1["docs_out"]

    # full resume: all buckets done -> no new lineage rows -> no snapshot
    rep2 = run_extract(
        spark, ExtractConfig(input_path=src, output_path=out, run_id="S1", buckets=8, resume=True)
    )
    assert rep2["snapshot"] is None

    # fresh run id overwrites everything again -> seq 1
    rep3 = run_extract(spark, ExtractConfig(input_path=src, output_path=out, run_id="S2", buckets=8))
    assert rep3["snapshot"]["seq"] == 1

    hist = read_snapshots(spark, _os.path.join(out, "snapshots")).collect()
    assert [r["seq"] for r in hist] == [0, 1]
    assert all(r["n_buckets"] == 8 for r in hist)


def test_read_snapshots_missing_vs_corrupt(spark, tmp_path):
    """Missing path -> None (fresh table); a CORRUPT snapshots table must
    raise, not silently restart seq at 0 with a conflicting ledger row
    (ADVICE r1: only the path-not-found AnalysisException maps to None)."""
    import pytest as _pytest

    from corsearch_project_spark.sources.snapshots import read_snapshots

    assert read_snapshots(spark, str(tmp_path / "nope")) is None

    bad = tmp_path / "snapcorrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"PAR1 this is not parquet")
    with _pytest.raises(Exception):
        df = read_snapshots(spark, str(bad))
        assert df is not None  # must not be swallowed into the None arm
        df.collect()  # corruption surfaces at scan time at the latest
