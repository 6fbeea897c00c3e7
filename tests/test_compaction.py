"""P4 compaction: a fragmented bucketed table (tiny maxRecordsPerFile)
rewrites to ~one file per bucket with identical contents, and the swap is
content-preserving."""

import os

from pyspark.sql import functions as F

from corsearch_project_spark.fixtures.gen_pages import default_rules, gen_pages, pages_to_pandas
from corsearch_project_spark.operators.compaction import compact_extracted, table_file_stats
from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    inp = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(pages_to_pandas(gen_pages(300, seed=11))).write.parquet(inp)
    out = os.path.join(str(tmp_path), "out")
    cfg = ExtractConfig(
        input_path=inp, output_path=out, run_id="c1", buckets=8, salt=8,
        kernel_partitions=16, max_records_per_file=5,  # force fragmentation
    )
    run_extract(spark, cfg, default_rules())

    before_rows = {
        (r["url"], r["text_sha256"])
        for r in spark.read.parquet(cfg.extracted_path).select("url", "text_sha256").collect()
    }
    before = table_file_stats(cfg.extracted_path)
    assert before["n_files"] > 8, "fixture should be fragmented"

    stats = compact_extracted(spark, cfg.extracted_path, buckets=8,
                              target_records_per_file=100_000)
    assert stats["after"]["n_files"] <= 8
    assert stats["after"]["n_files"] < stats["before"]["n_files"]

    after_rows = {
        (r["url"], r["text_sha256"])
        for r in spark.read.parquet(cfg.extracted_path).select("url", "text_sha256").collect()
    }
    assert after_rows == before_rows
    # partition column survives the rewrite
    assert spark.read.parquet(cfg.extracted_path).select("url_bucket").distinct().count() <= 8


def test_compaction_zorder_option(spark, tmp_path):
    """OPTIMIZE-ZORDER-style compaction: rows inside each bucket sort by
    the Morton key of (n_chars, bytes_in), so per-file bounds tighten in
    both columns; row content and table totals are unchanged."""
    import os

    from corsearch_project_spark.fixtures.gen_pages import gen_pages, pages_to_pandas
    from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract

    src = os.path.join(str(tmp_path), "p.parquet")
    spark.createDataFrame(pages_to_pandas(gen_pages(80, seed=3))).write.parquet(src)
    out = os.path.join(str(tmp_path), "o")
    cfg = ExtractConfig(input_path=src, output_path=out, run_id="Z", buckets=4)
    run_extract(spark, cfg)

    table = cfg.extracted_path
    pre = spark.read.parquet(table)
    pre_rows = sorted(r["url"] for r in pre.select("url").collect())
    pre_total = pre.count()

    stats = compact_extracted(
        spark, table, buckets=4,
        zorder=(("n_chars", 0, 4096), ("bytes_in", 0, 65536)),
    )
    post = spark.read.parquet(table)
    assert post.count() == pre_total
    assert sorted(r["url"] for r in post.select("url").collect()) == pre_rows
    assert stats["after"]["n_files"] <= stats["before"]["n_files"]

    # inside each file, rows follow the Morton key order (spot check: the
    # recomputed key is non-decreasing within every parquet file)
    import pyarrow.parquet as pq

    from corsearch_project_spark.operators.zorder import quantize_sql, z_key_sql  # noqa: F401

    def ref_z(a, b):
        za = (max(0, min(4096, a))) * ((1 << 16) - 1) // 4096
        zb = (max(0, min(65536, b))) * ((1 << 16) - 1) // 65536
        z = 0
        for i in range(16):
            z |= ((za >> i) & 1) << (2 * i)
            z |= ((zb >> i) & 1) << (2 * i + 1)
        return z

    checked = 0
    for root, _, names in os.walk(table):
        for fn in names:
            if not fn.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, fn), columns=["n_chars", "bytes_in"])
            keys = [ref_z(a, b) for a, b in zip(
                t.column("n_chars").to_pylist(), t.column("bytes_in").to_pylist())]
            assert keys == sorted(keys), fn
            checked += 1
    assert checked > 0
