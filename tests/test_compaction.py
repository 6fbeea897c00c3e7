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
