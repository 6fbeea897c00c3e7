#!/usr/bin/env python3
"""Page-QA audit over a raw pages table: the pre-extraction health report
a crawl operator reads before spending extraction/curation compute,
composing the round-4 QA operators (mojibake, soft-404, publish dates,
JSON-LD blocks, tables, image assets) into ONE scan + two host-keyed
shuffles.

  pages(url, warc_ts, html, text, lang) →
    1. per-page projection (scan-fused, zero Python): host, doc-kind gate
       (HTML vs PDF/zip container bytes), soft-404 flag, mojibake hits,
       publish-date source, JSON-LD block count, table shape counts
    2. ONE groupBy host for every page-level census — all the censuses
       key on host, so they ride a single shuffle instead of six
    3. image-asset census (needs its own explode for DISTINCT asset
       counting) — the second shuffle — left-joined onto the host audit
    4. <out>/host_audit parquet + one JSON summary line

At 10^12 pages the shape is exactly two linear shuffles over projected
columns; the html/text payloads never leave the scan stage. The binary
html column is utf-8-cast for probing; non-HTML containers (%PDF-, PK
zip) are gated out of the markup probes rather than decoded.

    spark-submit --py-files csp.zip jobs/audit_pages.py \
        --input /data/pages.parquet --output /data/audit
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corsearch_project_spark.operators import pagemeta as M
from corsearch_project_spark.operators import structured as S
from corsearch_project_spark.operators import textstats as X
from corsearch_project_spark.operators.linkgraph import url_host
from corsearch_project_spark.plans.session import build_session


def audit_pages(spark, input_path: str, output_path: str):
    pages = spark.read.parquet(input_path).select("url", "html", "text")
    html = F.col("html").cast("string")
    text = F.coalesce(F.col("text"), F.lit(""))
    lead = F.substring(html, 1, 5)
    is_html = ~(lead.startswith("%PDF-") | lead.startswith("PK"))

    # markup probes only fire on the HTML gate; text probes are total
    h = F.when(is_html, html).otherwise(F.lit(""))
    tc = S.tables_cells(h)
    zero = F.lit(0).cast("long")
    pd = M.publish_date(h, F.col("url"))
    per_page = pages.select(
        url_host(F.col("url")).alias("host"),
        is_html.cast("int").alias("is_html"),
        M.soft404(h, text).cast("int").alias("soft404"),
        X.mojibake_hits(text).alias("moji_hits"),
        (pd["src"] != "none").cast("int").alias("dated"),
        pd["date"].alias("pub_date"),
        F.size(S.jsonld_payloads(h)).cast("long").alias("n_jsonld"),
        F.size(tc).cast("long").alias("n_tables"),
        F.aggregate(tc, zero, lambda a, tb: a + F.size(tb)).alias(
            "n_table_rows"
        ),
    )
    audit = per_page.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("is_html").cast("long").alias("n_html"),
        F.sum("soft404").cast("long").alias("n_soft404"),
        F.sum((F.col("moji_hits") > 0).cast("int")).cast("long").alias(
            "n_mojibake"
        ),
        F.sum("moji_hits").cast("long").alias("moji_hits"),
        F.sum("dated").cast("long").alias("n_dated"),
        F.max("pub_date").alias("max_pub_date"),
        F.sum("n_jsonld").cast("long").alias("n_jsonld"),
        F.sum("n_tables").cast("long").alias("n_tables"),
        F.sum("n_table_rows").cast("long").alias("n_table_rows"),
    )

    imgs = S.image_asset_census(
        pages.select("url", html.alias("html"))
    )
    audit = audit.join(imgs, "host", "left").select(
        audit["*"],
        F.coalesce("n_refs", F.lit(0)).cast("long").alias("n_img_refs"),
        F.coalesce("n_assets", F.lit(0)).cast("long").alias("n_img_assets"),
        F.coalesce("n_offsite", F.lit(0)).cast("long").alias(
            "n_img_offsite"
        ),
    )

    audit_path = output_path.rstrip("/") + "/host_audit"
    audit.write.mode("overwrite").parquet(audit_path)

    out = spark.read.parquet(audit_path)
    tot = out.agg(
        F.count(F.lit(1)).alias("hosts"),
        F.sum("n_pages").alias("pages"),
        F.sum("n_html").alias("html_pages"),
        F.sum("n_soft404").alias("soft404_pages"),
        F.sum("n_mojibake").alias("mojibake_pages"),
        F.sum("n_dated").alias("dated_pages"),
        F.sum("n_jsonld").alias("jsonld_blocks"),
        F.sum("n_tables").alias("tables"),
        F.sum("n_img_refs").alias("image_refs"),
        F.sum("n_img_assets").alias("image_assets"),
    ).head()
    rep = {k: int(tot[k] or 0) for k in tot.asDict()}
    rep["audit_path"] = audit_path
    return rep


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not os.path.exists(args.input):
        print(f"error: input path does not exist: {args.input}",
              file=sys.stderr)
        return 1
    spark = build_session("audit_pages", master=args.master)
    print(json.dumps(audit_pages(spark, args.input, args.output)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
