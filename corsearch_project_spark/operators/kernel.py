"""The extraction kernel (SURVEY.md §2.2 E17): ONE vectorized Arrow stage.

``df.mapInPandas(kernel, EXTRACTED_KERNEL_SCHEMA)`` — iterator-of-batches
form so per-task setup (broadcast rule decode, module import) happens once
per task, then every batch crosses the JVM↔Python boundary as a single Arrow
RecordBatch (BASELINE.json:15: "vectorized pandas/Arrow UDFs with zero
per-row Python" — zero per-row *boundary crossings*; the per-document parse
loop inside the batch is the irreducible row-oriented part of extraction,
SURVEY.md §1.2).

The per-url digest used by the byte-identity pytest gate is computed here in
Python (hashlib) AND re-derivable JVM-side via F.sha2 (E18) — the test suite
checks both agree.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame

from corsearch_project_spark.sources.schemas import EXTRACTED_KERNEL_SCHEMA
from corsearch_project_spark.webextract.extract import extract_document
from corsearch_project_spark.webextract.rules import (
    Rule,
    rule_for_url,
    rules_from_plain,
)

KERNEL_INPUT_COLS = ("url", "html", "text")


def make_kernel(rules_bc) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """rules_bc: SparkContext.broadcast of the plain-dict rules config (E5),
    or a plain dict (single-process/golden mode)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        plain = rules_bc.value if hasattr(rules_bc, "value") else (rules_bc or {})
        rules: Dict[str, Rule] = rules_from_plain(plain)
        for pdf in batches:
            urls = pdf["url"].tolist()
            datas = pdf["html"].tolist()
            texts = pdf["text"].tolist() if "text" in pdf.columns else [None] * len(urls)
            out = {
                "url": [],
                "doc_kind": [],
                "extracted_text": [],
                "spans": [],
                "text_sha256": [],
                "n_blocks": [],
                "n_chars": [],
                "bytes_in": [],
                "extract_us": [],
            }
            for url, data, fb in zip(urls, datas, texts):
                t0 = time.perf_counter()
                r = extract_document(
                    url,
                    bytes(data) if data is not None else b"",
                    fb,
                    rule_for_url(url, rules),
                )
                dt_us = int((time.perf_counter() - t0) * 1e6)
                out["url"].append(r.url)
                out["doc_kind"].append(r.doc_kind)
                out["extracted_text"].append(r.text)
                out["spans"].append(
                    [
                        {"start": int(s), "end": int(e), "kind": k}
                        for (s, e, k) in r.spans
                    ]
                )
                out["text_sha256"].append(r.text_sha256)
                out["n_blocks"].append(r.n_blocks)
                out["n_chars"].append(r.n_chars)
                out["bytes_in"].append(r.bytes_in)
                out["extract_us"].append(dt_us)
            yield pd.DataFrame(out)

    return kernel


def run_kernel(pages: DataFrame, rules_bc) -> DataFrame:
    """pages(url, html, text, ...) -> extracted columns (kernel schema).

    Selects only the three kernel input columns first so Parquet column
    pruning keeps warc_ts/lang out of the Arrow transfer.
    """
    inp = pages.select(*KERNEL_INPUT_COLS)
    return inp.mapInPandas(make_kernel(rules_bc), schema=EXTRACTED_KERNEL_SCHEMA)
