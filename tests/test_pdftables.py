"""E24 ruling-free PDF table recovery (webextract/pdfx.py:pdf_tables +
operators/kernel.py:run_doc_tables_kernel) plus the DOCX markup arm
(webextract/docxx.py:docx_tables) and the --with-doc-tables catalog.

The fixture arm (gen_pages.make_pdf(force_table=True)) draws its grid from
a derived rng stream, so the SAME seed yields the SAME words/arms/assets
with and without the table — the frozen golden corpus is untouched — and
returns the generator's ground truth through _tables_out. Detection parity
is generator-truth vs detector-over-real-bytes, across every reader arm.
"""

from __future__ import annotations

import random

import pytest

from corsearch_project_spark.fixtures.gen_pages import make_pdf
from corsearch_project_spark.webextract.pdfx import pdf_tables

ARMS = (
    {},
    {"force_layout": "objstm"},
    {"force_font": "type0"},
    {"force_font": "tounicode"},
    {"force_font": "diffs"},
    {"force_encrypt": "rc4"},
    {"force_encrypt": "aes"},
    {"force_encrypt": "aes256"},
    {"force_form": True},
)


def _norm(tables):
    return [(t["page"], tuple(tuple(r) for r in t["rows"])) for t in tables]


@pytest.mark.parametrize("arm", ARMS, ids=lambda a: "+".join(a) or "default")
def test_detector_matches_generator_truth_across_arms(arm):
    for seed in range(8):
        gt: list = []
        pdf = make_pdf(
            random.Random(seed), force_table=True, _tables_out=gt, **arm
        )
        assert _norm(pdf_tables(pdf)) == _norm(gt), (seed, arm)


def test_no_false_positives_on_plain_corpus():
    """Prose pages (including the two-column arm) must never read as
    tables: 1-column lines are single cells, 2-column groups are excluded
    by min_cols=3 (the documented stream-mode limitation), TJ kerning
    splits re-merge under cell_gap."""
    for seed in range(80):
        pdf = make_pdf(random.Random(seed))
        assert pdf_tables(pdf) == [], seed


def test_table_arm_leaves_same_seed_corpus_unchanged():
    """force_table must not shift rng/lay_rng consumption: the no-table
    render of any seed is byte-identical before/after the arm existed."""
    for seed in (0, 7, 23):
        a = make_pdf(random.Random(seed))
        b = make_pdf(random.Random(seed), force_table=False)
        assert a == b


def test_min_rows_and_min_cols_gates():
    gt: list = []
    pdf = make_pdf(random.Random(3), force_table=True, _tables_out=gt)
    # raising min_rows above the largest fixture grid suppresses everything
    assert pdf_tables(pdf, min_rows=7) == []
    # raising min_cols above the widest grid suppresses everything
    assert pdf_tables(pdf, min_cols=5) == []


def test_detector_total_on_garbage():
    assert pdf_tables(b"") == []
    assert pdf_tables(b"%PDF-1.4 not really") == []
    assert pdf_tables(b"\x00" * 512) == []


def test_encrypted_unsupported_returns_empty():
    """Real-password docs are ciphertext: the detector must skip, not
    emit noise (same stance as extract_pdf)."""
    gt: list = []
    pdf = make_pdf(random.Random(5), force_table=True, _tables_out=gt,
                   force_encrypt="rc4")
    assert _norm(pdf_tables(pdf)) == _norm(gt)
    from corsearch_project_spark.webextract import pdfcrypt

    # flip a nibble of the /U hex entry so the empty user password no
    # longer validates (fixture writes /U <hex>)
    i = pdf.find(b"/U <")
    assert i != -1, "fixture layout changed; /U not hex"
    flip = b"0" if pdf[i + 4 : i + 5] != b"0" else b"f"
    broken = pdf[: i + 4] + flip + pdf[i + 5 :]
    assert pdf_tables(broken) == []
    assert pdfcrypt is not None  # imported = decrypt path exercised above


def test_docx_tables_match_generator_truth():
    from corsearch_project_spark.fixtures.gen_pages import make_docx
    from corsearch_project_spark.webextract.docxx import docx_tables

    for seed in range(12):
        gt: list = []
        doc = make_docx(random.Random(seed), force_table=True, _tables_out=gt)
        assert _norm(docx_tables(doc)) == _norm(gt), seed
        # table-less render of the same seed yields nothing
        assert docx_tables(make_docx(random.Random(seed), force_table=False)) == []


def test_docx_tables_total_on_garbage():
    from corsearch_project_spark.webextract.docxx import docx_tables

    assert docx_tables(b"") == []
    assert docx_tables(b"PK\x03\x04 not a zip really") == []
    assert docx_tables(b"%PDF-1.4") == []


def test_spark_kernel_matches_single_process_mixed_kinds(spark):
    from corsearch_project_spark.fixtures.gen_pages import make_docx

    rows = []
    want = []
    for i in range(6):
        gt: list = []
        pdf = make_pdf(
            random.Random(100 + i),
            force_table=True,
            _tables_out=gt,
            **ARMS[i % len(ARMS)],
        )
        rows.append((f"u{i}", bytearray(pdf)))
        for t_i, tab in enumerate(gt):
            for r_i, row in enumerate(tab["rows"]):
                want.append(
                    (f"u{i}", "pdf", tab["page"], t_i, r_i, tab["n_cols"],
                     "|".join(row))
                )
    for i in range(3):
        gt = []
        doc = make_docx(random.Random(200 + i), force_table=True,
                        _tables_out=gt)
        rows.append((f"d{i}", bytearray(doc)))
        for t_i, tab in enumerate(gt):
            for r_i, row in enumerate(tab["rows"]):
                want.append(
                    (f"d{i}", "docx", 0, t_i, r_i, tab["n_cols"],
                     "|".join(row))
                )
    from corsearch_project_spark.operators.kernel import run_doc_tables_kernel

    docs = spark.createDataFrame(rows, "url string, html binary")
    out = run_doc_tables_kernel(docs)
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted(want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") + plan.count("ArrowEvalPython") == 1


def test_kernel_prefilters_non_document_rows(spark):
    """HTML rows must be dropped JVM-side (the document-magic predicate);
    a quoting HTML page that sneaks past it and a non-DOCX zip must be
    dropped by the extractors' own validation, not crash the kernel."""
    import io
    import zipfile

    from corsearch_project_spark.operators.kernel import run_doc_tables_kernel

    gt: list = []
    pdf = make_pdf(random.Random(11), force_table=True, _tables_out=gt)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "not a docx")
    rows = [
        ("u_pdf", bytearray(pdf)),
        ("u_html", bytearray(b"<html><body>hello</body></html>")),
        ("u_quote", bytearray(b"<p>the magic is %PDF-1.4 quoted</p>")),
        ("u_zip", bytearray(buf.getvalue())),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    got = run_doc_tables_kernel(docs).collect()
    assert {r["url"] for r in got} == {"u_pdf"}


def test_pipeline_with_doc_tables_writes_catalog(spark, tmp_path):
    """--with-doc-tables end-to-end: the catalog lands bucketed beside the
    extracted table and every row reproduces the single-process extraction
    for its url."""
    import os

    from corsearch_project_spark.fixtures.gen_pages import (
        gen_pages,
        pages_to_pandas,
    )
    from corsearch_project_spark.plans.extract_pipeline import (
        ExtractConfig,
        run_extract,
    )
    from corsearch_project_spark.webextract.docxx import docx_tables
    from corsearch_project_spark.webextract.sniff import sniff_kind

    from corsearch_project_spark.fixtures.gen_pages import make_docx

    src = os.path.join(str(tmp_path), "pages")
    rows = gen_pages(120, seed=31)
    # guarantee table-carrying documents of BOTH kinds in the corpus (the
    # default corpus never rolls the test-only table arm)
    for i in range(4):
        rows.append(
            dict(
                url=f"https://tables.example.com/pdf{i}",
                warc_ts=rows[0]["warc_ts"],
                html=make_pdf(random.Random(900 + i), force_table=True,
                              **ARMS[i % len(ARMS)]),
                text=None,
                lang="en",
            )
        )
        rows.append(
            dict(
                url=f"https://tables.example.com/docx{i}",
                warc_ts=rows[0]["warc_ts"],
                html=make_docx(random.Random(900 + i), force_table=True),
                text=None,
                lang="en",
            )
        )
    spark.createDataFrame(pages_to_pandas(rows)).write.parquet(src)
    out = os.path.join(str(tmp_path), "out")
    report = run_extract(
        spark,
        ExtractConfig(
            input_path=src, output_path=out, run_id="T1", buckets=4,
            with_doc_tables=True,
        ),
        None,
    )
    assert "doc_tables" in report["phase_wall_s"]
    cat = spark.read.parquet(os.path.join(out, "doc_tables"))
    assert set(cat.columns) >= {
        "url", "kind", "page", "table_idx", "row_idx", "n_cols", "cells",
        "url_bucket",
    }
    got_rows = cat.collect()
    by_url = {}
    for r in got_rows:
        by_url.setdefault(r["url"], []).append(r)
    # re-crawled urls: the pipeline dedupes to the latest fetch — compare
    # against that payload, not whichever duplicate came last in the list
    payload = {}
    latest_ts = {}
    for r in rows:
        if r["url"] not in payload or r["warc_ts"] >= latest_ts[r["url"]]:
            payload[r["url"]] = bytes(r["html"] or b"")
            latest_ts[r["url"]] = r["warc_ts"]
    assert any(r["kind"] == "pdf" for r in got_rows)
    assert any(r["kind"] == "docx" for r in got_rows)
    for url, rs in by_url.items():
        data = payload[url]
        kind = sniff_kind(data)
        single = pdf_tables(data) if kind == "pdf" else docx_tables(data)
        want = [
            "|".join(row) for tab in single for row in tab["rows"]
        ]
        have = [
            r["cells"]
            for r in sorted(rs, key=lambda r: (r["table_idx"], r["row_idx"]))
        ]
        assert have == want, url


def test_kernel_kind_policy_matches_assets_kernel(spark):
    """A %PDF- header behind non-whitespace junk sniffs as non-document
    engine-wide; the tables kernel must agree with the assets kernel
    (neither emits a row), never silently diverge from what the extracted
    table calls the url."""
    from corsearch_project_spark.operators.kernel import (
        run_doc_assets_kernel,
        run_doc_tables_kernel,
    )
    from corsearch_project_spark.webextract.sniff import sniff_kind

    gt: list = []
    clean = make_pdf(random.Random(42), force_table=True, _tables_out=gt)
    junky = b"<!-- junk prefix -->\n" + clean
    assert sniff_kind(junky) != "pdf"  # the policy premise
    docs = spark.createDataFrame(
        [("u_clean", bytearray(clean)), ("u_junky", bytearray(junky))],
        "url string, html binary",
    )
    tables_urls = {r["url"] for r in run_doc_tables_kernel(docs).collect()}
    assets_urls = {r["url"] for r in run_doc_assets_kernel(docs).collect()}
    assert tables_urls == {"u_clean"}
    assert "u_junky" not in assets_urls
