"""E24 ruling-free PDF table recovery (webextract/pdfx.py:pdf_tables +
operators/kernel.py:run_pdf_tables_kernel).

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


def test_spark_kernel_matches_single_process(spark):
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
                    (f"u{i}", tab["page"], t_i, r_i, tab["n_cols"],
                     "|".join(row))
                )
    from corsearch_project_spark.operators.kernel import run_pdf_tables_kernel

    docs = spark.createDataFrame(rows, "url string, html binary")
    out = run_pdf_tables_kernel(docs)
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted(want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") + plan.count("ArrowEvalPython") == 1


def test_kernel_prefilters_non_pdf_rows(spark):
    """HTML rows must be dropped JVM-side (the %PDF- head predicate), and
    a quoting HTML page that sneaks past it must be dropped by the
    detector's own validation, not crash the kernel."""
    from corsearch_project_spark.operators.kernel import run_pdf_tables_kernel

    gt: list = []
    pdf = make_pdf(random.Random(11), force_table=True, _tables_out=gt)
    rows = [
        ("u_pdf", bytearray(pdf)),
        ("u_html", bytearray(b"<html><body>hello</body></html>")),
        ("u_quote", bytearray(b"<p>the magic is %PDF-1.4 quoted</p>")),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    got = run_pdf_tables_kernel(docs).collect()
    assert {r["url"] for r in got} == {"u_pdf"}
