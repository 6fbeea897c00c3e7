"""Section-aware passage chunking (textstats.section_passages): the span
relation composed with sliding_passages."""

from __future__ import annotations

from pyspark.sql import functions as F

from corsearch_project_spark.operators.textstats import section_passages

SCHEMA = (
    "url string, extracted_text string, "
    "spans array<struct<start:long,end:long,kind:string>>"
)


def _row(url, blocks):
    """blocks = [(tag, text)] -> (url, joined text, spans) the extraction
    contract emits (blocks joined by one newline, spans index the text)."""
    text_parts, spans, pos = [], [], 0
    for tag, t in blocks:
        spans.append((pos, pos + len(t), tag))
        text_parts.append(t)
        pos += len(t) + 1
    return (url, "\n".join(text_parts), spans)


def test_sections_split_at_headings_and_carry_titles(spark):
    rows = [
        _row(
            "u1",
            [
                ("p", "pre amble words"),
                ("h2", "First Section"),
                ("p", "alpha beta gamma"),
                ("p", "delta epsilon"),
                ("h2", "Second Section"),
                ("li", "zeta eta"),
            ],
        ),
        _row("u2", [("p", "no headings at all here")]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = section_passages(df, chunk=64, stride=48).collect()
    by_key = {}
    for r in got:
        by_key[(r["url"], r["section_idx"])] = r
    # preamble: section 0, NULL title
    r0 = by_key[("u1", 0)]
    assert r0["section_title"] is None
    assert r0["passage"] == "pre amble words"
    # first section: blocks reassembled in span order, heading excluded
    r1 = by_key[("u1", 1)]
    assert r1["section_title"] == "First Section"
    assert r1["passage"] == "alpha beta gamma delta epsilon"
    r2 = by_key[("u1", 2)]
    assert r2["section_title"] == "Second Section"
    assert r2["passage"] == "zeta eta"
    # heading text never leaks into any passage
    assert all("Section" not in r["passage"] for r in got)
    # headless doc degrades to flat chunking: one section, NULL title
    r3 = by_key[("u2", 0)]
    assert r3["section_title"] is None
    assert r3["passage"] == "no headings at all here"


def test_long_section_windows_and_boundaries(spark):
    body = " ".join(f"w{i}" for i in range(150))
    rows = [
        _row("u", [("h2", "Big"), ("p", body), ("h2", "Tail"), ("p", "a b c")])
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = section_passages(df, chunk=64, stride=48).collect()
    big = sorted(
        (r for r in got if r["section_idx"] == 1), key=lambda r: r["chunk_id"]
    )
    # 150 tokens, chunk 64 / stride 48 -> ceil((150-64)/48)+1 = 3 windows
    assert [r["chunk_id"] for r in big] == [0, 1, 2]
    assert big[0]["passage"].startswith("w0 ")
    assert big[-1]["passage"].endswith("w149")
    # every window stays inside its section (no Tail tokens)
    assert all(r["section_title"] == "Big" for r in big)
    assert all("a b c" not in r["passage"] for r in big)
    tail = [r for r in got if r["section_idx"] == 2]
    assert len(tail) == 1 and tail[0]["passage"] == "a b c"


def test_real_extraction_roundtrip(spark):
    """Over REAL extract_html output on fixture pages: every passage's
    tokens appear in its document's extracted text, and any page whose
    kept blocks include an h-tag yields >= 2 sections."""
    import random

    from corsearch_project_spark.fixtures.gen_pages import make_html
    from corsearch_project_spark.webextract.htmlx import extract_html

    rows = []
    with_heading = 0
    for seed in range(30):
        html = make_html(random.Random(seed)).decode("utf-8", "replace")
        text, spans = extract_html(html)
        if not text:
            continue
        if any(k.startswith("h") for _, _, k in spans):
            with_heading += 1
        rows.append((f"u{seed}", text, [(s, e, k) for s, e, k in spans]))
    assert with_heading >= 3  # the fixture corpus must exercise headings
    df = spark.createDataFrame(rows, SCHEMA)
    got = section_passages(df).collect()
    texts = {u: t for u, t, _ in rows}
    for r in got:
        for tok in r["passage"].split(" "):
            assert tok in texts[r["url"]], (r["url"], tok)
    sectioned = {r["url"] for r in got if r["section_idx"] > 0}
    assert len(sectioned) >= 3


def test_plan_has_no_python_stage(spark):
    rows = [_row("u", [("h2", "T"), ("p", "a b")])]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = (
        section_passages(df)._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert marker not in plan
