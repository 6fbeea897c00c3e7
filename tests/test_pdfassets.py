"""PDF document assets (SURVEY.md §2 E23): /Info metadata, /Subtype /Link
URI annotations, /Outlines bookmarks.

Parity model: the fixture writer (gen_pages.make_pdf) returns its own
ground truth via ``_assets_out``; the reader must reproduce it exactly
across every file-layout/font arm. Encrypted docs are the documented skip
(string decryption is object-scoped; pdfx.extract_pdf_assets policy)."""

import random

import pytest

from corsearch_project_spark.fixtures.gen_pages import gen_pages, make_pdf
from corsearch_project_spark.webextract.pdfx import (
    _parse_pdf_date,
    _pdf_text_string,
    extract_pdf,
    extract_pdf_assets,
)


def _roundtrip(seed: int, **force) -> tuple:
    out: list = []
    data = make_pdf(random.Random(seed), _assets_out=out, **force)
    return data, out[0]


@pytest.mark.parametrize("layout", ["classic", "objstm"])
def test_assets_roundtrip_both_layouts(layout):
    hits = {"title": 0, "links": 0, "outline": 0, "utf16": 0}
    for seed in range(60):
        data, want = _roundtrip(seed, force_layout=layout)
        got = extract_pdf_assets(data)
        for k in ("title", "author", "subject", "producer", "created"):
            assert got[k] == want[k], (seed, k, got[k], want[k])
        assert got["links"] == want["links"], seed
        assert got["outline"] == want["outline"], seed
        if want["title"]:
            hits["title"] += 1
        if want["links"]:
            hits["links"] += 1
        if want["outline"]:
            hits["outline"] += 1
    # all three arms must actually fire in the sweep
    assert min(hits["title"], hits["links"], hits["outline"]) >= 5


@pytest.mark.parametrize("font", ["winansi", "tounicode", "type0", "diffs"])
def test_assets_font_arm_invariant(font):
    # asset material rides the derived stream, so a forced font arm never
    # changes it — and the reader finds it regardless of font machinery
    data, want = _roundtrip(7, force_font=font)
    got = extract_pdf_assets(data)
    assert got["title"] == want["title"]
    assert got["links"] == want["links"]


@pytest.mark.parametrize("enc", ["rc4", "aes", "aes256"])
def test_encrypted_docs_skip_assets_but_extract_text(enc):
    found_nonempty_plain = False
    for seed in range(20):
        data, want = _roundtrip(seed, force_encrypt=enc)
        assert want["title"] is None and not want["links"] and not want["outline"]
        got = extract_pdf_assets(data)
        assert got["title"] is None and got["links"] == [] and got["outline"] == []
        # the SAME seed unencrypted carries assets (policy skip, not absence)
        plain_data, plain_want = _roundtrip(seed, force_encrypt="none")
        if plain_want["title"]:
            found_nonempty_plain = True
            assert extract_pdf_assets(plain_data)["title"] == plain_want["title"]
        # body text still decrypts byte-identically
        assert extract_pdf(data)[0] == extract_pdf(plain_data)[0]
    assert found_nonempty_plain


def test_utf16_title_arm_fires_and_decodes():
    seen = 0
    for seed in range(200):
        data, want = _roundtrip(seed)
        if want["title"] is None:
            continue
        raw = data if b"/Title <" in data else None
        if raw is not None:
            seen += 1
            assert extract_pdf_assets(data)["title"] == want["title"]
    assert seen >= 5  # the 25% UTF-16BE band is exercised


def test_pdf_date_parser():
    assert _parse_pdf_date(b"D:20240102150405Z") == "2024-01-02T15:04:05+00:00"
    assert _parse_pdf_date(b"D:20240102150405+02'30'") == "2024-01-02T15:04:05+02:30"
    assert _parse_pdf_date(b"D:20240102150405-0700") == "2024-01-02T15:04:05-07:00"
    assert _parse_pdf_date(b"D:2024") == "2024-01-01T00:00:00"
    assert _parse_pdf_date(b"D:202403") == "2024-03-01T00:00:00"
    assert _parse_pdf_date(b"garbage") is None
    assert _parse_pdf_date(b"D:20241399000000") is None  # month 13
    assert _parse_pdf_date(None) is None


def test_pdf_text_string_decodings():
    assert _pdf_text_string(b"\xfe\xff\x00H\x00i") == "Hi"
    assert _pdf_text_string(b"\xef\xbb\xbfcaf\xc3\xa9") == "caf\xe9"
    assert _pdf_text_string(b"plain") == "plain"
    assert _pdf_text_string(None) is None


def test_assets_never_raise_on_garbage():
    for junk in (b"", b"%PDF-1.4 truncated", b"\x00" * 64, b"<html>%PDF-</html>"):
        a = extract_pdf_assets(junk)
        assert a["links"] == [] and a["outline"] == []


def test_spark_assets_kernel_matches_single_process(spark):
    from corsearch_project_spark.fixtures.gen_pages import pages_to_pandas
    from corsearch_project_spark.operators.kernel import run_doc_assets_kernel
    from corsearch_project_spark.sources.schemas import PAGES_SCHEMA
    from corsearch_project_spark.webextract.sniff import sniff_kind

    rows = gen_pages(150, seed=1212, skew="mild", dup_frac=0.0)
    pages = spark.createDataFrame(pages_to_pandas(rows), schema=PAGES_SCHEMA)
    got = {
        r["url"]: r.asDict(recursive=True)
        for r in run_doc_assets_kernel(pages).collect()
    }
    want_urls = {r["url"] for r in rows if sniff_kind(r["html"] or b"") == "pdf"}
    assert set(got) == want_urls and len(want_urls) >= 10
    for r in rows:
        if r["url"] not in want_urls:
            continue
        a = extract_pdf_assets(r["html"])
        g = got[r["url"]]
        assert g["title"] == a["title"] and g["created"] == a["created"]
        assert [(l["page"], l["uri"]) for l in g["links"]] == a["links"]
        assert [(o["depth"], o["title"]) for o in g["outline"]] == a["outline"]

    # plan gates: exactly one Python stage; binary pre-filter sits below it
    plan = run_doc_assets_kernel(pages)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") + plan.count("ArrowEvalPython") == 1


def test_spark_assets_plan_filters_before_python(spark, tmp_path):
    # over a parquet scan (not a constant-foldable local relation) the PDF
    # pre-filter must appear as a JVM Filter BELOW the single Python stage,
    # and the scan must prune to the two kernel input columns
    from corsearch_project_spark.fixtures.gen_pages import pages_to_pandas
    from corsearch_project_spark.operators.kernel import run_doc_assets_kernel
    from corsearch_project_spark.sources.schemas import PAGES_SCHEMA

    rows = gen_pages(40, seed=77, skew="mild", dup_frac=0.0)
    p = str(tmp_path / "pages.parquet")
    spark.createDataFrame(pages_to_pandas(rows), schema=PAGES_SCHEMA).write.parquet(p)
    df = run_doc_assets_kernel(spark.read.schema(PAGES_SCHEMA).parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") + plan.count("ArrowEvalPython") == 1
    assert "Filter" in plan and plan.index("MapInArrow") < plan.index("Filter")
    assert "ReadSchema" in plan and "warc_ts" not in plan.split("ReadSchema")[1]
    assert df.count() >= 1


def test_pipeline_with_pdf_assets_writes_catalog(spark, tmp_path):
    import os

    from corsearch_project_spark.fixtures.gen_pages import pages_to_pandas
    from corsearch_project_spark.plans.extract_pipeline import (
        ExtractConfig,
        run_extract,
    )
    from corsearch_project_spark.webextract.sniff import sniff_kind

    rows = gen_pages(120, seed=909, skew="mild", dup_frac=0.0)
    inp = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(pages_to_pandas(rows)).write.parquet(inp)
    cfg = ExtractConfig(
        input_path=inp,
        output_path=os.path.join(str(tmp_path), "out"),
        buckets=4,
        with_doc_assets=True,
    )
    report = run_extract(spark, cfg, None)
    assert "doc_assets" in report["phase_wall_s"]
    assets = spark.read.parquet(cfg.doc_assets_path)
    got = {r["url"]: r for r in assets.collect()}
    want = {
        r["url"]: extract_pdf_assets(r["html"])
        for r in rows
        if sniff_kind(r["html"] or b"") == "pdf"
    }
    assert set(got) == set(want) and len(want) >= 5
    for url, a in want.items():
        assert got[url]["title"] == a["title"]
        assert [(l["page"], l["uri"]) for l in got[url]["links"]] == a["links"]
    # partitioned like the main table: bucket pruning works on the catalog
    assert "url_bucket" in assets.columns


def test_pdf_link_edges_feed_the_host_graph(spark):
    from corsearch_project_spark.operators.kernel import run_doc_assets_kernel
    from corsearch_project_spark.operators.linkgraph import (
        host_edges,
        pdf_link_edges,
    )
    from corsearch_project_spark.fixtures.gen_pages import pages_to_pandas
    from corsearch_project_spark.sources.schemas import PAGES_SCHEMA

    rows = gen_pages(200, seed=333, skew="mild", dup_frac=0.0)
    pages = spark.createDataFrame(pages_to_pandas(rows), schema=PAGES_SCHEMA)
    assets = run_doc_assets_kernel(pages)
    edges = pdf_link_edges(assets)
    got = edges.collect()
    assert got, "fixture corpus must produce PDF link edges"
    # oracle: single-process extraction over the same rows
    want = {}
    for r in rows:
        a = extract_pdf_assets(r["html"] or b"")
        src = r["url"].split("/")[2].lower()
        for _, uri in a["links"]:
            dst = uri.split("/")[2].lower() if uri.startswith("http") else src
            want[(src, dst)] = want.get((src, dst), 0) + 1
    assert {(r["src_host"], r["dst_host"]): r["n_links"] for r in got} == want
    # the two arms union into one relation (same schema, one agg away)
    both = host_edges(pages).unionByName(edges)
    assert both.columns == ["src_host", "dst_host", "n_links"]


def test_assets_frozen_golden():
    """Cross-round drift alarm for the assets surface, the sibling of
    tests/test_golden_frozen.py: a pinned digest over every PDF's full
    asset record on the 400-doc golden corpus. Any change to Info/string
    decoding, date parsing, link or outline walking — or to the fixture
    writer's asset arms — fails here; if intentional, re-pin and say why
    in the commit message."""
    import hashlib
    import json

    from corsearch_project_spark.webextract.sniff import sniff_kind

    rows = gen_pages(400, seed=4242, skew="mild", dup_frac=0.0)
    h = hashlib.sha256()
    n_pdf = 0
    for r in rows:
        data = r["html"] or b""
        if sniff_kind(data) != "pdf":
            continue
        n_pdf += 1
        a = extract_pdf_assets(data)
        h.update(json.dumps(
            {"u": r["url"],
             **{k: a[k] for k in ("title", "author", "subject", "producer", "created")},
             "l": a["links"], "o": a["outline"]},
            sort_keys=True).encode())
    assert n_pdf == 62
    assert h.hexdigest() == (
        "ca48d69c165fe7c56403d6242717803240e13d9ce7b4e0ec6f4d9163782b5808"
    )


def test_assets_mutation_fuzz_never_raises():
    """Byte-mutation fuzz over valid PDFs: extract_pdf_assets must be
    total (empty shape or partial data, never an exception) under random
    corruption — the same never-crash bar the text extractor holds."""
    rng = random.Random(20260820)
    for seed in range(15):
        data = bytearray(make_pdf(random.Random(seed)))
        for _ in range(6):
            mutated = bytearray(data)
            for _ in range(rng.randint(1, 30)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            a = extract_pdf_assets(bytes(mutated))
            assert isinstance(a["links"], list) and isinstance(a["outline"], list)
            # truncation arm
            a2 = extract_pdf_assets(bytes(mutated[: rng.randrange(len(mutated))]))
            assert isinstance(a2["links"], list)


def test_doc_assets_kernel_docx_arm(spark):
    """DOCX rows join the assets catalog: Dublin-Core core.xml fields under
    kind='docx' with empty links/outline; a coreless DOCX still rows with
    null metadata; non-DOCX zips are dropped by the kernel re-sniff."""
    import io
    import zipfile

    from corsearch_project_spark.fixtures.gen_pages import make_docx
    from corsearch_project_spark.operators.kernel import run_doc_assets_kernel
    from corsearch_project_spark.webextract.docxx import docx_core_props

    rows, want = [], {}
    titled = coreless = 0
    for seed in range(30):
        out = []
        b = make_docx(random.Random(seed), _assets_out=out)
        url = f"https://d.test/{seed}"
        rows.append((url, b))
        want[url] = out[0]
        if out[0]["title"]:
            titled += 1
        else:
            coreless += 1
        assert docx_core_props(b)["title"] == out[0]["title"]
    assert titled >= 5 and coreless >= 3  # both arms fire
    # a plain (non-DOCX) zip must be dropped
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", "not a docx")
    rows.append(("https://d.test/plainzip", buf.getvalue()))

    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in run_doc_assets_kernel(df).collect()}
    assert "https://d.test/plainzip" not in got
    assert set(got) == set(want)
    for url, w in want.items():
        g = got[url]
        assert g["kind"] == "docx"
        assert g["title"] == w["title"] and g["author"] == w["author"]
        assert g["created"] == w["created"]
        assert g["links"] == [] and g["outline"] == []


def test_docx_core_props_bomb_guard_pre_decompression():
    """A deflate bomb in docProps/core.xml must be rejected by DECLARED
    size before decompression — the guard must never pay the inflated
    allocation (reproduced pre-fix: 256 MB peak from a 255 KB zip)."""
    import io
    import tracemalloc
    import zipfile

    from corsearch_project_spark.webextract.docxx import docx_core_props

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("word/document.xml", "<w:document/>")
        zf.writestr(
            "docProps/core.xml",
            b"<dc:title>" + b"A" * (64 << 20) + b"</dc:title>",
        )
    tracemalloc.start()
    out = docx_core_props(buf.getvalue())
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert out["title"] is None
    assert peak < 20e6  # bounded by the zip bytes, not the inflated size


def test_prefilter_window_matches_sniff_head(spark):
    """A PDF behind ~1.5 KiB of leading whitespace is still 'pdf' to
    sniff_kind (2 KiB stripped head) — the JVM pre-filter must admit it
    too, or the row silently vanishes from the catalog."""
    from corsearch_project_spark.operators.kernel import run_doc_assets_kernel
    from corsearch_project_spark.webextract.sniff import sniff_kind

    out = []
    body = make_pdf(random.Random(3), _assets_out=out)
    padded = b" " * 1500 + body
    assert sniff_kind(padded) == "pdf"
    df = spark.createDataFrame([("https://pad.test/x", padded)],
                               "url string, html binary")
    rows = run_doc_assets_kernel(df).collect()
    assert len(rows) == 1 and rows[0]["kind"] == "pdf"
