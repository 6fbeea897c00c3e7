"""Robustness fuzzing: extract_document must never raise on arbitrary or
truncated input — at 10^12 docs every malformed byte sequence on the web
WILL occur, and one executor exception fails a whole task (SURVEY §7
hard-part 2: tolerance vs determinism)."""

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from corsearch_project_spark.webextract.extract import extract_document
from corsearch_project_spark.webextract.rules import DEFAULT_RULE
from corsearch_project_spark.fixtures.gen_pages import gen_page_row

SET = settings(
    max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@SET
@given(data=st.binary(max_size=4096))
def test_random_bytes_never_raise(data):
    res = extract_document("https://x.test/f", data, None, DEFAULT_RULE)
    assert res.text_sha256 == hashlib.sha256(res.text.encode("utf-8")).hexdigest()


@SET
@given(data=st.binary(max_size=2048))
def test_pdf_magic_random_tail_never_raises(data):
    res = extract_document("https://x.test/p", b"%PDF-1.4\n" + data, None, DEFAULT_RULE)
    assert res.doc_kind == "pdf"


@SET
@given(data=st.text(max_size=2048))
def test_html_ish_text_never_raises(data):
    payload = ("<html><body>" + data).encode("utf-8", "surrogatepass" if False else "replace")
    res = extract_document("https://x.test/h", payload, None, DEFAULT_RULE)
    assert res.n_chars == len(res.text)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**16), idx=st.integers(0, 2000), cut=st.floats(0.05, 0.95))
def test_truncated_real_documents_never_raise(seed, idx, cut):
    """Real generated HTML/PDF bytes cut mid-structure (the network-truncation
    case) must still extract deterministically."""
    r = gen_page_row(seed, idx)
    data = (r["html"] or b"")
    data = data[: int(len(data) * cut)]
    a = extract_document(r["url"], data, r["text"], DEFAULT_RULE)
    b = extract_document(r["url"], data, r["text"], DEFAULT_RULE)
    assert a.text_sha256 == b.text_sha256


def test_oversize_payload_is_skipped_deterministically():
    """rule.max_doc_bytes bounds per-row kernel memory: an over-cap payload
    yields doc_kind='oversize' with the empty-string digest instead of being
    parsed; under-cap behavior is unchanged."""
    import hashlib

    from corsearch_project_spark.webextract.extract import extract_document
    from corsearch_project_spark.webextract.rules import DEFAULT_RULE

    rule = DEFAULT_RULE.merged(max_doc_bytes=1024)
    big = b"<html><body>" + b"<p>x</p>" * 1000 + b"</body></html>"
    assert len(big) > 1024
    r = extract_document("http://h.example/big", big, None, rule)
    assert r.doc_kind == "oversize"
    assert r.text == "" and r.spans == [] and r.n_blocks == 0
    assert r.text_sha256 == hashlib.sha256(b"").hexdigest()
    assert r.bytes_in == len(big)

    small = b"<html><body><p>hello world, a real paragraph of text.</p></body></html>"
    r2 = extract_document("http://h.example/small", small, None, rule)
    assert r2.doc_kind == "html"


def test_adversarial_nesting_depth_is_capped():
    """Pages nested deeper than MAX_DOM_DEPTH must extract their text (flat
    attachment beyond the cap) instead of blowing the recursion limit —
    browsers cap the same way."""
    from corsearch_project_spark.webextract.extract import extract_document

    for depth in (600, 5000, 20000):
        doc = (
            b"<html><body>" + b"<div>" * depth
            + b"<p>deep text content here that should survive extraction fine.</p>"
            + b"</div>" * depth + b"</body></html>"
        )
        r = extract_document(f"http://deep.example/{depth}", doc, None)
        assert r.doc_kind == "html"
        assert "deep text content" in r.text


def test_adversarial_tokenizer_inputs_complete_quickly():
    """Megabyte attributes, entity floods, attribute soup, unclosed-tag
    floods and '<' floods must all extract without raising (and without
    regex blowups — each case is sub-second)."""
    from corsearch_project_spark.webextract.extract import extract_document

    cases = {
        "megattr": b'<html><body><p class="' + b"x" * 500_000
        + b'">text body of reasonable size here</p></body></html>',
        "entities": b"<html><body><p>" + b"&amp;" * 100_000 + b"</p></body></html>",
        "attr_soup": b"<html><body><div " + b"a=1 " * 50_000
        + b"><p>hello paragraph text content.</p></div></body></html>",
        "unclosed": b"<html><body>" + b"<p>seg text here " * 20_000 + b"</body></html>",
        "lt_flood": b"<html><body><p>" + b"< " * 100_000 + b"</p></body></html>",
    }
    for name, doc in cases.items():
        r = extract_document(f"http://adv.example/{name}", doc, None)
        assert r.doc_kind == "html", name


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**16), flips=st.lists(
    st.tuples(st.floats(0.0, 0.999), st.integers(0, 255)), min_size=1, max_size=8))
def test_corrupted_objstm_pdfs_never_raise(seed, flips):
    """PDF 1.5 compressed layouts under random byte corruption (flipped
    bytes hit the ObjStm payload, xref stream, predictor rows, CMaps…)
    must extract deterministically and never raise — the decode paths all
    follow skip-don't-raise."""
    import random as _random

    from corsearch_project_spark.fixtures.gen_pages import make_pdf

    data = bytearray(make_pdf(_random.Random(seed), force_layout="objstm"))
    for frac, val in flips:
        data[int(frac * len(data))] = val
    payload = bytes(data)
    a = extract_document("https://x.test/o", payload, None, DEFAULT_RULE)
    b = extract_document("https://x.test/o", payload, None, DEFAULT_RULE)
    assert a.text_sha256 == b.text_sha256


def test_encrypted_pdf_degrades_to_empty_not_crash():
    """A PDF with an /Encrypt trailer entry (RC4/AES content) cannot be
    decoded without key material; decoding anyway would emit ciphertext
    NOISE into the corpus, so detection must yield EMPTY text, never raise
    and never garbage — the crawl-scale contract."""
    import zlib as _z

    from corsearch_project_spark.webextract.pdfx import extract_pdf

    comp = _z.compress(b"BT /F1 12 Tf (ciphertext-bytes-here) Tj ET")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp + b"\nendstream",
        b"<< /Filter /Standard /V 2 /R 3 /O (o) /U (u) /P -44 >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += (b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R >>\n"
            b"startxref\n0\n%%EOF\n")
    t1 = extract_pdf(bytes(out))
    assert t1 == ("", [])  # detected: empty, not ciphertext noise
