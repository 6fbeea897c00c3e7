"""Unit tests for the PDF core (SURVEY §5.2 layer 1, operators E11–E16)."""

import random
import zlib

from corsearch_project_spark.fixtures.gen_pages import make_pdf
from corsearch_project_spark.webextract.pdfx import (
    PdfDoc,
    extract_pdf,
    parse_object,
)
from corsearch_project_spark.webextract.rules import DEFAULT_RULE


def _simple_pdf(content: str, font: bytes = b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>") -> bytes:
    comp = zlib.compress(content.encode("cp1252"))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        font,
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    return bytes(out)


def test_parse_object_dict_array_ref():
    v, _ = parse_object(b"<< /A 1 /B (hi) /C [4 0 R 3.5] /D /Name >>", 0)
    assert v["/A"] == 1 and v["/B"] == b"hi" and v["/D"] == "/Name"
    ref = v["/C"][0]
    assert tuple(ref) == (4, 0) and v["/C"][1] == 3.5


def test_parse_string_escapes():
    v, _ = parse_object(rb"(a\(b\)c \\ \n \101)", 0)
    assert v == b"a(b)c \\ \n A"


def test_parse_hex_string():
    v, _ = parse_object(b"<48 65 6C6C6F>", 0)
    assert v == b"Hello"


def test_basic_text_extraction():
    pdf = _simple_pdf(
        "BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm (Hello world) Tj T* (second line) Tj ET"
    )
    text, spans = extract_pdf(pdf)
    assert text == "Hello world second line"
    assert spans == [(0, 23, "pdf:p1")]


def test_block_gap_splits_blocks():
    pdf = _simple_pdf(
        "BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm (para one) Tj "
        "1 0 0 1 72 650 Tm (para two) Tj ET"
    )
    text, spans = extract_pdf(pdf)
    assert text == "para one\npara two"
    assert len(spans) == 2


def test_line_tolerance_jitter_same_line():
    pdf = _simple_pdf(
        "BT /F1 12 Tf 1 0 0 1 72 720 Tm (left) Tj 1 0 0 1 110 722 Tm (right) Tj ET"
    )
    text, _ = extract_pdf(pdf)
    assert text == "left right"


def test_two_column_reading_order():
    pdf = _simple_pdf(
        "BT /F1 12 Tf 14 TL 1 0 0 1 320 720 Tm (RIGHT top) Tj T* (RIGHT bottom) Tj ET "
        "BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm (LEFT top) Tj T* (LEFT bottom) Tj ET"
    )
    text, _ = extract_pdf(pdf)
    assert text == "LEFT top LEFT bottom\nRIGHT top RIGHT bottom"


def test_tj_array_and_quote_ops():
    pdf = _simple_pdf(
        "BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm [(Hel) -100 (lo)] TJ (next) ' ET"
    )
    text, _ = extract_pdf(pdf)
    assert "Hel lo" in text and "next" in text


def test_winansi_decoding():
    pdf = _simple_pdf("BT /F1 12 Tf 1 0 0 1 72 720 Tm (caf\xe9 €uro) Tj ET")
    text, _ = extract_pdf(pdf)
    assert "café €uro" == text


def test_tounicode_cmap():
    for seed in range(80):
        pdf = make_pdf(random.Random(seed))
        if b"/ToUnicode" in pdf:
            text, spans = extract_pdf(pdf)
            assert text and spans
            return
    raise AssertionError("no ToUnicode fixture produced in 80 seeds")


def test_garbage_resilience():
    assert extract_pdf(b"%PDF-1.4 garbage") == ("", [])
    assert extract_pdf(b"") == ("", [])
    pdf = _simple_pdf("BT broken (unterminated")
    text, _ = extract_pdf(pdf)
    assert isinstance(text, str)


def test_rule_tolerances_respected():
    # with a huge block gap tolerance, the two paragraphs merge into one block
    pdf = _simple_pdf(
        "BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm (para one) Tj "
        "1 0 0 1 72 650 Tm (para two) Tj ET"
    )
    loose = DEFAULT_RULE.merged(pdf_block_gap=10.0)
    text, spans = extract_pdf(pdf, loose)
    assert text == "para one para two" and len(spans) == 1


def test_fixture_writer_roundtrip_deterministic():
    for seed in range(15):
        rng1, rng2 = random.Random(seed), random.Random(seed)
        p1, p2 = make_pdf(rng1), make_pdf(rng2)
        assert p1 == p2
        assert extract_pdf(p1) == extract_pdf(p2)
        t, s = extract_pdf(p1)
        assert t and s


def _hex_cids(s: str) -> str:
    return "<" + "".join(f"{ord(c):04X}" for c in s) + ">"


def test_type0_identity_h_with_tounicode():
    """2-byte CID show strings through a Type0/Identity-H font decode via
    the ToUnicode CMap — the composite-font case real crawl PDFs carry."""
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
        b"/Encoding /Identity-H >>"
    )
    pdf = _simple_pdf(
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm {_hex_cids('cid hello world')} Tj ET",
        font=font,
    )
    text, spans = extract_pdf(pdf)
    assert text == "cid hello world"
    assert spans and spans[0][2] == "pdf:p1"


def test_type0_tj_array_and_odd_byte():
    """TJ arrays of CID hex strings work; a dangling odd byte in a show
    string is dropped deterministically, never raised."""
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
        b"/Encoding /Identity-H >>"
    )
    pdf = _simple_pdf(
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm "
        f"[{_hex_cids('alpha')} -250 {_hex_cids('beta')}] TJ ET "
        f"BT /F1 12 Tf 1 0 0 1 72 700 Tm <006100> Tj ET",
        font=font,
    )
    text, _ = extract_pdf(pdf)
    assert "alpha beta" in text
    assert "a" in text  # <0061> decodes, the dangling 00 is dropped


def test_type0_fixture_arm_matches_single_byte_arms_bytewise():
    """The fixture writer's three font arms (winansi / single-byte CMap /
    Identity-H CIDs) must extract to IDENTICAL text+spans for the same seed
    — the byte-identity contract is font-encoding-invariant."""
    arms = ("winansi", "tounicode", "type0", "diffs", "ucs2", "gbk")
    for seed in (3, 11, 42):
        rngs = [random.Random(seed) for _ in range(len(arms))]
        outs = [
            extract_pdf(make_pdf(r, force_font=m)) for r, m in zip(rngs, arms)
        ]
        assert all(o == outs[0] for o in outs[1:])
        assert outs[0][0], "fixture page must extract non-empty text"


def test_objstm_layout_matches_classic_bytewise():
    """The fixture writer's two file-layout arms (classic xref/trailer vs
    PDF 1.5 ObjStm + xref stream) must extract IDENTICAL text+spans for the
    same seed — byte-identity is file-layout-invariant."""
    for seed in (3, 11, 42, 77):
        rngs = [random.Random(seed) for _ in range(2)]
        a = extract_pdf(make_pdf(rngs[0], force_layout="classic"))
        b = extract_pdf(make_pdf(rngs[1], force_layout="objstm"))
        assert a == b
        assert a[0]


def test_objstm_has_no_trailer_keyword_and_root_via_xref_stream():
    """/Root discovery in the objstm arm must genuinely go through the
    /Type /XRef stream dict (the layout real crawl PDFs use) — there is no
    `trailer` keyword to fall back on."""
    data = make_pdf(random.Random(5), force_layout="objstm")
    assert b"trailer" not in data
    assert b"/ObjStm" in data and b"/XRef" in data
    doc = PdfDoc(data)
    assert doc.trailer.get("/Root") is not None
    assert doc.pages(), "page tree must resolve out of the ObjStm container"


def test_stream_filters_ascii85_rle_lzw():
    import base64

    from corsearch_project_spark.webextract.pdfx import (
        StreamObj,
        _lzw_decode,
        _rle_decode,
    )

    doc = PdfDoc(b"%PDF-1.4\n")  # empty doc, used only for stream_bytes
    payload = b"BT (filter test) Tj ET " * 4

    a85 = base64.a85encode(payload) + b"~>"
    obj = StreamObj({"/Filter": "/ASCII85Decode", "/Length": len(a85)}, a85)
    assert doc.stream_bytes(obj) == payload

    # RunLength: L=4 copies 5 literal bytes, L=251 repeats next byte 6 times
    assert _rle_decode(b"\x04hello" + bytes([251]) + b"x" + b"\x80") == b"hello" + b"x" * 6
    obj = StreamObj({"/Filter": "/RunLengthDecode"}, b"\x02abc\x80")
    assert doc.stream_bytes(obj) == b"abc"

    # LZW round-trip against a hand-rolled encoder
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt = 258
        width = 9
        out = []
        bits = []
        def emit(code):
            bits.append((code, width))
        emit(256)
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                emit(table[w])
                table[wc] = nxt
                nxt += 1
                if nxt >= (1 << width) - 1 and width < 12:
                    width += 1
                w = bytes([ch])
        if w:
            emit(table[w])
        emit(257)
        acc = n = 0
        ba = bytearray()
        for code, wd in bits:
            acc = (acc << wd) | code
            n += wd
            while n >= 8:
                ba.append((acc >> (n - 8)) & 0xFF)
                n -= 8
        if n:
            ba.append((acc << (8 - n)) & 0xFF)
        return bytes(ba)

    msg = b"TOBEORNOTTOBEORTOBEORNOT" * 8
    assert _lzw_decode(lzw_encode(msg)) == msg
    obj = StreamObj({"/Filter": "/LZWDecode"}, lzw_encode(payload))
    assert doc.stream_bytes(obj) == payload


def test_png_predictor_up_roundtrip():
    from corsearch_project_spark.webextract.pdfx import StreamObj

    doc = PdfDoc(b"%PDF-1.4\n")
    rowlen = 7
    rows = [bytes((i * 13 + j * 7) % 256 for j in range(rowlen)) for i in range(9)]
    raw = bytearray()
    prior = bytes(rowlen)
    for row in rows:
        raw += bytes([2]) + bytes((row[j] - prior[j]) & 0xFF for j in range(rowlen))
        prior = row
    comp = zlib.compress(bytes(raw))
    obj = StreamObj(
        {
            "/Filter": "/FlateDecode",
            "/DecodeParms": {"/Predictor": 12, "/Columns": rowlen},
        },
        comp,
    )
    assert doc.stream_bytes(obj) == b"".join(rows)


def _pdf_with_form(form_content: bytes, page_content: str,
                   matrix: bytes = b"") -> bytes:
    """Page whose /Contents invokes a Form XObject via Do."""
    comp = zlib.compress(page_content.encode("cp1252"))
    fstream = zlib.compress(form_content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> /XObject << /Fm1 6 0 R >> >> "
        b"/Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<< /Type /XObject /Subtype /Form " + matrix
        + b"/Resources << /Font << /F1 4 0 R >> >> "
        b"/Length %d /Filter /FlateDecode >>\nstream\n" % len(fstream)
        + fstream
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    return bytes(out)


def test_form_xobject_text_is_extracted():
    """Text living inside a /Subtype /Form XObject (invoked by Do) must be
    extracted — real crawl PDFs put body text in forms routinely."""
    pdf = _pdf_with_form(
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (form body text here) Tj ET",
        "BT /F1 12 Tf 1 0 0 1 72 720 Tm (page text first) Tj ET /Fm1 Do",
    )
    text, spans = extract_pdf(pdf)
    assert "page text first" in text
    assert "form body text here" in text


def test_form_xobject_matrix_translation_orders_lines():
    """A form /Matrix translation must map form runs into page space: a
    form drawn at y=0 with matrix ty=650 lands BETWEEN page lines at 700
    and 600 in reading order."""
    pdf = _pdf_with_form(
        b"BT /F1 12 Tf 1 0 0 1 72 0 Tm (middle line) Tj ET",
        "BT /F1 12 Tf 1 0 0 1 72 700 Tm (top line) Tj ET /Fm1 Do "
        "BT /F1 12 Tf 1 0 0 1 72 600 Tm (bottom line) Tj ET",
        matrix=b"/Matrix [1 0 0 1 0 650] ",
    )
    text, _ = extract_pdf(pdf)
    assert text.index("top line") < text.index("middle line") < text.index(
        "bottom line"
    )


def test_form_xobject_depth_cap_no_infinite_recursion():
    """A form that invokes itself must terminate via the depth cap."""
    fstream = zlib.compress(
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (loop) Tj ET /Fm1 Do"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> /XObject << /Fm1 5 0 R >> >> "
        b"/Contents 6 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
        b"<< /Type /XObject /Subtype /Form "
        b"/Resources << /Font << /F1 4 0 R >> /XObject << /Fm1 5 0 R >> >> "
        b"/Length %d /Filter /FlateDecode >>\nstream\n" % len(fstream)
        + fstream
        + b"\nendstream",
    ]
    page = zlib.compress(b"/Fm1 Do")
    objs.append(
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(page)
        + page
        + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    text, _ = extract_pdf(bytes(out))
    assert "loop" in text  # extracted, bounded times, no hang/raise


def test_inline_image_binary_is_skipped():
    """BI…ID…EI binary payloads can contain byte runs that parse as text
    operators — the interpreter must jump the blob, not tokenize it."""
    evil = b"\x00\x01(fake text) Tj BT ET\xff\xfe EI-not-it x"
    content = (
        "BT /F1 12 Tf 1 0 0 1 72 720 Tm (before image) Tj ET "
        "BI /W 4 /H 4 /BPC 8 /CS /RGB ID ".encode()
        + evil
        + b" EI\nBT /F1 12 Tf 1 0 0 1 72 700 Tm (after image) Tj ET"
    )
    comp = zlib.compress(content)
    pdf = _simple_pdf("")  # template only; rebuild with raw bytes content
    # build directly: reuse _simple_pdf layout with custom bytes
    objs_content = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream"
    )
    pdf = pdf.replace(
        pdf[pdf.index(b"5 0 obj\n") + 8 : pdf.index(b"\nendobj\n5" if False else b"\nendobj\ntrailer")],
        objs_content,
    )
    text, _ = extract_pdf(pdf)
    assert "before image" in text
    assert "after image" in text
    assert "fake text" not in text


def test_form_fixture_arm_matches_direct_content_bytewise():
    """The fixture writer's form arm (page content routed through an
    identity-matrix Form XObject) must extract IDENTICAL text+spans to the
    direct-content arm for the same seed, across both file layouts."""
    for seed in (3, 11, 42):
        for lay in ("classic", "objstm"):
            rngs = [random.Random(seed) for _ in range(2)]
            a = extract_pdf(make_pdf(rngs[0], force_layout=lay, force_form=False))
            b = extract_pdf(make_pdf(rngs[1], force_layout=lay, force_form=True))
            assert a == b
            assert a[0]


def test_ascii85_z_shorthand_and_whitespace():
    """Real PDF ASCII85 streams use the 'z' zero-group shorthand and wrap
    lines with whitespace — both must decode."""
    import base64

    from corsearch_project_spark.webextract.pdfx import StreamObj

    doc = PdfDoc(b"%PDF-1.4\n")
    payload = b"\0\0\0\0" + b"stream with zero groups" + b"\0\0\0\0"
    enc = base64.a85encode(payload)
    assert enc.startswith(b"z")  # encoder emits the shorthand
    wrapped = enc[:10] + b"\n  " + enc[10:] + b"~>"
    obj = StreamObj({"/Filter": "/ASCII85Decode"}, wrapped)
    assert doc.stream_bytes(obj) == payload


def test_lzw_code_width_transitions():
    """LZW width must bump at table sizes 511/1023/2047 (the 'early change'
    convention TIFF-style PDF LZW uses); a long low-entropy stream crosses
    all three boundaries."""
    from corsearch_project_spark.webextract.pdfx import _lzw_decode

    # reuse the reference encoder from the earlier test, inline minimal copy
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        bits = [(256, 9)]
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                bits.append((table[w], width))
                table[wc] = nxt
                nxt += 1
                if nxt >= (1 << width) - 1 and width < 12:
                    width += 1
                w = bytes([ch])
        if w:
            bits.append((table[w], width))
        bits.append((257, width))
        acc = n = 0
        ba = bytearray()
        for code, wd in bits:
            acc = (acc << wd) | code
            n += wd
            while n >= 8:
                ba.append((acc >> (n - 8)) & 0xFF)
                n -= 8
        if n:
            ba.append((acc << (8 - n)) & 0xFF)
        return bytes(ba)

    msg = bytes(range(256)) * 40  # grows the table past 2048 entries
    assert _lzw_decode(lzw_encode(msg)) == msg


# ---------------------------------------------------------------------------
# Standard security handler (pdfcrypt): empty-user-password decryption
# ---------------------------------------------------------------------------


def test_encrypted_pdf_rc4_and_aes_extract_byte_identical():
    """RC4 /R 3 and AESV2 /R 4 documents with an empty user password must
    extract EXACTLY the plaintext document's text (ISO 32000-1 §7.6.3;
    round-2 verdict item 5 — these were detected-and-skipped before)."""
    import random

    from corsearch_project_spark.fixtures.gen_pages import make_pdf

    for mode in ("rc4", "aes"):
        for seed in (0, 7, 23):
            plain = make_pdf(
                random.Random(seed), force_encrypt="none", force_layout="classic"
            )
            enc = make_pdf(random.Random(seed), force_encrypt=mode)
            assert b"/Encrypt" in enc
            t0, s0 = extract_pdf(plain)
            t1, s1 = extract_pdf(enc)
            assert t0 and t1 == t0 and s1 == s0


def test_password_protected_pdf_still_skips():
    """A REAL (non-empty) user password cannot be authenticated — output
    must stay deterministically empty, not ciphertext noise."""
    import random
    import re

    from corsearch_project_spark.fixtures.gen_pages import make_pdf
    from corsearch_project_spark.webextract import pdfcrypt as C

    enc = make_pdf(random.Random(3), force_encrypt="rc4")
    # corrupt /U so no password (in particular the empty one) authenticates
    m = re.search(rb"/U <([0-9a-f]+)>", enc)
    assert m
    bogus = b"00" * (len(m.group(1)) // 2)
    broken = enc[: m.start(1)] + bogus + enc[m.end(1) :]
    assert extract_pdf(broken) == ("", [])
    # and a genuinely password-derived U: authenticate against "secret"
    o = C.compute_o_value(b"own", b"secret", 3, 16)
    key = C.compute_encryption_key(b"secret", o, -3904, b"x" * 16, 3, 16)
    u = C.compute_u_value(key, b"x" * 16, 3)
    assert C.authenticate_user_password(b"", o, u, -3904, b"x" * 16, 3, 16) is None
    assert (
        C.authenticate_user_password(b"secret", o, u, -3904, b"x" * 16, 3, 16)
        == key
    )


def test_unsupported_encryption_modes_skip():
    """Malformed V5 (no /UE to unwrap the file key from) and unknown crypt
    filters are out of scope: deterministic empty output, never noise."""
    import random

    from corsearch_project_spark.fixtures.gen_pages import make_pdf

    enc = make_pdf(random.Random(11), force_encrypt="aes")
    v5 = enc.replace(b"/V 4 /R 4", b"/V 5 /R 6")  # AESV2 dict has no /UE
    assert extract_pdf(v5) == ("", [])
    aesv3 = enc.replace(b"/CFM /AESV2", b"/CFM /AESV3")
    assert extract_pdf(aesv3) == ("", [])


def test_encrypted_pdf_aes256_r6_extracts_byte_identical():
    """AES-256 /V 5 /R 6 documents with an empty user password must extract
    EXACTLY the plaintext document's text (ISO 32000-2 §7.6.4; round-3
    verdict item 5 — R6 previously skipped deterministically)."""
    import random

    from corsearch_project_spark.fixtures.gen_pages import make_pdf

    for seed in (0, 7, 23):
        plain = make_pdf(
            random.Random(seed), force_encrypt="none", force_layout="classic"
        )
        enc = make_pdf(random.Random(seed), force_encrypt="aes256")
        assert b"/V 5 /R 6" in enc and b"/UE <" in enc
        t0, s0 = extract_pdf(plain)
        t1, s1 = extract_pdf(enc)
        assert t0 and t1 == t0 and s1 == s0


def test_aes256_r6_password_protected_still_skips():
    """An R6 document whose user password is non-empty must stay skipped
    (authenticate_r6_user returns None, output deterministically empty)."""
    import hashlib
    import random
    import re

    from corsearch_project_spark.fixtures.gen_pages import make_pdf
    from corsearch_project_spark.webextract import pdfcrypt as C

    # real-password /U//UE computed directly
    fk = hashlib.sha256(b"k").digest()
    salts = hashlib.sha256(b"s").digest()
    vals = C.compute_r6_values(b"real-password", fk, -3904, salts)
    assert C.authenticate_r6_user(b"", vals["U"], vals["UE"]) is None
    assert C.authenticate_r6_user(b"real-password", vals["U"], vals["UE"]) == fk
    assert C.verify_perms_r6(fk, vals["Perms"], -3904)

    # and end-to-end: corrupt the document's /U hash -> skip
    enc = make_pdf(random.Random(5), force_encrypt="aes256")
    m = re.search(rb"/U <([0-9a-f]+)>", enc)
    assert m and len(m.group(1)) == 96  # 48 bytes
    bogus = b"00" * 32 + m.group(1)[64:]  # zero the 32-byte hash, keep salts
    broken = enc[: m.start(1)] + bogus + enc[m.end(1) :]
    assert extract_pdf(broken) == ("", [])


def test_evp_fast_path_parity_with_pure_python():
    """The optional OpenSSL EVP path (stdlib ctypes; import-time
    FIPS-vector self-test) must agree byte-for-byte with the pure-Python
    word loops on random keys/ivs/lengths, both directions, both key
    sizes. On hosts without libcrypto the test reduces to pure-pure."""
    import random

    from corsearch_project_spark.webextract import pdfcrypt as C

    r = random.Random(31337)
    for _ in range(24):
        key = bytes(r.randrange(256) for _ in range(r.choice([16, 32])))
        iv = bytes(r.randrange(256) for _ in range(16))
        data = bytes(r.randrange(256) for _ in range(16 * r.randrange(1, 8)))
        pure_e = C._cbc_encrypt_words(C._expand_key_words(key), iv, data)
        assert C._cbc_encrypt_nopad(key, iv, data) == pure_e  # whatever path
        assert C._cbc_decrypt_nopad(key, iv, pure_e) == data
        if C._EVP is not None:
            assert C._evp_cbc_lib(C._EVP, key, iv, data, True) == pure_e
            assert C._evp_cbc_lib(C._EVP, key, iv, pure_e, False) == data


def test_aes256_public_test_vector_and_r5():
    from corsearch_project_spark.webextract import pdfcrypt as C

    # FIPS-197 appendix C.3 (AES-256)
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = C._expand_key_words(key)
    ct = C._encrypt_block_fast(pt, rk)
    assert ct == bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert C._decrypt_block_fast(ct, C._decrypt_key_words(rk)) == pt
    # CBC roundtrip with the 256-bit key through the stream-layout helpers
    for n in (0, 1, 15, 16, 17):
        msg = bytes(range(n))
        assert (
            C.aes128_cbc_decrypt(key, C.aes128_cbc_encrypt(key, b"\x01" * 16, msg))
            == msg
        )
    # the deprecated /R 5 single-SHA-256 variant round-trips too
    import hashlib

    fk = hashlib.sha256(b"r5").digest()
    vals = C.compute_r6_values(b"", fk, -4, hashlib.sha256(b"t").digest(), r=5)
    assert C.authenticate_r6_user(b"", vals["U"], vals["UE"], r=5) == fk


def test_pdfcrypt_public_test_vectors():
    from corsearch_project_spark.webextract import pdfcrypt as C

    # FIPS-197 appendix C.1
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = C._encrypt_block(pt, C._expand_key(key))
    assert ct == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert C._decrypt_block(ct, C._expand_key(key)) == pt
    # classic RC4 vector
    assert C.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    # CBC padding edges roundtrip
    for n in (0, 1, 15, 16, 17):
        msg = bytes(range(n))
        assert C.aes128_cbc_decrypt(key, C.aes128_cbc_encrypt(key, b"\x01" * 16, msg)) == msg


def test_rc4_evp_fast_path_matches_pure_python():
    """When the OpenSSL legacy provider is available, rc4() dispatches to
    EVP; keystream must equal the pure-Python reference for the PDF key
    sizes (5-16 bytes) including the empty-payload edge."""
    import random

    from corsearch_project_spark.webextract import pdfcrypt as C

    if not C._EVP_RC4:
        import pytest

        pytest.skip("OpenSSL legacy provider unavailable — pure path only")
    rng = random.Random(17)
    for _ in range(64):
        key = bytes(rng.randrange(256) for _ in range(rng.randint(5, 16)))
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 257)))
        assert C._evp_rc4_lib(C._EVP, key, data) == C._rc4_py(key, data)


# ---------------------------------------------------------------------------
# Simple-font /Differences encoding arrays (§9.6.6.3)
# ---------------------------------------------------------------------------


def test_differences_font_arm_matches_winansi_bytewise():
    """The diffs fixture arm re-encodes five letters through a
    /Differences array (AGL names + an algorithmic uniXXXX name); extracted
    text and spans must be byte-identical to the winansi arm — across the
    classic, objstm and encrypted layouts too."""
    import random

    from corsearch_project_spark.fixtures.gen_pages import make_pdf

    for seed in (0, 5, 9):
        want, ws = extract_pdf(make_pdf(random.Random(seed), force_font="winansi"))
        assert want
        got, gs = extract_pdf(make_pdf(random.Random(seed), force_font="diffs"))
        assert (got, gs) == (want, ws)
        enc = make_pdf(random.Random(seed), force_font="diffs", force_encrypt="rc4")
        want_c, _ = extract_pdf(
            make_pdf(random.Random(seed), force_font="winansi", force_layout="classic",
                     force_encrypt="none")
        )
        assert extract_pdf(enc)[0] == want_c


def test_differences_table_semantics():
    """Direct decoder check: consecutive names advance the code, a new int
    restarts it, unnamed codes fall through to the base encoding, unknown
    names go to U+FFFD."""
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (\xc8\xc9 normal \xd0\xd1\xd2) Tj ET"
    comp = zlib.compress(content)
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /T "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [200 /emdash /eacute 208 /uni0041 /nosuchglyph /germandbls] >> >>\nendobj\n"
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    text, _ = extract_pdf(pdf)
    # 200=emdash 201=eacute; 208=A (uni0041) 209=U+FFFD 210=ß
    assert text == "—é normal A�ß"


def test_glyph_name_algorithmic_fallbacks():
    from corsearch_project_spark.webextract.pdfx import _glyph_to_unicode

    assert _glyph_to_unicode("a") == "a"
    assert _glyph_to_unicode("emdash") == "—"
    assert _glyph_to_unicode("uni20AC") == "€"
    assert _glyph_to_unicode("u1F600") == "😀"
    assert _glyph_to_unicode("madeupname") == "�"


def test_aes_ttable_fast_path_matches_reference():
    """The T-table fast path must agree with the byte-at-a-time reference
    implementation on random keys/blocks (both directions)."""
    import random

    from corsearch_project_spark.webextract import pdfcrypt as C

    r = random.Random(77)
    for _ in range(64):
        k = bytes(r.randrange(256) for _ in range(16))
        b = bytes(r.randrange(256) for _ in range(16))
        rkw = C._expand_key_words(k)
        ct = C._encrypt_block(b, C._expand_key(k))
        assert C._encrypt_block_fast(b, rkw) == ct
        assert C._decrypt_block_fast(ct, C._decrypt_key_words(rkw)) == b


def test_macroman_base_encoding():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /T "
        b"/Encoding /MacRomanEncoding >>"
    )
    # target bytes 0x8E (MacRoman é) and 0xD0 (MacRoman en dash), written
    # via their cp1252 characters since _simple_pdf encodes with cp1252
    pdf = _simple_pdf(
        "BT /F1 12 Tf 1 0 0 1 72 720 Tm (cafŽ Ð ok) Tj ET", font=font
    )
    text, _ = extract_pdf(pdf)
    assert text == "café – ok"


def _hex_of(b: bytes) -> str:
    return "<" + b.hex().upper() + ">"


def test_predefined_cmap_gbk_euc():
    """/GBK-EUC-H predefined CMap (Adobe-GB1): show-string bytes are GBK —
    the stdlib codec decodes them, mixed 1-byte ASCII + 2-byte hanzi,
    without any ToUnicode CMap present (PDF 32000-1 Table 118)."""
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light "
        b"/Encoding /GBK-EUC-H >>"
    )
    payload = "你好 world 中文".encode("gbk")
    pdf = _simple_pdf(
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm {_hex_of(payload)} Tj ET",
        font=font,
    )
    text, spans = extract_pdf(pdf)
    assert text == "你好 world 中文"
    assert spans and spans[0][2] == "pdf:p1"


def test_predefined_cmap_rksj_and_uhc():
    """Shift-JIS (90ms-RKSJ-H) and UHC (KSCms-UHC-H) predefined CMaps
    decode through their legacy codecs; vertical -V suffix resolves too."""
    from corsearch_project_spark.webextract.pdfx import FontDecoder

    class _NoDoc:
        def resolve(self, x):
            return x

    fd = FontDecoder(
        _NoDoc(),
        {"/Subtype": "/Type0", "/Encoding": "/90ms-RKSJ-H"},
    )
    assert fd.decode("abc 日本語".encode("shift_jis")) == (
        "abc 日本語"
    )
    fd = FontDecoder(
        _NoDoc(),
        {"/Subtype": "/Type0", "/Encoding": "/KSCms-UHC-V"},
    )
    assert fd.decode("한국어 ok".encode("cp949")) == (
        "한국어 ok"
    )


def test_predefined_cmap_ucs2_surrogates():
    """Uni*-UCS2/UTF16 families: the 2-byte codes ARE UTF-16BE. Unlike the
    bare chr-per-pair Identity fallback, the codec joins surrogate pairs
    (U+1D11E below) into one code point."""
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /KozMinPro "
        b"/Encoding /UniJIS-UCS2-H >>"
    )
    payload = "日本 \U0001d11e ok".encode("utf-16-be")
    pdf = _simple_pdf(
        f"BT /F1 12 Tf 1 0 0 1 72 720 Tm {_hex_of(payload)} Tj ET",
        font=font,
    )
    text, _ = extract_pdf(pdf)
    assert text == "日本 \U0001d11e ok"


def test_predefined_cmap_tounicode_precedence():
    """A ToUnicode CMap keeps precedence over a Uni* (UTF-16) predefined
    encoding (§9.10.2: ToUnicode is the authoritative text mapping), but
    for legacy multibyte charsets the codec path wins — it is the only
    correctly-segmenting decode for mixed 1-/2-byte codes."""
    from corsearch_project_spark.webextract.pdfx import FontDecoder, PdfDoc

    # Build a real doc so /ToUnicode stream resolution works end-to-end.
    tounicode = (
        b"begincmap\n1 beginbfchar\n<0041> <0042>\nendbfchar\nendcmap"
    )
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
        b"/Encoding /UniGB-UCS2-H /ToUnicode 6 0 R >>"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        font,
        b"<< /Length %d >>\nstream\n%s\nendstream"
        % (
            len(b"BT /F1 12 Tf 1 0 0 1 72 720 Tm <0041> Tj ET"),
            b"BT /F1 12 Tf 1 0 0 1 72 720 Tm <0041> Tj ET",
        ),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(tounicode), tounicode),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    text, _ = extract_pdf(bytes(out))
    assert text == "B"  # ToUnicode remap wins over the UCS2 identity


def test_embedded_cmap_mixed_width_codespace():
    """A CMap stream as /Encoding (§9.7.5.3) with a 1-byte ASCII codespace
    and a 2-byte CJK codespace: segmentation follows codespacerange, so
    <41 8140> decodes as code 0x41 then code 0x8140 — a fixed 2-byte reader
    would mis-split into 0x4181, 0x40. ToUnicode maps both codes."""
    cmapdata = (
        b"begincmap\n"
        b"2 begincodespacerange\n<00> <7F>\n<8140> <FCFC>\nendcodespacerange\n"
        b"2 begincidrange\n<41> <5A> 100\n<8140> <8150> 500\nendcidrange\n"
        b"endcmap"
    )
    tounicode = (
        b"begincmap\n2 beginbfchar\n<0041> <0061>\n<8140> <4E9C>\n"
        b"endbfchar\nendcmap"
    )
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm <418140> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
        b"/Encoding 6 0 R /ToUnicode 7 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Length %d /CMapName /Custom >>\nstream\n%s\nendstream"
        % (len(cmapdata), cmapdata),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(tounicode), tounicode),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    text, _ = extract_pdf(bytes(out))
    assert text == "a亜"


def test_embedded_cmap_cid_fallback_without_tounicode():
    """Without ToUnicode, an embedded CMap still segments correctly and
    falls back to chr(CID) via cidrange — deterministic, never raises."""
    from corsearch_project_spark.webextract.pdfx import FontDecoder

    class _Doc:
        def resolve(self, x):
            return x

        def stream_bytes(self, s):
            return s.data

    class _Stream:
        def __init__(self, data):
            self.data = data

    from corsearch_project_spark.webextract import pdfx

    cmapdata = (
        b"1 begincodespacerange\n<00> <7F>\nendcodespacerange\n"
        b"1 begincidrange\n<41> <5A> 65\nendcidrange\n"
        b"1 begincidchar\n<21> 33\nendcidchar\n"
    )
    stream = pdfx.StreamObj({}, b"")
    stream.raw = cmapdata

    class _Doc2:
        def resolve(self, x):
            return x

        def stream_bytes(self, s):
            return cmapdata

    fd = FontDecoder(
        _Doc2(), {"/Subtype": "/Type0", "/Encoding": stream}
    )
    assert fd.decode(b"AB!") == "AB!"
