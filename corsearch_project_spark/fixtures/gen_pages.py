"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §B).

Everything is a pure function of (seed, doc_index): one
``random.Random(seed ^ doc_index)`` per document, no module-level RNG state,
no wall clock — so the corpus and therefore the golden digests are
reproducible bit-for-bit across processes and cluster sizes
(BASELINE.json:6 byte-identity; task brief: "synthesise it deterministically
at small scale; no external data").

Shape mandated by BASELINE.json:15:
pages(url string, warc_ts timestamp, html binary, text string, lang string)

Mix: ~78% HTML (boilerplate shell + 1–8 content blocks, entity references,
deliberate malformations, charset variants), ~15% PDF (our own minimal writer,
subset-matched to webextract.pdfx), ~7% raw text (passthrough path). Hosts
are Zipf-skewed (top host ≈ half the docs when skew='heavy') to make salted
repartitioning load-bearing (BASELINE.json:6 "skewed hosts").
"""

from __future__ import annotations

import datetime as _dt
import random
import zlib
from typing import Dict, List, Optional, Tuple

from corsearch_project_spark.webextract.rules import Rule

# ---------------------------------------------------------------------------
# Vocabulary / sentence soup (seeded)
# ---------------------------------------------------------------------------

_WORDS = (
    "data spark engine table page content extraction pipeline cluster shard "
    "bucket partition shuffle arrow batch vector column schema parquet byte "
    "stream window join filter select group order lineage digest resume text "
    "block score density link anchor heading article story report market "
    "science culture travel energy finance health nature museum harbor winter "
    "summer garden signal metric quorum ledger horizon canvas timber copper "
    "meadow falcon quartz delta sierra tango victor whiskey yankee zulu"
).split()

_LANGS = ("en", "fr", "es", "zh", "de")

HOSTS = (
    "news.example.com",
    "blog.alpha-site.org",
    "docs.betaworks.io",
    "shop.gamma-mart.net",
    "forum.delta-hub.com",
    "wiki.epsilon.org",
    "media.zeta-press.co.uk",
    "labs.eta-research.edu",
    "mag.theta-daily.com",
    "archive.iota-lib.org",
)

# Zipf-ish host weights; 'heavy' makes HOSTS[0] ≈ 50% of docs (skew fixture).
_HOST_WEIGHTS = {
    "mild": [24, 18, 14, 11, 9, 7, 6, 5, 3, 3],
    "heavy": [50, 14, 9, 7, 5, 4, 4, 3, 2, 2],
}


def default_rules() -> Dict[str, Rule]:
    """~10 distinct per-source rules so config dispatch is load-bearing
    in tests (FIXTURES.md §B)."""
    base_strip = ("nav", "footer", "aside", "form", "header", "menu")
    return {
        "*": Rule("*", base_strip, ("article", "main")),
        "example.com": Rule(
            "example.com", base_strip + ("promo",), ("article", "main"), 15.0, 0.4
        ),
        "alpha-site.org": Rule(
            "alpha-site.org", base_strip, ("article", "main", "post"), 25.0, 0.5
        ),
        "betaworks.io": Rule(
            "betaworks.io", base_strip + ("toc",), ("main",), 18.0, 0.6
        ),
        "gamma-mart.net": Rule(
            "gamma-mart.net", base_strip + ("related", "reviews"), ("main",), 30.0, 0.35
        ),
        "delta-hub.com": Rule("delta-hub.com", base_strip, ("article",), 12.0, 0.55),
        "epsilon.org": Rule("epsilon.org", base_strip, ("article", "main"), 20.0, 0.5),
        "zeta-press.co.uk": Rule(
            "zeta-press.co.uk", base_strip, ("article",), 22.0, 0.45,
            pdf_line_tol=0.5, pdf_block_gap=1.8,
        ),
        "eta-research.edu": Rule(
            "eta-research.edu", base_strip, ("main",), 16.0, 0.5,
            pdf_line_tol=0.4, pdf_block_gap=1.5,
        ),
        "theta-daily.com": Rule(
            "theta-daily.com", base_strip + ("trending",), ("article",), 20.0, 0.5
        ),
        "iota-lib.org": Rule(
            "iota-lib.org", base_strip, ("main", "article"), 14.0, 0.5,
            charset_override=None,
        ),
    }


def _sentence(rng: random.Random, lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    if n > 8 and rng.random() < 0.6:
        k = rng.randint(2, n - 2)
        ws[k] = ws[k] + ","
    return " ".join(ws) + rng.choice((".", ".", ".", "!", "?"))


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 5) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


# ---------------------------------------------------------------------------
# HTML writer
# ---------------------------------------------------------------------------

_ENTITY_SAMPLES = (
    ("&amp;", "&"),
    ("&eacute;", "é"),
    ("&#233;", "é"),
    ("&quot;", '"'),
    ("&lt;tag&gt;", "<tag>"),
    ("&#x2014;", "—"),
)


def make_html(rng: random.Random) -> bytes:
    nav_items = "".join(
        f'<li><a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS).title()}</a></li>'
        for _ in range(rng.randint(3, 7))
    )
    n_blocks = rng.randint(1, 8)
    content_parts: List[str] = []
    for bi in range(n_blocks):
        kind = rng.random()
        if bi == 0 and rng.random() < 0.5:
            content_parts.append(f"<h2>{_sentence(rng, 4, 8)}</h2>")
        if kind < 0.6:
            p = _paragraph(rng)
            if rng.random() < 0.3:  # inject entity references
                ent, _ = rng.choice(_ENTITY_SAMPLES)
                p = p + " Caf" + ent + " style."
            closer = "</p>" if rng.random() < 0.7 else ""  # unclosed <p> variant
            content_parts.append(f"<p>{p}{closer}")
        elif kind < 0.8:
            items = "".join(
                f"<li>{_sentence(rng, 8, 14)}</li>" for _ in range(rng.randint(2, 4))
            )
            content_parts.append(f"<ul>{items}</ul>")
        else:
            content_parts.append(f"<blockquote>{_paragraph(rng, 1, 2)}</blockquote>")
    if rng.random() < 0.25:
        content_parts.append("</div>")  # stray end tag (recovery exercise)
    attr_q = rng.choice(('class="story-body" id=main-text', "class='story-body'"))
    doc = (
        "<!doctype html><html><head><title>Page Title Here</title>"
        "<style>body{margin:0}</style>"
        "<script>var trk=1;function f(){return '<p>not content</p>'}</script>"
        "</head><body>"
        f"<nav><ul>{nav_items}</ul></nav>"
        '<header class="masthead">Site Masthead Banner</header>'
        f'<div {attr_q}><article>'
        + "".join(content_parts)
        + "</article></div>"
        f'<aside class="sidebar"><p>{_sentence(rng)} sponsored deal click now!</p></aside>'
        '<div class="ad-banner">Buy cheap deals now</div>'
        "<footer>&copy; 2024 Example Corp &mdash; "
        '<a href="/privacy">Privacy</a> <a href="/terms">Terms</a></footer>'
        "</body></html>"
    )
    charset_roll = rng.random()
    if charset_roll < 0.10:
        # latin-1 with meta charset declaration
        doc = doc.replace("<head>", '<head><meta charset="ISO-8859-1">', 1)
        return doc.encode("latin-1", errors="replace")
    if charset_roll < 0.18:
        return b"\xef\xbb\xbf" + doc.encode("utf-8")  # BOM'd utf-8
    return doc.encode("utf-8")


# ---------------------------------------------------------------------------
# Minimal PDF writer (subset-matched to webextract.pdfx — FIXTURES.md §B)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


_TOUNICODE_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <00> <FF> endcodespacerange
1 beginbfrange <20> <7E> <0020> endbfrange
2 beginbfchar <E9> <00E9> <80> <20AC> endbfchar
endcmap end end
"""

# 2-byte codespace CMap for the Type0/Identity-H arm: CID == code point
# over printable ASCII (what the synthetic text uses).
_TOUNICODE_CMAP_CID = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfrange <0020> <007E> <0020> endbfrange
endcmap end end
"""


def _encrypt_objects(
    objs: List[bytes], mode: str, id_rng: random.Random
) -> Tuple[List[bytes], bytes]:
    """Apply standard-security-handler encryption (empty user password) to a
    classic-layout object list: every stream payload is replaced by its
    RC4 (/V 2 /R 3), AES-128-CBC (/V 4 /R 4 /CFM /AESV2), or AES-256-CBC
    (/V 5 /R 6 /CFM /AESV3, mode ``aes256``) ciphertext, an /Encrypt dict
    is appended, and the trailer additions (/Encrypt ref + /ID) are
    returned. Key material and IVs come from ``id_rng`` — a stream derived
    from the encryption roll, never from the main word rng (frozen-golden
    discipline)."""
    import re as _re

    from corsearch_project_spark.webextract import pdfcrypt as C

    id0 = bytes(id_rng.randrange(256) for _ in range(16))
    p = -3904  # print+extract denied — the typical restricted-doc mask
    if mode == "aes256":
        r, v = 6, 5
        file_key = bytes(id_rng.randrange(256) for _ in range(32))
        salts = bytes(id_rng.randrange(256) for _ in range(32))
        r6 = C.compute_r6_values(b"", file_key, p, salts)
    else:
        r, v = (3, 2) if mode == "rc4" else (4, 4)
        nb = 16  # /Length 128
        o_val = C.compute_o_value(b"fixture-owner-secret", b"", r, nb)
        file_key = C.compute_encryption_key(b"", o_val, p, id0, r, nb)
        u_val = C.compute_u_value(file_key, id0, r)

    new_objs: List[bytes] = []
    for num, body in enumerate(objs, start=1):
        m = body.find(b"stream\n")
        if m >= 0 and body.endswith(b"\nendstream"):
            payload = body[m + 7 : -10]
            if mode == "aes256":
                # /V 5: the FILE key encrypts directly, no per-object key
                iv = bytes(id_rng.randrange(256) for _ in range(16))
                ct = C.aes128_cbc_encrypt(file_key, iv, payload)
            else:
                okey = C.object_key(file_key, num, 0, mode == "aes")
                if mode == "aes":
                    iv = bytes(id_rng.randrange(256) for _ in range(16))
                    ct = C.aes128_cbc_encrypt(okey, iv, payload)
                else:
                    ct = C.rc4(okey, payload)
            head = _re.sub(
                rb"/Length \d+", b"/Length %d" % len(ct), body[:m], count=1
            )
            body = head + b"stream\n" + ct + b"\nendstream"
        new_objs.append(body)

    if mode == "aes256":
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> >>"
            % (
                p,
                r6["O"].hex().encode(),
                r6["U"].hex().encode(),
                r6["OE"].hex().encode(),
                r6["UE"].hex().encode(),
                r6["Perms"].hex().encode(),
            )
        )
    elif mode == "aes":
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF /O <%s> /U <%s> >>"
            % (p, o_val.hex().encode(), u_val.hex().encode())
        )
    else:
        enc_dict = (
            b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d "
            b"/O <%s> /U <%s> >>"
            % (p, o_val.hex().encode(), u_val.hex().encode())
        )
    new_objs.append(enc_dict)
    idhex = id0.hex().encode()
    trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
        len(new_objs),
        idhex,
        idhex,
    )
    return new_objs, trailer_extra


def make_pdf(
    rng: random.Random,
    force_font: str | None = None,
    force_layout: str | None = None,
    force_form: bool | None = None,
    force_encrypt: str | None = None,
    _assets_out: list | None = None,
    force_table: bool = False,
    _tables_out: list | None = None,
) -> bytes:
    """1–3 pages; FlateDecode content streams using only
    BT/ET, Tf, Tm, Td, TD, TL, T*, Tj, TJ, ', Tc, Tw; three font arms —
    WinAnsi, single-byte ToUnicode CMap, and Type0/Identity-H with 2-byte
    CIDs shown as hex strings (the composite-font case real crawl PDFs
    carry) — and two FILE-LAYOUT arms: ``classic`` (xref table + trailer
    keyword, PDF 1.4) and ``objstm`` (PDF 1.5 compressed layout: all
    non-stream objects packed into a FlateDecode /ObjStm, trailer dict
    carried by a /Type /XRef cross-reference stream with PNG-Up-predicted
    entry rows — the dominant shape of real crawl PDFs). Both arms encode
    the SAME words, so extracted text is layout-invariant.

    A third arm (``use_form`` / ``force_form``) routes ~25% of PDFs' page
    content through an identity-matrix /Subtype /Form XObject invoked by
    ``Do`` — the pdftex/stamping shape — with extraction proven
    form-invariant.

    ``force_font`` ∈ {winansi, tounicode, type0, diffs, ucs2, gbk},
    ``force_layout`` ∈
    {classic, objstm} and ``force_form`` pin the arms for tests WITHOUT
    changing rng consumption (rolls are always drawn; the layout roll derives from the
    font roll rather than the main stream, so pre-layout corpora keep
    byte-identical words), so the same seed yields the same words under
    every arm combination."""
    n_pages = rng.randint(1, 3)
    roll = rng.random()
    # [0,.3) tounicode | [.3,.4) diffs (simple font + /Differences array —
    # round-3 addition, carved from the winansi band; text is arm-invariant
    # so pre-diffs goldens hold) | [.4,.85) winansi | [.85,1) type0
    font_mode = force_font or (
        "tounicode"
        if roll < 0.3
        else ("diffs" if roll < 0.4 else ("type0" if roll >= 0.85 else "winansi"))
    )
    # layout roll from a derived stream: must not consume from `rng` (the
    # frozen golden corpus pins the word stream drawn after this point)
    lay_rng = random.Random(int(roll * (1 << 53)))
    layout = force_layout or ("objstm" if lay_rng.random() < 0.35 else "classic")
    # ~25% of PDFs route page content through a /Subtype /Form XObject with
    # an identity matrix (the pdftex/stamping shape real crawl PDFs carry):
    # same words, same coordinates — extraction must be form-invariant.
    use_form = lay_rng.random() < 0.25 if force_form is None else force_form
    # ~15% of PDFs are standard-security-handler encrypted with an EMPTY
    # user password (permissions-restricted but freely openable — the common
    # crawl shape): 7% RC4 /R 3, 5% AESV2 /R 4, 3% AES-256 /R 6 (round-4
    # addition, carved from the former 'none' band so the rc4/aes
    # assignments of every seed are unchanged). Drawn from the derived
    # stream (roll #3) so the word stream and the two existing arm rolls
    # are untouched; extraction must be encryption-invariant, which the
    # frozen-golden suite then proves byte-for-byte. Encrypted docs use the
    # classic layout (encrypted-ObjStm is a rarer combination; the reader
    # handles it, the fixture doesn't emit it).
    enc_roll = lay_rng.random()
    encrypt = (
        force_encrypt
        if force_encrypt is not None
        else (
            "rc4"
            if enc_roll < 0.07
            else "aes"
            if enc_roll < 0.12
            else "aes256"
            if enc_roll < 0.15
            else "none"
        )
    )
    if encrypt not in ("none", None):
        if force_layout == "objstm":
            encrypt = "none"  # a forced arm always wins over a roll
        else:
            layout = "classic"
    # Predefined-CMap sub-arms (round-3 addition, derived-stream roll #4 so
    # the word stream and rolls #1–#3 are untouched): 40% of the type0 band
    # becomes /UniGB-UCS2-H (2-byte UTF-16BE codes, NO ToUnicode — decode
    # rides the predefined-CMap codec path), and 8% of the winansi band
    # becomes /GBK-EUC-H (GBK bytes; ASCII words ⊂ GBK, so text is
    # arm-invariant and pre-cjk goldens hold).
    cmap_roll = lay_rng.random()
    if force_font is None:
        if font_mode == "type0" and cmap_roll < 0.4:
            font_mode = "ucs2"
        elif font_mode == "winansi" and cmap_roll < 0.08:
            font_mode = "gbk"
    objs: List[bytes] = []  # 1-indexed

    def add(obj: bytes) -> int:
        objs.append(obj)
        return len(objs)

    font_num_holder: List[int] = []
    page_nums: List[int] = []

    catalog_num = add(b"")  # placeholder, patched later
    pages_num = add(b"")

    if font_mode == "tounicode":
        cmap_stream = zlib.compress(_TOUNICODE_CMAP)
        cmap_num = add(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(cmap_stream)
            + cmap_stream
            + b"\nendstream"
        )
        font_num = add(
            b"<< /Type /Font /Subtype /TrueType /BaseFont /SynthSans "
            b"/ToUnicode %d 0 R >>" % cmap_num
        )
    elif font_mode == "type0":
        cmap_stream = zlib.compress(_TOUNICODE_CMAP_CID)
        cmap_num = add(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(cmap_stream)
            + cmap_stream
            + b"\nendstream"
        )
        desc_num = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        font_num = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, cmap_num)
        )
    elif font_mode == "ucs2":
        # Type0 with a PREDEFINED CMap name and no ToUnicode: the reader
        # must recognize /UniGB-UCS2-H as "codes are UTF-16BE" (public
        # Adobe CMap-name → charset mapping; pdfx._PREDEF_CMAP_CODECS).
        desc_num = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthGB "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
            b"/Supplement 5 >> >>"
        )
        font_num = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthGB "
            b"/Encoding /UniGB-UCS2-H /DescendantFonts [%d 0 R] >>" % desc_num
        )
    elif font_mode == "gbk":
        # Type0 with the legacy /GBK-EUC-H CMap: show strings are GBK
        # bytes (mixed-width charset; the fixture's ASCII words are the
        # 1-byte subset), decoded via the stdlib gbk codec.
        desc_num = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthGBK "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
            b"/Supplement 5 >> >>"
        )
        font_num = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthGBK "
            b"/Encoding /GBK-EUC-H /DescendantFonts [%d 0 R] >>" % desc_num
        )
    elif font_mode == "diffs":
        # Simple font whose /Encoding dict remaps five letters to high
        # codes through a /Differences array (four AGL names + one
        # algorithmic uniXXXX name) — the subset-font shape verdict item 8
        # targets. The writer re-encodes those letters in show strings; the
        # extractor must map them back, so text stays arm-invariant.
        font_num = add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /SynthDiff "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [200 /a /e /o /t /uni0073] >> >>"
        )
    else:
        font_num = add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        )
    font_num_holder.append(font_num)
    hexmode = font_mode in ("type0", "ucs2")
    diff_trans = (
        str.maketrans({"a": "\xc8", "e": "\xc9", "o": "\xca", "t": "\xcb", "s": "\xcc"})
        if font_mode == "diffs"
        else None
    )

    def _show(s: str) -> str:
        """One show-string operand: literal for 1-byte fonts, big-endian
        2-byte-CID hex for Identity-H; diffs-arm letters re-encoded to
        their /Differences codes."""
        if hexmode:
            return "<" + "".join(f"{ord(c):04X}" for c in s) + ">"
        if diff_trans is not None:
            s = s.translate(diff_trans)
        return f"({_pdf_escape(s)})"

    for p in range(n_pages):
        two_col = rng.random() < 0.3
        ops: List[str] = []

        def text_column(x: float, paragraphs: List[List[str]]) -> None:
            y = 720.0
            ops.append("BT")
            ops.append("/F1 12 Tf")
            ops.append("14 TL")
            first = True
            for para in paragraphs:
                if not first:
                    y -= 28.0  # paragraph gap > block_gap*size -> new block
                for li, line in enumerate(para):
                    jitter = rng.choice((0.0, 0.5, -0.5, 1.0))  # within line tol
                    if first:
                        ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm")
                        first = False
                    elif li == 0:
                        ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm")
                    else:
                        ops.append("T*")
                    style = rng.random()
                    if style < 0.6:
                        ops.append(f"{_show(line)} Tj")
                    elif style < 0.8 and " " in line:
                        a, b = line.split(" ", 1)
                        ops.append(f"[{_show(a)} -250 {_show(b)}] TJ")
                    else:
                        ops.append("0.1 Tc 0.2 Tw")
                        ops.append(f"{_show(line)} Tj")
                        ops.append("0 Tc 0 Tw")
                    if jitter and li > 0:
                        pass  # y-jitter folded into T* leading below
                    y -= 14.0
            ops.append("ET")

        def paras(n_para: int, wlo: int, whi: int) -> List[List[str]]:
            out = []
            for _ in range(n_para):
                lines = [
                    " ".join(rng.choice(_WORDS) for _ in range(rng.randint(wlo, whi)))
                    for _ in range(rng.randint(2, 5))
                ]
                out.append(lines)
            return out

        if two_col:
            # narrow columns: ≤5 words ≈ ≤180pt wide keeps the inter-column
            # whitespace > pdf_col_gap so E16 sees two bands
            text_column(72.0, paras(rng.randint(1, 2), 3, 5))
            text_column(340.0, paras(rng.randint(1, 2), 3, 5))
        else:
            text_column(72.0, paras(rng.randint(1, 3), 5, 9))

        if force_table:
            # E24 table arm (TEST-ONLY OPT-IN: never rolled in the default
            # corpus, so frozen goldens and all pre-table corpora stay
            # byte-identical; material comes from a derived stream so rng /
            # lay_rng states — and therefore words, arms, and assets of the
            # same seed — are untouched). A 3–6 row × 3–4 column grid of
            # short cells at fixed x positions below the body text (body
            # bottoms out at y≈468; the grid starts at 300), each cell its
            # own Tm+Tj run. Cells cap at 14 chars so the estimated width
            # (0.5·size·len ≤ 70 pt) keeps the 138 pt column gutter far
            # above pdf_tables' cell_gap.
            tab_rng = random.Random((int(roll * (1 << 53)) ^ 0x7AB1E) + p)
            n_rows = tab_rng.randint(3, 6)
            n_cols = tab_rng.randint(3, 4)
            xs = (72.0, 210.0, 348.0, 486.0)[:n_cols]
            ty = 300.0
            ops.append("BT")
            ops.append("/F1 10 Tf")
            truth_rows: List[List[str]] = []
            for _r in range(n_rows):
                row = []
                for c in range(n_cols):
                    cell = " ".join(
                        tab_rng.choice(_WORDS)
                        for _ in range(tab_rng.randint(1, 2))
                    )
                    if len(cell) > 14:
                        cell = cell.split(" ")[0]
                    row.append(cell)
                    ops.append(f"1 0 0 1 {xs[c]:.1f} {ty:.1f} Tm")
                    ops.append(f"{_show(cell)} Tj")
                truth_rows.append(row)
                ty -= 16.0
            ops.append("ET")
            if _tables_out is not None:
                _tables_out.append(
                    {
                        "page": p + 1,
                        "n_rows": n_rows,
                        "n_cols": n_cols,
                        "rows": truth_rows,
                    }
                )

        content = ("\n".join(ops) + "\n").encode("cp1252", errors="replace")
        if use_form:
            fcomp = zlib.compress(content)
            form_num = add(
                b"<< /Type /XObject /Subtype /Form /Matrix [1 0 0 1 0 0] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Length %d /Filter /FlateDecode >>\nstream\n"
                % (font_num, len(fcomp))
                + fcomp
                + b"\nendstream"
            )
            comp = zlib.compress(b"/Fm1 Do\n")
            c_num = add(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp
                + b"\nendstream"
            )
            page_num = add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> "
                b"/XObject << /Fm1 %d 0 R >> >> /Contents %d 0 R >>"
                % (pages_num, font_num, form_num, c_num)
            )
        else:
            comp = zlib.compress(content)
            c_num = add(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp
                + b"\nendstream"
            )
            page_num = add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
                % (pages_num, font_num, c_num)
            )
        page_nums.append(page_num)

    # --- document assets (round-4 continuation, rolls #5+ of the derived
    # stream): /Info metadata, /Subtype /Link URI annotations on page 1,
    # and a two-level /Outlines tree. All material comes from lay_rng so
    # the word stream and the four existing arm rolls are untouched —
    # frozen goldens hold. Encrypted docs get NONE of these: the fixture
    # does not implement string encryption, and a plaintext /Title inside
    # a /StrF-declared document would be non-conformant; the reader's
    # documented policy (pdfx.extract_pdf_assets) skips encrypted docs
    # anyway. Rolls are still drawn on the encrypted arm so force_encrypt
    # never shifts another doc's asset material.
    assets = {"title": None, "author": None, "subject": None,
              "producer": None, "created": None, "links": [], "outline": []}
    info_num = 0
    outline_num = 0
    has_info = lay_rng.random() < 0.7
    title = " ".join(
        lay_rng.choice(_WORDS) for _ in range(lay_rng.randint(2, 5))
    ).title()
    utf16_title = lay_rng.random() < 0.25
    author = (
        lay_rng.choice(_WORDS).title() + " " + lay_rng.choice(_WORDS).title()
    )
    subject = lay_rng.choice(_WORDS)
    created = "D:20%02d%02d%02d%02d%02d%02dZ" % (
        lay_rng.randint(10, 25), lay_rng.randint(1, 12), lay_rng.randint(1, 28),
        lay_rng.randint(0, 23), lay_rng.randint(0, 59), lay_rng.randint(0, 59),
    )
    n_links = lay_rng.randint(0, 3)
    link_uris = [
        "https://%s.example.com/%s/%d"
        % (lay_rng.choice(_WORDS), lay_rng.choice(_WORDS), lay_rng.randint(1, 999))
        for _ in range(n_links)
    ]
    has_outline = lay_rng.random() < 0.4
    outline_titles = [
        " ".join(lay_rng.choice(_WORDS) for _ in range(2)).title()
        for _ in range(lay_rng.randint(2, 4))
    ]
    if encrypt in ("none", None):
        if has_info:
            if utf16_title:
                title_tok = (
                    b"<" + (b"\xfe\xff" + title.encode("utf-16-be")).hex().encode() + b">"
                )
            else:
                title_tok = b"(" + _pdf_escape(title).encode("cp1252") + b")"
            info_num = add(
                b"<< /Title %s /Author (%s) /Subject (%s) "
                b"/Producer (SynthWriter 1.0) /CreationDate (%s) >>"
                % (
                    title_tok,
                    _pdf_escape(author).encode("cp1252"),
                    subject.encode("cp1252"),
                    created.encode("ascii"),
                )
            )
            assets.update(
                title=title, author=author, subject=subject,
                producer="SynthWriter 1.0",
                created="%s-%s-%sT%s:%s:%s+00:00" % (
                    created[2:6], created[6:8], created[8:10],
                    created[10:12], created[12:14], created[14:16],
                ),
            )
        if link_uris:
            annot_nums = []
            for k, uri in enumerate(link_uris):
                y = 700 - 20 * k
                annot_nums.append(
                    add(
                        b"<< /Type /Annot /Subtype /Link /Rect [72 %d 300 %d] "
                        b"/Border [0 0 0] /A << /S /URI /URI (%s) >> >>"
                        % (y, y + 14, uri.encode("ascii"))
                    )
                )
            pn = page_nums[0]
            objs[pn - 1] = objs[pn - 1][:-2] + b"/Annots [%s] >>" % b" ".join(
                b"%d 0 R" % a for a in annot_nums
            )
            assets["links"] = [(1, u) for u in link_uris]
        if has_outline:
            # top-level chain; the FIRST item carries one child (depth 1)
            outline_num = add(b"")  # root placeholder
            item_nums = [add(b"") for _ in outline_titles]
            child_num = add(b"")
            child_title = outline_titles[0] + " Detail"
            for k, (inum, t) in enumerate(zip(item_nums, outline_titles)):
                parts = [b"<< /Title (%s)" % _pdf_escape(t).encode("cp1252")]
                parts.append(b"/Parent %d 0 R" % outline_num)
                if k > 0:
                    parts.append(b"/Prev %d 0 R" % item_nums[k - 1])
                if k + 1 < len(item_nums):
                    parts.append(b"/Next %d 0 R" % item_nums[k + 1])
                if k == 0:
                    parts.append(
                        b"/First %d 0 R /Last %d 0 R /Count 1"
                        % (child_num, child_num)
                    )
                objs[inum - 1] = b" ".join(parts) + b" >>"
            objs[child_num - 1] = (
                b"<< /Title (%s) /Parent %d 0 R >>"
                % (_pdf_escape(child_title).encode("cp1252"), item_nums[0])
            )
            objs[outline_num - 1] = (
                b"<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>"
                % (item_nums[0], item_nums[-1], len(item_nums))
            )
            flat = [(0, outline_titles[0]), (1, child_title)]
            flat += [(0, t) for t in outline_titles[1:]]
            assets["outline"] = flat
    if _assets_out is not None:
        _assets_out.append(assets)

    cat = b"<< /Type /Catalog /Pages %d 0 R" % pages_num
    if outline_num:
        cat += b" /Outlines %d 0 R" % outline_num
    objs[catalog_num - 1] = cat + b" >>"
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    objs[pages_num - 1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        kids,
        len(page_nums),
    )

    if layout == "objstm":
        return _assemble_objstm(objs, catalog_num, info_num)
    trailer_extra = b""
    if info_num:
        trailer_extra += b" /Info %d 0 R" % info_num
    if encrypt not in ("none", None):
        objs, enc_extra = _encrypt_objects(
            objs, encrypt, random.Random(int(enc_roll * (1 << 53)))
        )
        trailer_extra += enc_extra
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_num, trailer_extra, xref_at)
    )
    return bytes(out)


def _assemble_objstm(objs: List[bytes], catalog_num: int, info_num: int = 0) -> bytes:
    """PDF 1.5 compressed layout: non-stream objects packed into one
    FlateDecode /ObjStm (original numbering preserved so inter-object refs
    hold); stream objects stay top-level; the trailer dict rides the
    /Type /XRef stream whose entry rows use W [1 4 2] with the PNG Up
    predictor (/Predictor 12) — exactly what pdflatex/ghostscript-era
    writers emit, and what real Common-Crawl PDFs overwhelmingly are.
    There is NO `trailer` keyword in this layout: /Root discovery must go
    through the xref stream dict."""
    import struct

    n_base = len(objs)
    packed = [i for i, b in enumerate(objs, start=1) if b"endstream" not in b]
    top = [i for i, b in enumerate(objs, start=1) if b"endstream" in b]

    offs: List[Tuple[int, int]] = []
    body = bytearray()
    for num in packed:
        offs.append((num, len(body)))
        body += objs[num - 1] + b"\n"
    header = " ".join(f"{n} {o}" for n, o in offs).encode() + b"\n"
    payload = zlib.compress(bytes(header) + bytes(body))
    objstm_num = n_base + 1
    xref_num = n_base + 2
    objstm = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
        b"\nstream\n" % (len(packed), len(header), len(payload))
        + payload
        + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict = {}
    for num in top:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num - 1] + b"\nendobj\n"
    offsets[objstm_num] = len(out)
    out += b"%d 0 obj\n" % objstm_num + objstm + b"\nendobj\n"

    # xref stream entries: type 0 free / 1 top-level offset / 2 in-stream
    xref_at = len(out)
    offsets[xref_num] = xref_at
    size = xref_num + 1
    idx_of = {num: k for k, num in enumerate(packed)}
    rowlen = 7  # W [1 4 2]
    raw = bytearray()
    prior = bytes(rowlen)
    for i in range(size):
        if i == 0:
            row = struct.pack(">BIH", 0, 0, 65535)
        elif i in offsets:
            row = struct.pack(">BIH", 1, offsets[i], 0)
        elif i in idx_of:
            row = struct.pack(">BIH", 2, objstm_num, idx_of[i])
        else:
            row = struct.pack(">BIH", 0, 0, 0)
        raw += bytes([2]) + bytes((row[j] - prior[j]) & 0xFF for j in range(rowlen))
        prior = row
    xdata = zlib.compress(bytes(raw))
    info_tok = b" /Info %d 0 R" % info_num if info_num else b""
    xref = (
        b"<< /Type /XRef /Size %d /Root %d 0 R%s /W [1 4 2] /Index [0 %d] "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b"/Length %d >>\nstream\n" % (size, catalog_num, info_tok, size, len(xdata))
        + xdata
        + b"\nendstream"
    )
    out += b"%d 0 obj\n" % xref_num + xref + b"\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


# ---------------------------------------------------------------------------
# Corpus generator
# ---------------------------------------------------------------------------

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def gen_page_row(seed: int, doc_index: int, skew: str = "mild") -> dict:
    rng = random.Random((seed << 20) ^ doc_index)
    host = rng.choices(HOSTS, weights=_HOST_WEIGHTS[skew], k=1)[0]
    path = "/".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 3)))
    url = f"https://{host}/{path}/{doc_index}"
    ts = _EPOCH + _dt.timedelta(seconds=doc_index * 97 + rng.randint(0, 40))
    lang = rng.choice(_LANGS)
    roll = rng.random()
    if roll < 0.78:
        body = make_html(rng)
        fallback = None
    elif roll < 0.93:
        body = make_pdf(rng)
        fallback = None
    else:
        if rng.random() < 0.5:
            body = _paragraph(rng, 2, 6).encode("utf-8")
            fallback = None
        else:
            body = b""  # fallback-text passthrough
            fallback = _paragraph(rng, 1, 4)
    return {
        "url": url,
        "warc_ts": ts,
        "html": body,
        "text": fallback,
        "lang": lang,
    }


def gen_pages(
    n_docs: int,
    seed: int = 42,
    skew: str = "mild",
    dup_frac: float = 0.05,
) -> List[dict]:
    """n_docs base rows + floor(dup_frac*n) re-crawl duplicates of earlier
    urls at a later warc_ts (latest-wins dedupe exercise, SURVEY §2.7 W1)."""
    rows = [gen_page_row(seed, i, skew) for i in range(n_docs)]
    n_dup = int(n_docs * dup_frac)
    for k in range(n_dup):
        rng = random.Random((seed << 21) ^ (0x5EED + k))
        victim = rows[rng.randrange(n_docs)]
        dup = dict(gen_page_row(seed, 10_000_000 + k, skew))
        dup["url"] = victim["url"]  # same url, later capture, new content
        dup["warc_ts"] = victim["warc_ts"] + _dt.timedelta(days=30 + k)
        rows.append(dup)
    return rows


def pages_to_pandas(rows: List[dict]):
    import pandas as pd

    return pd.DataFrame(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            # explicit string dtype: an all-null object column would make
            # pyarrow infer a null (INT32-physical) parquet type, which
            # Spark's vectorized reader rejects against the string schema
            "text": pd.array([r["text"] for r in rows], dtype="string"),
            "lang": pd.array([r["lang"] for r in rows], dtype="string"),
        }
    )


# ---------------------------------------------------------------------------
# Minimal DOCX writer (subset-matched to webextract.docxx). NOT part of the
# frozen golden corpus (gen_page_row's rng stream is pinned); tests build
# their own docx corpora with it.
# ---------------------------------------------------------------------------


def make_docx(
    rng: random.Random,
    force_table: bool | None = None,
    _assets_out: list | None = None,
    _tables_out: list | None = None,
) -> bytes:
    """Deterministic WordprocessingML document: 2-6 paragraphs of seeded
    words (with XML-escaped characters and charrefs sprinkled in), an
    optional 2x2 table whose cell paragraphs must extract in document
    order, tabs/brs as spaces."""
    import io as _io
    import zipfile as _zip

    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    paras = []
    for _ in range(rng.randint(2, 6)):
        txt = _paragraph(rng, 1, 3)
        runs = f"<w:r><w:t>{esc(txt)}</w:t></w:r>"
        if rng.random() < 0.3:
            runs += "<w:r><w:tab/><w:t>after tab</w:t></w:r>"
        if rng.random() < 0.2:
            runs += "<w:r><w:t>caf&#233; &amp; more</w:t></w:r>"
        paras.append(f"<w:p >{runs}</w:p>")
    use_table = rng.random() < 0.4 if force_table is None else force_table
    table = ""
    if use_table:
        # Join WHOLE cells per row — slicing the concatenated string at its
        # character midpoint landed mid-tag and (in ~12% of seeds) broke a
        # </w:t> closer, silently dropping that cell's text (round-2 ADVICE).
        cell_texts = [_sentence(rng, 3, 5) for _ in range(4)]
        cells = [
            f"<w:tc><w:p ><w:r><w:t>{esc(s)}</w:t></w:r></w:p></w:tc>"
            for s in cell_texts
        ]
        table = (
            f"<w:tbl><w:tr>{''.join(cells[:2])}</w:tr>"
            f"<w:tr>{''.join(cells[2:])}</w:tr></w:tbl>"
        )
        if _tables_out is not None:
            _tables_out.append(
                {
                    "page": 0,
                    "n_rows": 2,
                    "n_cols": 2,
                    "rows": [cell_texts[:2], cell_texts[2:]],
                }
            )
    body = "".join(paras) + table
    doc_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    ).encode("utf-8")
    # docProps/core.xml arm: material derives from the already-generated
    # body bytes (crc32 seed), NOT the main rng — pre-existing test
    # corpora that pin extracted text by seed stay byte-identical
    meta_rng = random.Random(zlib.crc32(doc_xml))
    assets = {"title": None, "author": None, "subject": None, "created": None}
    core_xml = None
    if meta_rng.random() < 0.7:
        title = " ".join(
            meta_rng.choice(_WORDS) for _ in range(meta_rng.randint(2, 4))
        ).title()
        author = meta_rng.choice(_WORDS).title() + " " + meta_rng.choice(_WORDS).title()
        created = "20%02d-%02d-%02dT%02d:%02d:%02dZ" % (
            meta_rng.randint(10, 25), meta_rng.randint(1, 12),
            meta_rng.randint(1, 28), meta_rng.randint(0, 23),
            meta_rng.randint(0, 59), meta_rng.randint(0, 59),
        )
        # one title in ~5 carries an escaped ampersand to exercise unescape
        raw_title = title + (" & Sons" if meta_rng.random() < 0.2 else "")
        core_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/" '
            'xmlns:dcterms="http://purl.org/dc/terms/" '
            'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
            f"<dc:title>{esc(raw_title)}</dc:title>"
            f"<dc:creator>{esc(author)}</dc:creator>"
            f'<dcterms:created xsi:type="dcterms:W3CDTF">{created}</dcterms:created>'
            "</cp:coreProperties>"
        ).encode("utf-8")
        assets.update(title=raw_title, author=author, created=created)
    if _assets_out is not None:
        _assets_out.append(assets)
    buf = _io.BytesIO()
    with _zip.ZipFile(buf, "w", _zip.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        zf.writestr("word/document.xml", doc_xml)
        if core_xml is not None:
            zf.writestr("docProps/core.xml", core_xml)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Minimal RSS/Atom writer (subset-matched to webextract.feedx). NOT part of
# the frozen golden corpus (gen_page_row's rng stream is pinned); tests
# build their own feed corpora with it.
# ---------------------------------------------------------------------------


def make_feed(rng: random.Random, flavor: str | None = None) -> bytes:
    """Deterministic syndication XML: RSS 2.0 or Atom, 1-5 items, with the
    three description shapes real feeds mix — plain text, entity-escaped
    HTML, and CDATA-wrapped HTML (CDATA content must NOT be unescaped)."""
    flavor = flavor or rng.choice(("rss", "atom"))
    items = []
    for _ in range(rng.randint(1, 5)):
        title = _sentence(rng, 3, 7)
        body = _paragraph(rng, 1, 2)
        shape = rng.random()
        if shape < 0.34:
            desc = body
        elif shape < 0.67:
            desc = f"&lt;p&gt;{body}&lt;/p&gt;&lt;br/&gt;"
        else:
            desc = f"<![CDATA[<p>{body}</p> <a href=\"/x\">more &amp; raw</a>]]>"
        items.append((title, desc))
    feed_title = _sentence(rng, 2, 5)
    if flavor == "rss":
        body = "".join(
            f"<item><title>{t}</title><description>{d}</description>"
            f"<link>https://feeds.example.com/{rng.randrange(10**6)}</link></item>"
            for t, d in items
        )
        doc = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<rss version="2.0"><channel>'
            f"<title>{feed_title}</title><language>en</language>"
            f"{body}</channel></rss>"
        )
    else:
        body = "".join(
            f'<entry><title>{t}</title><summary type="html">{d}</summary>'
            f"<id>urn:uuid:{rng.randrange(10**9)}</id></entry>"
            for t, d in items
        )
        doc = (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<feed xmlns="http://www.w3.org/2005/Atom">'
            f"<title>{feed_title}</title>{body}</feed>"
        )
    return doc.encode("utf-8")
