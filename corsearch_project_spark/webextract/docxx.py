"""Minimal deterministic DOCX (OOXML WordprocessingML) text extraction.

Real crawls carry .docx payloads alongside HTML/PDF; this module covers the
text competency with the same stdlib-only, skip-don't-raise discipline as
the PDF core: a .docx is a zip whose ``word/document.xml`` holds paragraphs
(``<w:p>``) of runs (``<w:r><w:t>text</w:t></w:r>``).

Scope (documented subset, fixture-defined like pdfx):
- paragraphs -> blocks (span kind ``docx:p``), document order;
- ``<w:t>`` run text with XML entity + numeric-charref unescaping;
- ``<w:tab/>`` and ``<w:br/>`` become single spaces;
- table cell paragraphs are ordinary ``<w:p>`` elements — they extract in
  document order with no special casing;
- zip-bomb guard: ``word/document.xml`` larger than 8× the rule's
  ``max_doc_bytes`` is skipped (empty result), bounding decompression.

Anything malformed (not a zip, no document.xml, broken XML) degrades to
empty text deterministically — never raises.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import List, Optional, Tuple

from corsearch_project_spark.webextract.rules import DEFAULT_RULE, Rule
from corsearch_project_spark.webextract.textnorm import normalize_ws

_PARA_RE = re.compile(rb"<w:p[ >].*?</w:p>|<w:p/>", re.S)
_RUN_RE = re.compile(
    rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab/>|<w:br/>", re.S
)
_ENTITIES = {
    b"&amp;": b"&",
    b"&lt;": b"<",
    b"&gt;": b">",
    b"&quot;": b'"',
    b"&apos;": b"'",
}
# One alternation over named entities AND numeric charrefs: a single
# left-to-right pass, so "&amp;#65;" decodes to the literal "&#65;" instead
# of being double-unescaped to "A" (round-2 ADVICE — the old code replaced
# named entities first, then re-scanned the output for charrefs).
_ESCAPE_RE = re.compile(rb"&(?:amp|lt|gt|quot|apos|#(x[0-9A-Fa-f]+|\d+));")


def _unescape(raw: bytes) -> str:
    def repl(m: "re.Match[bytes]") -> bytes:
        tok = m.group(1)
        if tok is None:
            return _ENTITIES[m.group(0)]
        try:
            cp = int(tok[1:], 16) if tok[:1] == b"x" else int(tok)
            return chr(cp).encode("utf-8")
        except (ValueError, OverflowError):
            return b""

    return _ESCAPE_RE.sub(repl, raw).decode("utf-8", errors="replace")


def is_docx(data: bytes) -> bool:
    """Zip magic + a cheap membership probe (no decompression)."""
    if not data.startswith(b"PK\x03\x04"):
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return "word/document.xml" in zf.namelist()
    except Exception:
        return False


def extract_docx(
    data: bytes, rule: Rule = DEFAULT_RULE
) -> Optional[Tuple[str, List[Tuple[int, int, str]]]]:
    """DOCX bytes -> (text, spans) or None when not a readable docx.
    Spans index into the emitted text (same convention as PDF)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        info = zf.getinfo("word/document.xml")
        if info.file_size > 8 * rule.max_doc_bytes:
            return "", []  # zip-bomb guard: bounded decompression
        xml = zf.read(info)
    except Exception:
        return None

    blocks: List[str] = []
    for pm in _PARA_RE.finditer(xml):
        parts: List[str] = []
        for rm in _RUN_RE.finditer(pm.group(0)):
            if rm.group(1) is not None:
                parts.append(_unescape(rm.group(1)))
            else:  # tab / br
                parts.append(" ")
        ptxt = normalize_ws("".join(parts))
        if ptxt:
            blocks.append(ptxt)

    text_parts: List[str] = []
    spans: List[Tuple[int, int, str]] = []
    pos = 0
    for btxt in blocks:
        spans.append((pos, pos + len(btxt), "docx:p"))
        text_parts.append(btxt)
        pos += len(btxt) + 1
    return "\n".join(text_parts), spans


# ---------------------------------------------------------------------------
# Core properties (docProps/core.xml) — the DOCX arm of the document-assets
# catalog (SURVEY §2 E23's sibling): Dublin-Core metadata OOXML packages
# carry beside the body. Same skip-don't-raise discipline as extraction.
# ---------------------------------------------------------------------------

_CORE_TAG_RE = {
    "title": re.compile(rb"<dc:title[^>]*>(.*?)</dc:title>", re.DOTALL),
    "author": re.compile(rb"<dc:creator[^>]*>(.*?)</dc:creator>", re.DOTALL),
    "subject": re.compile(rb"<dc:subject[^>]*>(.*?)</dc:subject>", re.DOTALL),
    "created": re.compile(
        rb"<dcterms:created[^>]*>(.*?)</dcterms:created>", re.DOTALL
    ),
}


def docx_assets_probe(data: bytes):
    """ONE zip open answering both questions the assets kernel has:
    returns None when ``data`` is not a DOCX package (no
    word/document.xml), else the {title, author, subject, created} dict
    from docProps/core.xml (all-None when core.xml is absent). The bomb
    guard checks the DECLARED uncompressed size BEFORE zf.read — checking
    len() after decompression (the original form) already paid the
    multi-hundred-MB allocation a crafted deflate bomb forces."""
    out = {"title": None, "author": None, "subject": None, "created": None}
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = zf.namelist()
            if "word/document.xml" not in names:
                return None
            if "docProps/core.xml" not in names:
                return out
            info = zf.getinfo("docProps/core.xml")
            if info.file_size > 1 << 20:  # bomb guard, pre-decompression
                return out
            core = zf.read("docProps/core.xml")
    except Exception:
        return None
    for key, rx in _CORE_TAG_RE.items():
        m = rx.search(core)
        if m:
            val = _unescape(m.group(1)).strip()
            out[key] = val or None
    return out


def docx_core_props(data: bytes) -> dict:
    """DOCX bytes -> {title, author, subject, created} from
    docProps/core.xml (ECMA-376 Part 2 §11; Dublin Core elements).
    ``created`` is W3CDTF, already ISO-8601 — passed through verbatim.
    Absent file/fields (or a non-DOCX payload) -> None values; never
    raises."""
    probe = docx_assets_probe(data)
    return probe if probe is not None else {
        "title": None, "author": None, "subject": None, "created": None,
    }


# ---------------------------------------------------------------------------
# E24 DOCX arm: tables are EXPLICIT in WordprocessingML (<w:tbl>/<w:tr>/
# <w:tc>), so recovery here is exact markup walking — the structural
# counterpart of the PDF side's whitespace-alignment inference. Same output
# shape as pdfx.pdf_tables so both feed one doc_tables catalog; DOCX has no
# page concept, so rows carry page = 0.
# ---------------------------------------------------------------------------

_TBL_RE = re.compile(rb"<w:tbl[ >].*?</w:tbl>|<w:tbl>.*?</w:tbl>", re.S)
_TR_RE = re.compile(rb"<w:tr[ >].*?</w:tr>|<w:tr>.*?</w:tr>", re.S)
_TC_RE = re.compile(rb"<w:tc[ >].*?</w:tc>|<w:tc>.*?</w:tc>", re.S)


def docx_tables(data: bytes, rule: Rule = DEFAULT_RULE) -> List[dict]:
    """DOCX bytes -> tables ``{"page": 0, "n_rows", "n_cols", "rows"}``
    in document order. Cell text is the run extraction (unescape, tab/br
    as space, ws-normalized) of everything inside the <w:tc>. Ragged rows
    keep their own widths; n_cols reports the FIRST row's width (header
    convention). Malformed input degrades to [] — never raises."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        info = zf.getinfo("word/document.xml")
        if info.file_size > 8 * rule.max_doc_bytes:
            return []
        xml = zf.read(info)
    except Exception:
        return []
    out: List[dict] = []
    for tm in _TBL_RE.finditer(xml):
        rows: List[List[str]] = []
        for trm in _TR_RE.finditer(tm.group(0)):
            cells: List[str] = []
            for tcm in _TC_RE.finditer(trm.group(0)):
                parts: List[str] = []
                for rm in _RUN_RE.finditer(tcm.group(0)):
                    if rm.group(1) is not None:
                        parts.append(_unescape(rm.group(1)))
                    else:
                        parts.append(" ")
                cells.append(normalize_ws("".join(parts)))
            if cells:
                rows.append(cells)
        if rows:
            out.append(
                {
                    "page": 0,
                    "n_rows": len(rows),
                    "n_cols": len(rows[0]),
                    "rows": rows,
                }
            )
    return out
