"""Charset sniffing/decoding and deterministic whitespace normalization.

Implements SURVEY.md §2.2 E2 (charset decode) and E10 (whitespace normalize).
All decisions are pure functions of the input bytes + rule, so the extracted
text is byte-identical across reruns and across single-process vs executor
execution (BASELINE.json:6).
"""

from __future__ import annotations

import codecs
import re
from typing import Optional

_WS_RE = re.compile("[\t\r\n\f\v \u00a0\u1680\u2000-\u200b\u2028\u2029\u202f\u205f\u3000]+")

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,256}?charset\s*=\s*["']?\s*([a-zA-Z0-9_.:-]{1,40})""",
    re.IGNORECASE,
)

# Canonical small alias map; codecs.lookup handles the rest deterministically.
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "win-1252": "cp1252",
    "us-ascii": "ascii",
}


def normalize_ws(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip ends."""
    return _WS_RE.sub(" ", s).strip()


def _canon_charset(name: str) -> Optional[str]:
    name = name.strip().strip("\"'").lower()
    name = _CHARSET_ALIASES.get(name, name)
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def sniff_charset(data: bytes, override: Optional[str] = None) -> str:
    """BOM > rule override > <meta charset> > utf-8 fallback (SURVEY E2)."""
    if data.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if data.startswith(codecs.BOM_UTF16_LE) or data.startswith(codecs.BOM_UTF16_BE):
        return "utf-16"
    if override:
        c = _canon_charset(override)
        if c:
            return c
    m = _META_CHARSET_RE.search(data[:4096])
    if m:
        c = _canon_charset(m.group(1).decode("ascii", "replace"))
        if c:
            return c
    return "utf-8"


def decode_bytes(data: bytes, override: Optional[str] = None) -> str:
    """Decode document bytes deterministically; undecodable bytes -> U+FFFD."""
    charset = sniff_charset(data, override)
    try:
        return data.decode(charset, errors="replace")
    except Exception:
        return data.decode("utf-8", errors="replace")
