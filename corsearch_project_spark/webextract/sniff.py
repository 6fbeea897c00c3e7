"""Doc-kind sniffing (SURVEY.md §2.2 E1): bytes -> 'pdf' | 'html' | 'text'.

Deterministic, magic-byte-first: the reference's competency is config-driven
PDF + HTML extraction (/root/reference/README.md:2), so those two kinds get
positive detection and everything else is text passthrough.
"""

from __future__ import annotations

import re

_HTML_HINT_RE = re.compile(
    rb"<(?:!doctype\s+html|html|head|body|div|p[\s>]|a\s|meta|title|h1|article)",
    re.IGNORECASE,
)


def sniff_kind(data: bytes) -> str:
    if not data:
        return "text"
    head = data[:2048]
    stripped = head.lstrip(b" \t\r\n\f\v\xef\xbb\xbf")
    if stripped.startswith(b"%PDF-"):
        return "pdf"
    if stripped.startswith(b"<"):
        return "html"
    if _HTML_HINT_RE.search(head):
        return "html"
    return "text"
