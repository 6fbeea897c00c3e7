"""Doc-kind sniffing (SURVEY.md §2.2 E1):
bytes -> 'pdf' | 'html' | 'feed' | 'zip' | 'text'.

Deterministic, magic-byte-first: the reference's competency is config-driven
PDF + HTML extraction (/root/reference/README.md:2), so those kinds get
positive detection; 'zip' covers OOXML containers (extract dispatch probes
for word/document.xml -> docx, else binary passthrough) and everything else
is text passthrough.
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
    if head.startswith(b"PK\x03\x04"):
        return "zip"
    if stripped.startswith(b"<"):
        # RSS/Atom before the generic markup bucket: an <rss>/<feed> root
        # (directly or behind an XML prolog) is syndication XML, not a
        # page; XHTML's bare prolog stays 'html' (feedx.is_feed guards).
        from corsearch_project_spark.webextract.feedx import is_feed

        if is_feed(head):
            return "feed"
        return "html"
    if _HTML_HINT_RE.search(head):
        return "html"
    return "text"
