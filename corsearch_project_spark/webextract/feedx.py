"""RSS 2.0 / Atom feed extraction (the XML sibling of the HTML path).

Crawls carry a steady band of syndication XML; running it down the HTML
boilerplate path yields tag soup (nav/score heuristics are meaningless for
feeds), so feeds get their own deterministic extractor: channel/feed title
plus, per ``<item>``/``<entry>``, the title and the description/summary/
content — the fields a text corpus wants.

Same contract as ``extract_html`` (webextract/htmlx.py:485): returns
``(text, spans)`` with blocks joined by a single ``\\n``, no trailing
newline, spans = ``(source_start, source_end, label)`` into the DECODED
source with labels ``feed_title`` / ``item_title`` / ``item_desc``.

Field content resolution (deterministic, order fixed):
  1. ``<![CDATA[...]]>`` sections contribute their payload VERBATIM (no
     entity unescape inside CDATA — XML semantics);
  2. non-CDATA segments are entity-unescaped (feeds commonly double-escape
     embedded HTML: ``&lt;p&gt;`` -> ``<p>``);
  3. the concatenation is tag-stripped (descriptions embed HTML whether
     escaped or CDATA-wrapped) and whitespace-normalized.

Scanning is regex-based, not a DOM pass: the needed structure is one level
of ``item``/``entry`` blocks with flat child fields, and the tokenizer's
HTML error-recovery rules (htmlx) are wrong for XML (CDATA, namespaces).
Parse failures degrade to empty output, never raise (same poison-doc
stance as the rest of the kernel).
"""

from __future__ import annotations

import html as _htmlmod
import re
from typing import List, Optional, Tuple

from corsearch_project_spark.webextract.textnorm import normalize_ws

_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_ITEM_RE = re.compile(r"<(item|entry)[\s>].*?</\1\s*>", re.S | re.I)


def _field_re(names: Tuple[str, ...]) -> re.Pattern:
    alt = "|".join(names)
    return re.compile(
        rf"<({alt})(?:\s[^>]*)?>(.*?)</\1\s*>", re.S | re.I
    )


_TITLE_RE = _field_re(("title",))
_DESC_RE = _field_re(("description", "summary", "content"))


def _resolve_text(raw: str) -> str:
    """CDATA-aware inner-text resolution (module docstring, steps 1-3)."""
    parts: List[str] = []
    last = 0
    for m in _CDATA_RE.finditer(raw):
        parts.append(_htmlmod.unescape(raw[last : m.start()]))
        parts.append(m.group(1))
        last = m.end()
    parts.append(_htmlmod.unescape(raw[last:]))
    return normalize_ws(_TAG_RE.sub(" ", "".join(parts)))


def is_feed(head: bytes) -> bool:
    """Feed sniff over the first bytes: an ``<rss``/``<feed`` root —
    directly or after an XML prolog/comments. ``<?xml`` alone is NOT a
    feed (XHTML also carries the prolog)."""
    stripped = head.lstrip(b" \t\r\n\f\v\xef\xbb\xbf")
    if re.match(rb"<(rss|feed)[\s>]", stripped, re.I):
        return True
    if stripped.startswith(b"<?xml"):
        return re.search(rb"<(rss|feed)[\s>]", head, re.I) is not None
    return False


def extract_feed(src: str) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Decoded feed XML -> (text, spans); empty on anything unparseable."""
    try:
        blocks: List[Tuple[int, int, str, str]] = []  # start, end, label, text

        first_item = _ITEM_RE.search(src)
        head_end = first_item.start() if first_item else len(src)
        ft = _TITLE_RE.search(src, 0, head_end)
        if ft:
            t = _resolve_text(ft.group(2))
            if t:
                blocks.append((ft.start(2), ft.end(2), "feed_title", t))

        for im in _ITEM_RE.finditer(src):
            body, off = im.group(0), im.start()
            it = _TITLE_RE.search(body)
            if it:
                t = _resolve_text(it.group(2))
                if t:
                    blocks.append(
                        (off + it.start(2), off + it.end(2), "item_title", t)
                    )
            dm = _DESC_RE.search(body)
            if dm:
                t = _resolve_text(dm.group(2))
                if t:
                    blocks.append(
                        (off + dm.start(2), off + dm.end(2), "item_desc", t)
                    )

        text = "\n".join(b[3] for b in blocks)
        spans = [(b[0], b[1], b[2]) for b in blocks]
        return text, spans
    except Exception:
        return "", []
