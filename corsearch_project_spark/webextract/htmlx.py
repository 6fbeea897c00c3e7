"""HTML tokenizer + DOM + text-density main-content extraction.

Implements SURVEY.md §2.2 E3 (tokenizer), E4 (DOM builder with implied end
tags), E6 (block segmentation), E7 (Arc90/readability-style block scoring,
per Kohlschütter et al. WSDM'10 shallow text features + the public Arc90
readability.js class/id hint lists), E8 (link-density filter), E9 (boilerplate
strip), E10 (whitespace normalize + emit with span offsets).

Hand-written because lxml/bs4/html5lib are unavailable offline (SURVEY.md
§0.1) and because the byte-identity contract (BASELINE.json:6) requires full
control of error-recovery rules. Pure stdlib, deterministic: stable sorts,
no wall clock, insertion-ordered dicts only.

Span offsets are character offsets into the *decoded* source string; a block
span covers [first_text_token.start, last_text_token.end).
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from corsearch_project_spark.webextract.rules import (
    ALWAYS_STRIP_TAGS,
    DEFAULT_RULE,
    Rule,
)
from corsearch_project_spark.webextract.textnorm import normalize_ws

# ---------------------------------------------------------------------------
# Tokenizer (E3)
# ---------------------------------------------------------------------------

TEXT, START, END, COMMENT, DECL = "text", "start", "end", "comment", "decl"

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Content scanned as raw text until the matching close tag.
RAWTEXT_ELEMENTS = frozenset({"script", "style", "textarea", "title"})

# close-tag regex per rawtext element, compiled once (tokenize hot path)
_RAWTEXT_CLOSE_RE = {
    name: re.compile(r"</" + name + r"(?=[\s/>]|$)", re.IGNORECASE)
    for name in ("script", "style", "textarea", "title")
}
_ATTR_RE = re.compile(
    r"""\s*([^\s=/>]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)
# Combined start/end-tag patterns: one C-level match replaces the separate
# tag-name match + find(">") scan of the naive loop (hot path; ~1.2x on the
# tokenizer).  ``[^>]*`` stops at the first ">", exactly like find(">"), and
# matches to EOF when the tag is unterminated (same recovery rule).
_START_TAG_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9:_-]*)([^>]*)(>?)")
_END_TAG_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>?")
# Shared read-only empty attrs dict for non-START tokens (never mutated
# downstream; build_dom already aliases tok.attrs without copying).
_NO_ATTRS: Dict[str, str] = {}


@dataclass(slots=True)
class Tok:
    kind: str
    data: str  # tag name (lower) for START/END, raw text for TEXT/COMMENT/DECL
    attrs: Dict[str, str]
    self_closing: bool
    start: int  # char offset into decoded source
    end: int


def _parse_attrs(s: str) -> Dict[str, str]:
    if not s or s.isspace():
        return {}
    attrs: Dict[str, str] = {}
    for m in _ATTR_RE.finditer(s):
        name = m.group(1).lower()
        if name in ("/", ">") or not name:
            continue
        raw = m.group(2)
        if raw is None:
            val = ""
        elif raw[:1] in ("'", '"'):
            val = raw[1:-1]
        else:
            val = raw
        if name not in attrs:  # first occurrence wins (HTML5)
            attrs[name] = _htmlmod.unescape(val)
    return attrs


def tokenize(src: str) -> List[Tok]:
    """Decoded HTML string -> token list with absolute char offsets.

    Error recovery rules (fixed, documented, deterministic):
    - ``<`` not followed by a letter, ``/``, ``!`` or ``?`` is literal text.
    - An unterminated construct at EOF consumes the rest of the input.
    - Raw-text elements swallow everything up to the first case-insensitive
      ``</name`` sequence (or EOF).
    """
    toks: List[Tok] = []
    append = toks.append
    find = src.find
    start_match = _START_TAG_RE.match
    end_match = _END_TAG_RE.match
    n = len(src)
    i = 0
    rawtext_until: Optional[str] = None  # tag name whose close tag ends rawtext

    while i < n:
        if rawtext_until is not None:
            m = _RAWTEXT_CLOSE_RE[rawtext_until].search(src, i)
            if m is None:
                if n > i:
                    append(Tok(TEXT, src[i:n], _NO_ATTRS, False, i, n))
                i = n
                rawtext_until = None
                continue
            ms = m.start()
            if ms > i:
                append(Tok(TEXT, src[i:ms], _NO_ATTRS, False, i, ms))
            gt = find(">", ms)
            end_at = n if gt < 0 else gt + 1
            append(Tok(END, rawtext_until, _NO_ATTRS, False, ms, end_at))
            i = end_at
            rawtext_until = None
            continue

        lt = find("<", i)
        if lt < 0:
            if n > i:
                append(Tok(TEXT, src[i:n], _NO_ATTRS, False, i, n))
            break
        if lt > i:
            append(Tok(TEXT, src[i:lt], _NO_ATTRS, False, i, lt))
        i = lt
        p = lt + 1
        nxt = src[p] if p < n else ""  # one-char dispatch ('' at EOF)
        if nxt == "!" or nxt == "?":
            if src.startswith("<!--", i):
                j = find("-->", i + 4)
                end_at = n if j < 0 else j + 3
                append(Tok(COMMENT, src[i:end_at], _NO_ATTRS, False, i, end_at))
                i = end_at
                continue
            j = find(">", i + 2)
            end_at = n if j < 0 else j + 1
            append(Tok(DECL, src[i:end_at], _NO_ATTRS, False, i, end_at))
            i = end_at
            continue
        if nxt == "/":
            m = end_match(src, i + 2)
            if m is None:
                # "</" + junk: literal text up to and including next ">"
                j = find(">", i)
                end_at = n if j < 0 else j + 1
                if end_at > i:
                    append(Tok(TEXT, src[i:end_at], _NO_ATTRS, False, i, end_at))
                i = end_at
                continue
            append(Tok(END, m.group(1).lower(), _NO_ATTRS, False, i, m.end()))
            i = m.end()
            continue
        m = start_match(src, p)
        if m is None:
            append(Tok(TEXT, "<", _NO_ATTRS, False, i, i + 1))  # lone '<' is text
            i += 1
            continue
        name, inner, _closed = m.group(1, 2, 3)
        name = name.lower()
        end_at = m.end()
        inner = inner.rstrip()
        self_closing = inner.endswith("/")
        if self_closing:
            inner = inner.rstrip("/")
        attrs = _parse_attrs(inner) if inner else _NO_ATTRS
        append(Tok(START, name, attrs, self_closing, i, end_at))
        i = end_at
        if (
            name in RAWTEXT_ELEMENTS
            and not self_closing
            and name not in VOID_ELEMENTS
        ):
            rawtext_until = name
    return toks


# ---------------------------------------------------------------------------
# DOM builder (E4)
# ---------------------------------------------------------------------------


@dataclass(slots=True)
class TextNode:
    text: str  # entity-decoded
    start: int  # span into decoded source (pre-entity-decode offsets)
    end: int


@dataclass(slots=True)
class Node:
    tag: str
    attrs: Dict[str, str] = field(default_factory=dict)
    children: List[object] = field(default_factory=list)  # Node | TextNode


# Opening one of these closes an open <p> in scope (HTML5-lite).
_P_CLOSERS = frozenset(
    (
        "address article aside blockquote details div dl fieldset figcaption "
        "figure footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p "
        "pre section table ul li dt dd"
    ).split()
)
# Scope barriers: an implied close never crosses these.
_SCOPE_STOP = frozenset("html body table td th caption li ul ol select".split())

# tag being opened -> tags it implicitly closes (nearest first, within scope)
_IMPLIED_CLOSE = {
    "li": ("li",),
    "dt": ("dt", "dd"),
    "dd": ("dt", "dd"),
    "tr": ("tr", "td", "th"),
    "td": ("td", "th"),
    "th": ("td", "th"),
    "option": ("option",),
    "thead": ("tbody", "tfoot", "tr", "td", "th"),
    "tbody": ("thead", "tfoot", "tr", "td", "th"),
    "tfoot": ("thead", "tbody", "tr", "td", "th"),
}


MAX_DOM_DEPTH = 512  # open-element cap; matches Blink's limit


def build_dom(toks: List[Tok]) -> Node:
    root = Node("#root")
    stack: List[Node] = [root]

    def close_upto(tag: str, respect_scope: bool = True) -> bool:
        """Pop up to & incl. nearest ``tag``. Implied closes stop at scope
        barriers; explicit end tags close through them (HTML5-lite)."""
        if len(stack) > 1 and stack[-1].tag == tag:  # well-formed fast path
            stack.pop()
            return True
        for depth in range(len(stack) - 1, 0, -1):
            t = stack[depth].tag
            if t == tag:
                del stack[depth:]
                return True
            if respect_scope and t in _SCOPE_STOP and t != tag:
                return False
        return False

    unescape = _htmlmod.unescape  # hot loop: locals beat module lookups
    for tok in toks:
        kind = tok.kind
        if kind == TEXT:
            stack[-1].children.append(
                TextNode(unescape(tok.data), tok.start, tok.end)
            )
        elif kind == START:
            name = tok.data
            if name in _IMPLIED_CLOSE:
                for victim in _IMPLIED_CLOSE[name]:
                    if close_upto(victim):
                        break
            if name in _P_CLOSERS:
                close_upto("p")
            node = Node(name, tok.attrs)
            stack[-1].children.append(node)
            # Depth cap (browsers do the same — Blink caps at 512): beyond
            # MAX_DOM_DEPTH new elements attach flat instead of nesting, so
            # adversarially nested pages can neither blow the recursive
            # walkers' stack nor change behavior for any sane document.
            if (
                name not in VOID_ELEMENTS
                and not tok.self_closing
                and len(stack) < MAX_DOM_DEPTH
            ):
                stack.append(node)
        elif kind == END:
            close_upto(tok.data, respect_scope=False)  # unmatched: ignored
        # COMMENT/DECL dropped
    return root


# ---------------------------------------------------------------------------
# Block segmentation + scoring (E6–E10)
# ---------------------------------------------------------------------------

BLOCK_TAGS = frozenset(
    (
        "#root html body p div section article main aside h1 h2 h3 h4 h5 h6 "
        "li dt dd td th pre blockquote figcaption caption summary details ul "
        "ol table thead tbody tfoot tr header footer nav form address "
        "fieldset legend figure hr center dir dl"
    ).split()
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Public Arc90 readability.js hint lists (regexes over class+id).
_POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|post|text|blog|story",
    re.IGNORECASE,
)
_NEGATIVE_RE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta"
    r"|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping"
    r"|tags|tool|widget|nav|menu|breadcrumb|banner|\bad\b|advert|social|share",
    re.IGNORECASE,
)

_TAG_WEIGHT = {
    "p": 10.0,
    "pre": 10.0,
    "blockquote": 10.0,
    "figcaption": 5.0,
    "li": 5.0,
    "td": 5.0,
    "th": 3.0,
    "dd": 5.0,
    "dt": 3.0,
    "caption": 3.0,
    "summary": 3.0,
}
for _h in _HEADING_TAGS:
    _TAG_WEIGHT[_h] = 15.0

_COMMA_CHARS = (",", "、", "，")
_SENTENCE_CHARS = (".", "!", "?", "。", "！", "？")

_STRIP_TAGS = frozenset(ALWAYS_STRIP_TAGS | {"title"})


@dataclass(slots=True)
class Block:
    tag: str
    hint: int  # -1 / 0 / +1 from class/id of owning chain
    keep: bool  # inside a keep_selector subtree
    parts: List[str] = field(default_factory=list)
    link_parts: List[str] = field(default_factory=list)
    start: int = -1
    end: int = -1

    def add(self, t: TextNode, in_link: bool) -> None:
        self.parts.append(t.text)
        if in_link:
            self.link_parts.append(t.text)
        if self.start < 0:
            self.start = t.start
        self.end = t.end


def _class_id_string(node: Node) -> str:
    return (node.attrs.get("class", "") + " " + node.attrs.get("id", "")).strip()


def _hint_of(node: Node, parent_hint: int) -> int:
    s = _class_id_string(node)
    if s:
        if _NEGATIVE_RE.search(s):
            return -1
        if _POSITIVE_RE.search(s):
            return 1
    return parent_hint


def _matches_selectors(node: Node, selectors: Tuple[str, ...]) -> bool:
    if not selectors:
        return False
    if node.tag in selectors:
        return True
    s = _class_id_string(node).lower()
    if s:
        tokens = set(s.replace("-", " ").replace("_", " ").split())
        for sel in selectors:
            if sel in tokens:
                return True
    return False


def segment_blocks(root: Node, rule: Rule) -> List[Block]:
    """Document-order traversal; a block flushes at each block-level boundary."""
    blocks: List[Block] = []
    strip = rule.strip_selectors

    def flush(cur: Optional[Block]) -> None:
        if cur is not None and cur.parts and cur.start >= 0:
            blocks.append(cur)

    def walk(node: Node, cur: Optional[Block], hint: int, keep: bool, in_link: bool):
        for child in node.children:
            if isinstance(child, TextNode):
                if cur is None:
                    cur = Block(node.tag if node.tag in BLOCK_TAGS else "div", hint, keep)
                cur.add(child, in_link)
                continue
            tag = child.tag
            if tag in _STRIP_TAGS:
                continue
            is_keep = keep or _matches_selectors(child, rule.keep_selectors)
            if not is_keep and (tag in strip or _matches_selectors(child, strip)):
                continue
            if tag in BLOCK_TAGS:
                flush(cur)
                cur = None
                child_hint = _hint_of(child, hint)
                sub = walk(child, None, child_hint, is_keep, in_link)
                flush(sub)
            else:
                cur = walk(
                    child, cur, hint, is_keep, in_link or tag == "a"
                )
        return cur

    last = walk(root, None, 0, False, False)
    flush(last)
    return blocks


@dataclass(slots=True)
class ScoredBlock:
    text: str
    start: int
    end: int
    tag: str
    score: float
    keep: bool
    link_density: float


def score_block(b: Block) -> Optional[ScoredBlock]:
    """Shallow-text-feature score (Kohlschütter WSDM'10 + Arc90 hints).

    score = chars/10 + 3*commas + 2*sentence_ends + tag_weight + 15*hint
    (hint=-1 additionally subtracts a 25-point boilerplate penalty).
    """
    text = normalize_ws(" ".join(b.parts))
    if not text:
        return None
    chars = len(text)
    link_chars = len(normalize_ws(" ".join(b.link_parts))) if b.link_parts else 0
    link_density = min(1.0, link_chars / chars)
    commas = sum(text.count(c) for c in _COMMA_CHARS)
    sentences = sum(text.count(c) for c in _SENTENCE_CHARS)
    score = (
        chars / 10.0
        + 3.0 * commas
        + 2.0 * sentences
        + _TAG_WEIGHT.get(b.tag, 0.0)
        + 15.0 * b.hint
    )
    if b.hint < 0:
        score -= 25.0
    return ScoredBlock(text, b.start, b.end, b.tag, score, b.keep, link_density)


def select_blocks(scored: List[ScoredBlock], rule: Rule) -> List[ScoredBlock]:
    """E7/E8 thresholds; force-keep wins; deterministic fallback to the single
    top-scoring block when nothing passes (avoids empty output on short pages)."""
    kept: List[ScoredBlock] = []
    for sb in scored:
        if sb.keep:
            kept.append(sb)
            continue
        if len(sb.text) < rule.min_block_chars:
            continue
        if sb.link_density > rule.max_link_density:
            continue
        threshold = rule.min_text_density
        if sb.tag in _HEADING_TAGS:
            threshold *= 0.5
        if sb.score >= threshold:
            kept.append(sb)
    if not kept and scored:
        best = max(scored, key=lambda s: s.score)  # max() is first-wins: stable
        if best.score > 0 and best.link_density <= rule.max_link_density:
            kept = [best]
    return kept


def extract_html(src: str, rule: Rule = DEFAULT_RULE):
    """Decoded HTML -> (text, spans) where spans = [(start, end, tag), ...].

    Blocks joined with a single "\\n"; no trailing newline (SURVEY §1.3).
    """
    return extract_html_from_dom(build_dom(tokenize(src)), rule)


def extract_html_from_dom(dom: Node, rule: Rule = DEFAULT_RULE):
    """Text arm over an already-built DOM — the seam the fused dual-emit
    kernel uses to parse once and serialize twice (text + markdown)."""
    blocks = segment_blocks(dom, rule)
    scored = [sb for sb in (score_block(b) for b in blocks) if sb is not None]
    kept = select_blocks(scored, rule)
    text = "\n".join(sb.text for sb in kept)
    spans = [(sb.start, sb.end, sb.tag) for sb in kept]
    return text, spans
