"""Markdown serialization of the kept main content — the structure-preserving
emit LLM-training pipelines want beside the plain-text arm.

Plain extracted text (`htmlx.extract_html`) flattens headings, lists and
links into newline-joined paragraphs; corpora prepared for instruction /
long-context training keep that structure instead (heading levels, list
nesting and numbers, link targets, emphasis, code fences), because models
demonstrably use it. This module re-walks the SAME DOM with the SAME
segmentation, scoring, and selection as the text arm — the decision of
*which* blocks are content is shared verbatim (score_block/select_blocks on
the undecorated text, so decoration can never flip a keep decision) — and
only the *rendering* of the kept blocks differs.

Contract:

* Block selection is identical to ``extract_html``: same blocks, same
  spans, same order (pinned by tests: the span list of ``extract_markdown``
  equals ``extract_html``'s on every fixture arm).
* Rendering: h1-h6 -> ``#``-runs; list items -> ``-`` / ``1.`` with
  two-space nesting indent (ordered numbering is per list instance);
  ancestors of ``blockquote`` prefix ``> `` per nesting level; ``pre``
  blocks render fenced (whitespace inside was already collapsed by the
  shared normalizer — the fence marks code-ness, it does not restore
  formatting); inline ``a[href]`` -> ``[text](href)``, ``b/strong`` ->
  ``**text**``, ``i/em`` -> ``*text*``, ``code`` -> `` `text` ``.
* Text passes through UNESCAPED (no ``\\*`` quoting): the consumer is a
  training corpus, not a markdown renderer, and escaping would make the
  markdown arm diverge from the text arm's characters.
* Tables render as plain paragraphs (cell text in document order) — the
  tabular relation lives in ``operators/structured.table_kv``, not in a
  serialization.

Deterministic: pure function of (decoded source, rule), no I/O.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from corsearch_project_spark.webextract.htmlx import (
    BLOCK_TAGS,
    _STRIP_TAGS,
    Block,
    Node,
    TextNode,
    _hint_of,
    _matches_selectors,
    build_dom,
    score_block,
    select_blocks,
    tokenize,
)
from corsearch_project_spark.webextract.rules import DEFAULT_RULE, Rule
from corsearch_project_spark.webextract.textnorm import normalize_ws

_HEADING_LEVEL = {f"h{i}": i for i in range(1, 7)}
_INLINE_WRAP = {"b": ("**", "**"), "strong": ("**", "**"),
                "i": ("*", "*"), "em": ("*", "*"), "code": ("`", "`")}


@dataclass(slots=True)
class _MdCtx:
    """Per-block rendering context captured at block creation time."""
    bq: int = 0
    list_tag: str = ""
    item_no: int = 0
    list_depth: int = 0
    list_id: int = -1  # per-instance: items of different lists never fuse


@dataclass(slots=True)
class _Pair:
    block: Block
    md: List[str] = field(default_factory=list)
    ctx: _MdCtx = field(default_factory=_MdCtx)


class _Walker:
    """Mirror of ``htmlx.segment_blocks``'s traversal (same flush points,
    same strip/keep logic — drift here would desynchronize selection, which
    the span-equality tests would catch) that additionally renders each
    block's inline markdown and records its list/quote context."""

    def __init__(self, rule: Rule):
        self.rule = rule
        self.pairs: List[_Pair] = []
        self.bq = 0
        self.lists: List[List] = []  # [tag, counter, instance-id] stack
        self._next_list_id = 0

    def _flush(self, cur: Optional[_Pair]) -> None:
        if cur is not None and cur.block.parts and cur.block.start >= 0:
            self.pairs.append(cur)

    def walk(self, node: Node, cur: Optional[_Pair], hint: int,
             keep: bool, in_link: bool) -> Optional[_Pair]:
        strip = self.rule.strip_selectors
        for child in node.children:
            if isinstance(child, TextNode):
                if cur is None:
                    tag = node.tag if node.tag in BLOCK_TAGS else "div"
                    top = self.lists[-1] if self.lists else None
                    cur = _Pair(
                        Block(tag, hint, keep),
                        ctx=_MdCtx(
                            bq=self.bq,
                            list_tag=top[0] if top else "",
                            item_no=top[1] if top else 0,
                            list_depth=len(self.lists),
                            list_id=top[2] if top else -1,
                        ),
                    )
                cur.block.add(child, in_link)
                cur.md.append(child.text)
                continue
            tag = child.tag
            if tag in _STRIP_TAGS:
                continue
            is_keep = keep or _matches_selectors(child, self.rule.keep_selectors)
            if not is_keep and (tag in strip or _matches_selectors(child, strip)):
                continue
            if tag in BLOCK_TAGS:
                self._flush(cur)
                cur = None
                child_hint = _hint_of(child, hint)
                pushed_list = pushed_bq = False
                if tag in ("ul", "ol", "dir", "dl"):
                    self.lists.append([tag, 0, self._next_list_id])
                    self._next_list_id += 1
                    pushed_list = True
                elif tag == "li" and self.lists:
                    self.lists[-1][1] += 1
                elif tag == "blockquote":
                    self.bq += 1
                    pushed_bq = True
                sub = self.walk(child, None, child_hint, is_keep, in_link)
                self._flush(sub)
                if pushed_list:
                    self.lists.pop()
                if pushed_bq:
                    self.bq -= 1
            else:
                # Inline element: remember where its markdown starts so the
                # subtree can be wrapped on return. If a block boundary
                # inside flushed/replaced cur (degenerate markup like
                # <a><div>), skip wrapping — the text arm split it too.
                # The flush signal is len(self.pairs): `cur is before` alone
                # is wrong when the inline element OPENS the block (before
                # is None, walk creates the pair) — the common case of a
                # paragraph/heading/list item starting with a link or
                # emphasis, which must still be decorated.
                before = cur
                npairs = len(self.pairs)
                mark = len(cur.md) if cur is not None else 0
                cur = self.walk(child, cur, hint, is_keep,
                                in_link or tag == "a")
                if (
                    cur is not None
                    and len(self.pairs) == npairs
                    and (cur is before or before is None)
                    and len(cur.md) > mark
                ):
                    inner = normalize_ws(" ".join(cur.md[mark:]))
                    if inner:
                        wrapped = None
                        if tag == "a":
                            href = child.attrs.get("href", "")
                            if href:
                                wrapped = f"[{inner}]({href})"
                        elif tag in _INLINE_WRAP:
                            o, c = _INLINE_WRAP[tag]
                            wrapped = f"{o}{inner}{c}"
                        if wrapped is not None:
                            cur.md[mark:] = [wrapped]
        return cur


def _render(pair: _Pair, text: str) -> Tuple[str, int]:
    """-> (rendered block, list-instance id or -1). ``text`` is the scored
    (undecorated) text; the markdown body swaps in the decorated parts."""
    body = normalize_ws(" ".join(pair.md)) or text
    tag, ctx = pair.block.tag, pair.ctx
    if tag in _HEADING_LEVEL:
        body = "#" * _HEADING_LEVEL[tag] + " " + body
        return _quote(body, ctx.bq), -1
    if tag == "li" and ctx.list_tag:
        indent = "  " * max(0, ctx.list_depth - 1)
        marker = f"{ctx.item_no}. " if ctx.list_tag == "ol" else "- "
        return _quote(indent + marker + body, ctx.bq), ctx.list_id
    if tag == "pre":
        return _quote(f"```\n{body}\n```", ctx.bq), -1
    return _quote(body, ctx.bq), -1


def _quote(s: str, depth: int) -> str:
    if depth <= 0:
        return s
    prefix = "> " * depth
    return "\n".join(prefix + line for line in s.split("\n"))


def extract_markdown(src: str, rule: Rule = DEFAULT_RULE):
    """Decoded HTML -> (markdown, spans).

    spans are IDENTICAL to ``extract_html``'s on the same input (same
    selection); consecutive list items join with one newline, everything
    else with a blank line; no trailing newline.
    """
    return markdown_from_dom(build_dom(tokenize(src)), rule)


def _select_pairs(pairs: List[_Pair], rule: Rule):
    scored = []
    owner = {}
    for p in pairs:
        sb = score_block(p.block)
        if sb is not None:
            scored.append(sb)
            owner[id(sb)] = p
    return select_blocks(scored, rule), owner


def _emit(kept, owner) -> Tuple[str, list]:
    out: List[str] = []
    spans = []
    prev_list = -1
    for sb in kept:
        rendered, list_id = _render(owner[id(sb)], sb.text)
        same_list = list_id >= 0 and list_id == prev_list
        out.append(("\n" if same_list else "\n\n") + rendered
                   if out else rendered)
        prev_list = list_id
        spans.append((sb.start, sb.end, sb.tag))
    return "".join(out), spans


def markdown_from_dom(dom: Node, rule: Rule = DEFAULT_RULE):
    """Markdown arm over an ALREADY-BUILT DOM — the fused dual-emit path:
    the kernel tokenizes + builds the DOM once per document and feeds the
    same tree to both serializations, so enabling the markdown column
    costs one extra walk, not a second parse."""
    walker = _Walker(rule)
    last = walker.walk(dom, None, 0, False, False)
    walker._flush(last)
    kept, owner = _select_pairs(walker.pairs, rule)
    return _emit(kept, owner)
