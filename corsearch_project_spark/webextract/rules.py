"""Per-source extraction rule config (the reference's "config" surface).

The reference is described as "config & pdf-extraction" scripts
(/root/reference/README.md:2); BASELINE.json:6 mandates "Config dispatch
(per-source extraction rules) is broadcast as a lookup structure". A Rule is
a plain immutable record so the whole config dict serializes cheaply into a
Spark broadcast variable and is hashable/deterministic.

Rules are keyed by registered domain ("example.co.uk" -> "example.co.uk",
"a.b.example.com" -> "example.com"). Lookup order: exact host, registered
domain, DEFAULT_RULE.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional, Tuple

# A tiny public-suffix-style list sufficient for deterministic registered-
# domain derivation on synthetic corpora. A production deployment would swap
# in the full Mozilla PSL; the seam is this set.
_TWO_LEVEL_SUFFIXES = frozenset(
    {
        "co.uk",
        "ac.uk",
        "gov.uk",
        "com.au",
        "net.au",
        "org.au",
        "co.jp",
        "or.jp",
        "com.br",
        "com.cn",
        "com.mx",
        "co.in",
        "co.kr",
        "co.nz",
    }
)


def registered_domain(host: str) -> str:
    """Deterministic registered-domain: last two labels, or last three when the
    last two form a known two-level public suffix."""
    host = host.strip().lower().rstrip(".")
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def host_of_url(url: str) -> str:
    """scheme://host[:port]/... -> host (lowercased, port stripped)."""
    s = url
    i = s.find("://")
    if i >= 0:
        s = s[i + 3 :]
    for sep in ("/", "?", "#"):
        j = s.find(sep)
        if j >= 0:
            s = s[:j]
    at = s.rfind("@")
    if at >= 0:
        s = s[at + 1 :]
    colon = s.rfind(":")
    if colon >= 0 and s[colon + 1 :].isdigit():
        s = s[:colon]
    return s.lower()


@dataclass(frozen=True)
class Rule:
    """Per-source extraction tuning (SURVEY.md §1.1 ``rules`` table)."""

    source_key: str = "*"
    # HTML: tag names / class tokens / id tokens force-dropped or force-kept.
    strip_selectors: Tuple[str, ...] = ()
    keep_selectors: Tuple[str, ...] = ()
    # Block is kept when score >= min_text_density (see htmlx.score_block).
    min_text_density: float = 20.0
    # Block dropped when link_chars/chars exceeds this.
    max_link_density: float = 0.5
    # Minimum characters for a candidate block (unless force-kept).
    min_block_chars: int = 8
    # PDF layout tolerances (multiples of font size / leading).
    pdf_line_tol: float = 0.45
    pdf_block_gap: float = 1.6
    # Min horizontal whitespace (points) separating two columns (E16).
    pdf_col_gap: float = 60.0
    # Forced charset decode, e.g. "latin-1"; None -> sniff.
    charset_override: Optional[str] = None
    # Payload cap: documents larger than this many bytes are emitted as
    # doc_kind='oversize' with empty text instead of being parsed — bounds
    # per-row memory in the Arrow kernel (one multi-GB PDF must not OOM a
    # Python worker at 10^12-doc scale). Deterministic: same cap single-
    # process and distributed, so golden digests are unaffected below it.
    max_doc_bytes: int = 33_554_432  # 32 MiB

    def merged(self, **overrides) -> "Rule":
        return replace(self, **overrides)


# Selectors always stripped regardless of rule (non-content by construction).
ALWAYS_STRIP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "head",
        "iframe",
        "svg",
        "object",
        "embed",
        "applet",
        "button",
        "select",
        "option",
        "datalist",
    }
)

DEFAULT_RULE = Rule(
    source_key="*",
    strip_selectors=("nav", "footer", "aside", "form", "header", "menu"),
    keep_selectors=("article", "main"),
)


def rule_for_url(url: str, rules: Optional[Dict[str, Rule]]) -> Rule:
    """Config dispatch: exact host -> registered domain -> default.

    ``rules`` is the broadcast lookup dict {source_key: Rule}. Missing or
    empty config falls back to DEFAULT_RULE (never raises).
    """
    if not rules:
        return DEFAULT_RULE
    host = host_of_url(url)
    r = rules.get(host)
    if r is not None:
        return r
    r = rules.get(registered_domain(host))
    if r is not None:
        return r
    return rules.get("*", DEFAULT_RULE)


def rules_to_plain(rules: Dict[str, Rule]) -> Dict[str, dict]:
    """Rule dict -> plain-dict form (broadcast-friendly, json-serializable)."""
    out = {}
    for k, r in rules.items():
        d = dict(r.__dict__)
        d["strip_selectors"] = list(r.strip_selectors)
        d["keep_selectors"] = list(r.keep_selectors)
        out[k] = d
    return out


_RULE_FIELDS = frozenset(Rule.__dataclass_fields__)


def rules_from_plain(plain: Dict[str, dict]) -> Dict[str, Rule]:
    out = {}
    for k, d in plain.items():
        # forward-compat: silently drop unknown keys so a rules.json written
        # for a newer engine version still loads (config must never take a
        # 10^12-doc job down over an unrecognized tuning knob)
        d = {kk: v for kk, v in d.items() if kk in _RULE_FIELDS}
        d["strip_selectors"] = tuple(d.get("strip_selectors", ()))
        d["keep_selectors"] = tuple(d.get("keep_selectors", ()))
        out[k] = Rule(**d)
    return out
