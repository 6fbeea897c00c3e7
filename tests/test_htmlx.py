"""Unit tests for the HTML extraction core (SURVEY §5.2 layer 1)."""

from corsearch_project_spark.webextract.htmlx import (
    build_dom,
    extract_html,
    tokenize,
)
from corsearch_project_spark.webextract.rules import DEFAULT_RULE, Rule


def test_tokenizer_offsets_roundtrip():
    src = '<p class="a">Hi &amp; bye</p><!-- c --><br/>tail'
    toks = tokenize(src)
    kinds = [t.kind for t in toks]
    assert kinds == ["start", "text", "end", "comment", "start", "text"]
    for t in toks:
        assert 0 <= t.start < t.end <= len(src)
    assert toks[1].data == "Hi &amp; bye"
    assert src[toks[1].start : toks[1].end] == "Hi &amp; bye"


def test_tokenizer_rawtext_and_literal_lt():
    src = "<script>if (a<b) { x='</div>'; }</script>after 1 < 2 ok"
    toks = tokenize(src)
    # script content swallowed as raw text up to the real close tag
    assert any(t.kind == "text" and "a<b" in t.data for t in toks)
    # literal '<' outside a tag is text; tail survives across text tokens
    tail = "".join(
        t.data for t in toks if t.kind == "text" and t.start >= src.find("after")
    )
    assert "1 < 2 ok" in tail


def test_tokenizer_attr_variants():
    toks = tokenize("<a href=/x title='T' data-k=\"v\" disabled>z</a>")
    a = toks[0]
    assert a.attrs == {"href": "/x", "title": "T", "data-k": "v", "disabled": ""}


def test_dom_implied_end_tags():
    dom = build_dom(tokenize("<ul><li>one<li>two</ul><p>a<p>b"))
    ul = dom.children[0]
    assert [c.tag for c in ul.children] == ["li", "li"]
    ps = [c for c in dom.children[1:] if getattr(c, "tag", "") == "p"]
    assert len(ps) == 2


def test_dom_stray_end_tag_ignored():
    dom = build_dom(tokenize("<div><p>x</span></p></div>extra</div>"))
    assert dom.children[0].tag == "div"


def test_extract_strips_boilerplate_keeps_content():
    html = (
        "<body><nav><a href='/'>Home</a><a href='/a'>A</a></nav>"
        "<article><p>Main content paragraph, long enough to score well, "
        "with commas, and a full sentence.</p></article>"
        "<footer>Copyright 2024 Somebody</footer></body>"
    )
    text, spans = extract_html(html)
    assert "Main content paragraph" in text
    assert "Home" not in text and "Copyright" not in text
    assert len(spans) == 1 and spans[0][2] == "p"


def test_extract_entities_decoded():
    html = "<body><p>caf&eacute; &amp; cr&#232;me, truly a delight. " \
           "More words follow to pass the threshold easily, yes.</p></body>"
    text, _ = extract_html(html)
    assert "café & crème" in text


def test_extract_link_density_filter():
    html = (
        "<body><div><a href='1'>lots</a> <a href='2'>of</a> <a href='3'>links</a> "
        "<a href='4'>in a row here</a></div>"
        "<p>Real prose sentence with enough length, commas, and substance to stay.</p></body>"
    )
    text, _ = extract_html(html)
    assert "Real prose" in text and "lots of links" not in text


def test_extract_keep_selector_overrides_threshold():
    rule = DEFAULT_RULE.merged(keep_selectors=("article", "main"))
    html = "<body><article><p>tiny</p></article><div>unkept tiny</div></body>"
    text, _ = extract_html(html, rule)
    assert "tiny" in text.split("\n")[0]


def test_extract_strip_selector_by_class():
    rule = DEFAULT_RULE.merged(strip_selectors=("promo",))
    html = (
        "<body><div class='promo'><p>Buy this great thing now, cheap, fast, easy!</p></div>"
        "<p>Editorial body text continues here with sufficient mass, commas, and an end.</p></body>"
    )
    text, _ = extract_html(html, rule)
    assert "Editorial" in text and "Buy this" not in text


def test_extract_fallback_single_best_block():
    text, spans = extract_html("<body><p>Short one.</p></body>")
    assert text == "Short one."
    assert len(spans) == 1


def test_spans_point_into_source():
    html = "<body><p>Alpha beta gamma delta epsilon, a sentence long enough to keep.</p></body>"
    text, spans = extract_html(html)
    s, e, kind = spans[0]
    assert html[s:e].startswith("Alpha beta")
    assert kind == "p"


def test_determinism():
    from corsearch_project_spark.fixtures.gen_pages import make_html
    import random

    for seed in range(20):
        b = make_html(random.Random(seed))
        src = b.decode("utf-8", "replace")
        assert extract_html(src) == extract_html(src)
