"""RSS/Atom feed extraction (webextract/feedx.py) and its sniff/dispatch
wiring. Pins exact extracted text on hand feeds (the byte-identity
contract applies to the feed arm like every other kind), the XHTML guard
(an XML prolog alone must NOT divert pages from the html path), and
deterministic extraction over the seeded fixture writer."""

import random

from corsearch_project_spark.fixtures.gen_pages import make_feed
from corsearch_project_spark.webextract.extract import extract_document
from corsearch_project_spark.webextract.feedx import extract_feed, is_feed
from corsearch_project_spark.webextract.rules import DEFAULT_RULE
from corsearch_project_spark.webextract.sniff import sniff_kind

RSS = b"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0"><channel>
<title>Example News</title><language>en</language>
<item><title>First story</title>
<description>Plain words here.</description></item>
<item><title>Second &amp; last</title>
<description>&lt;p&gt;Escaped &lt;b&gt;html&lt;/b&gt; body.&lt;/p&gt;</description></item>
<item><title></title><description><![CDATA[<p>Raw cdata &amp; kept.</p>]]></description></item>
</channel></rss>"""

ATOM = b"""<feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom Feed Title</title>
<entry><title>Entry one</title><summary type="html">Summary text.</summary></entry>
<entry><title>Entry two</title><content type="html"><![CDATA[Body <i>two</i>.]]></content></entry>
</feed>"""


def test_rss_exact_text_and_labels():
    text, spans = extract_feed(RSS.decode())
    assert text == (
        "Example News\n"
        "First story\n"
        "Plain words here.\n"
        "Second & last\n"
        "Escaped html body.\n"
        "Raw cdata &amp; kept."  # CDATA content is literal: no unescape
    )
    assert [s[2] for s in spans] == [
        "feed_title", "item_title", "item_desc", "item_title", "item_desc",
        "item_desc",
    ]
    src = RSS.decode()
    for a, b, _ in spans:
        assert 0 <= a < b <= len(src)


def test_atom_exact_text():
    text, spans = extract_feed(ATOM.decode())
    # tag strip inserts a separator space ('a<br>b' must not glue to
    # 'ab'), so an inline close tag before punctuation leaves 'two .'
    assert text == (
        "Atom Feed Title\nEntry one\nSummary text.\nEntry two\nBody two ."
    )
    assert [s[2] for s in spans] == [
        "feed_title", "item_title", "item_desc", "item_title", "item_desc",
    ]


def test_sniff_feed_vs_xhtml_guard():
    assert sniff_kind(RSS) == "feed"
    assert sniff_kind(ATOM) == "feed"
    xhtml = (b'<?xml version="1.0"?><!DOCTYPE html><html xmlns='
             b'"http://www.w3.org/1999/xhtml"><body><p>page</p></body></html>')
    assert sniff_kind(xhtml) == "html"
    assert sniff_kind(b"<rssx>not a feed</rssx>") == "html"


def test_dispatch_and_digest():
    res = extract_document("https://f.example.com/feed.xml", RSS, None, DEFAULT_RULE)
    assert res.doc_kind == "feed"
    assert res.n_blocks == 6 and res.text.startswith("Example News\n")
    # empty/garbage degrades, never raises
    res2 = extract_document("u", b"<rss ><channel></channel>", None, DEFAULT_RULE)
    assert res2.doc_kind == "feed" and res2.text == "" and res2.n_blocks == 0


def test_fixture_writer_deterministic_and_extractable():
    for flavor in ("rss", "atom"):
        a = make_feed(random.Random(7), flavor)
        b = make_feed(random.Random(7), flavor)
        assert a == b
        assert sniff_kind(a) == "feed"
        text, spans = extract_feed(a.decode())
        assert text and spans and spans[0][2] == "feed_title"
    # 200-feed sweep: every fixture extracts deterministically, items>=1
    for i in range(200):
        data = make_feed(random.Random(1000 + i))
        t1, s1 = extract_feed(data.decode())
        t2, _ = extract_feed(data.decode())
        assert t1 == t2 and t1.count("\n") >= 1
