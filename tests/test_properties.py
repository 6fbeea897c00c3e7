"""Property-based tests (SURVEY §5.2 'Property-based' layer): invariants of
the extraction core over randomized generated corpora — spans in-bounds and
non-overlapping, digest/char-count consistency, determinism across repeated
calls, and stability under re-partitioning (digest set is layout-invariant,
which is what makes the XOR lineage rollup meaningful)."""

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from corsearch_project_spark.fixtures.gen_pages import default_rules, gen_page_row
from corsearch_project_spark.webextract.extract import extract_document
from corsearch_project_spark.webextract.rules import DEFAULT_RULE, rule_for_url

RULES = default_rules()


def _extract(seed: int, idx: int):
    r = gen_page_row(seed, idx, skew="mild")
    return r, extract_document(
        r["url"], r["html"] or b"", r["text"], rule_for_url(r["url"], RULES)
    )


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**20), idx=st.integers(0, 5000))
def test_span_invariants(seed, idx):
    _, res = _extract(seed, idx)
    prev_end = None
    for s in res.spans:
        start, end, kind = s
        assert 0 <= start <= end, (start, end)
        assert kind in ("html_block", "pdf_block", "text", "fallback") or isinstance(kind, str)
        if prev_end is not None:
            assert start >= prev_end, "spans must be ordered and non-overlapping"
        prev_end = end


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**20), idx=st.integers(0, 5000))
def test_digest_and_counts_consistent(seed, idx):
    _, res = _extract(seed, idx)
    assert res.text_sha256 == hashlib.sha256(res.text.encode("utf-8")).hexdigest()
    assert res.n_chars == len(res.text)
    assert res.n_blocks == len(res.spans)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**18), idx=st.integers(0, 3000))
def test_extraction_deterministic(seed, idx):
    _, a = _extract(seed, idx)
    _, b = _extract(seed, idx)
    assert a.text == b.text
    assert a.spans == b.spans


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**16))
def test_rollup_digest_order_invariant(seed):
    """The XOR-of-sha256 rollup (lineage) must be invariant under any
    permutation of per-url digests — the property that makes it comparable
    across salted/unsalted/resumed layouts."""
    digests = [
        _extract(seed, i)[1].text_sha256 for i in range(6)
    ]

    def rollup(ds):
        acc = [0] * 8
        for d in ds:
            for k in range(8):
                acc[k] ^= int(d[k * 8 : k * 8 + 8], 16)
        return "".join(f"{x:08x}" for x in acc)

    import random

    shuffled = digests[:]
    random.Random(seed).shuffle(shuffled)
    assert rollup(digests) == rollup(shuffled)
