"""Frozen-golden regression gate: the committed golden_digests.json pins the
extraction core's exact output (400 seeded docs: 308 html / 62 pdf / 30
passthrough). Any change to tokenizer/DOM/scoring/PDF code that alters even
one output byte fails here — the cross-round operationalization of the
"byte-identical to the reference scripts' output" contract (BASELINE.json:6):
once frozen, output never drifts between engine versions."""

import json
import os

from corsearch_project_spark.fixtures.gen_pages import default_rules, gen_pages
from corsearch_project_spark.webextract.extract import extract_document
from corsearch_project_spark.webextract.rules import rule_for_url

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "corsearch_project_spark", "fixtures", "golden_digests.json",
)


def test_core_matches_frozen_goldens():
    with open(GOLDEN) as f:
        want = json.load(f)
    rules = default_rules()
    rows = gen_pages(400, seed=4242, skew="mild", dup_frac=0.0)
    assert len(rows) == len(want)
    mismatches = []
    for r in rows:
        res = extract_document(
            r["url"], r["html"] or b"", r["text"], rule_for_url(r["url"], rules)
        )
        g = want[r["url"]]
        if res.text_sha256 != g["sha"] or res.doc_kind != g["kind"] or res.n_blocks != g["n_blocks"]:
            mismatches.append(r["url"])
    assert not mismatches, (
        f"{len(mismatches)} docs drifted from frozen goldens, e.g. "
        f"{mismatches[:3]} — if the change is INTENTIONAL, regenerate "
        f"golden_digests.json and document why in the commit message"
    )
