"""Pure-Python deterministic extraction core (no third-party deps).

The same module runs (a) single-process to generate golden digests and
(b) executor-side inside the Arrow kernel; the pytest suite asserts the two
are byte-identical per url (BASELINE.json:6 "byte-identical extracted text").

Determinism rules (SURVEY.md §1.3): stable sorts only, fixed tolerances from
the rule config for all float comparisons, insertion-ordered dicts, no wall
clock, no unicode normalization (bytes in, exact text out), blocks joined with
a single "\\n" and no trailing newline.
"""

from corsearch_project_spark.webextract.extract import (  # noqa: F401
    ExtractResult,
    extract_document,
)
from corsearch_project_spark.webextract.rules import (  # noqa: F401
    DEFAULT_RULE,
    Rule,
    registered_domain,
    rule_for_url,
)
