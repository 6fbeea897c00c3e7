"""URL canonicalization as pure JVM Column expressions.

Crawl-scale dedup starts before content hashing: the same page is fetched
under fragment variants, tracking-parameter variants, case-folded hosts and
explicit default ports, and a 10^12-row table cannot afford a Python UDF to
normalize them. The whole normalization below stays inside whole-stage
codegen (regexp + higher-order array functions), so canonicalizing is a
narrow projection — no shuffle, no Python worker.

Rules (the common subset of RFC 3986 §6 normalization + the de-facto
tracking-param strip every crawl pipeline applies):

1. drop the fragment (``#...``);
2. lowercase scheme and host (path/query stay case-sensitive);
3. drop the scheme's default port (``:443`` for https, ``:80`` for http);
4. drop tracking query params (``utm_*``, ``ref=``) and empty params;
5. sort the surviving query params byte-lexicographically (param order is
   not semantic for the overwhelming majority of endpoints, and sorting
   makes the canonical form deterministic).

The same five steps are expressible in ANSI SQL (DuckDB oracle twin in
``queries/textsim.py::q_url_canonical``), which is what makes the operator
exactly verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _is_tracking(p: Column) -> Column:
    """Tracking/noise params: utm_* family, bare ref=, and empties."""
    head4 = F.substring(p, 1, 4)
    return (head4 == "utm_") | (head4 == "ref=") | (p == "")


def canonicalize_url(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+", "")
    scheme_host = F.when(
        scheme_host.startswith("https://"),
        F.regexp_replace(scheme_host, r":443$", ""),
    ).otherwise(F.regexp_replace(scheme_host, r":80$", ""))

    path = F.substring_index(rest, "?", 1)
    # Everything after the FIRST '?': a legal query value may itself contain
    # '?' (e.g. /p?next=/a?b=1), and the SQL oracle twin uses strpos (first
    # occurrence), so substring_index(..., -1) — which splits at the LAST
    # '?' — would silently drop 'next=/a' and diverge from the oracle.
    qs = F.when(
        rest.contains("?"), F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    ).otherwise(F.lit(""))
    params = F.when(qs == "", F.array().cast("array<string>")).otherwise(
        F.split(qs, "&")
    )
    kept = F.array_sort(F.filter(params, lambda p: ~_is_tracking(p)))
    return F.concat(
        scheme_host,
        path,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
            F.lit("")
        ),
    )
