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


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key for a url.

    The key the web-archive world sorts its capture indexes by (Common
    Crawl's CDX index, OpenWayback, pywb): drop the scheme, lowercase the
    host, drop an explicit default port (``:80``/``:443``), strip a leading
    ``www.`` label, REVERSE the remaining host labels and join them with
    commas, then append ``)`` + path (+ the canonicalized query, reusing
    rule 4–5 of :func:`canonicalize_url`)::

        HTTPS://WWW.News.Example.com:443/p/1?b=2&utm_s=x&a=1
            -> com,example,news)/p/1?a=1&b=2

    Why reversed-host: byte-lexicographic order on the key clusters every
    url of a registrable domain (and every subdomain under it) into one
    contiguous key range, so a 10^12-row capture index range-partitioned on
    ``surt`` serves per-domain lookups and per-domain sequential scans from
    a bounded partition range — the same min/max pruning the S15 manifest
    does per bucket, but domain-contiguous. Everything below is codegen
    regexp + higher-order array ops: a narrow projection, no Python, no
    shuffle.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    hostport = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?]+)", 1))
    # A non-default port belongs AFTER the reversed host ("com,ex:8443)"),
    # so peel it off before the label reversal, drop it if default.
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when((port == "80") | (port == "443"), F.lit("")).otherwise(port)
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
    )

    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+", "")
    path = F.substring_index(rest, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.when(
        rest.contains("?"), F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    ).otherwise(F.lit(""))
    params = F.when(qs == "", F.array().cast("array<string>")).otherwise(
        F.split(qs, "&")
    )
    kept = F.array_sort(F.filter(params, lambda p: ~_is_tracking(p)))
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
            F.lit("")
        ),
    )
