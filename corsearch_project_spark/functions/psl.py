"""Registrable-domain extraction (public-suffix aware) — pure codegen.

Host-level statistics mislead at web scale: ``a.blogspot.com`` and
``b.blogspot.com`` are different publishers while ``www.bbc.co.uk`` and
``news.bbc.co.uk`` are the same one. Every serious curation pipeline
(C4's domain filters, RefinedWeb's per-domain caps, Common Crawl's
ranked-domain stats) therefore rolls up by the REGISTRABLE domain: the
public suffix plus one label, where "public suffix" comes from Mozilla's
Public Suffix List (publicsuffix.org — public data).

This module ships a curated PSL subset as literal arrays compiled
straight into the plan (no join, no broadcast variable, no Python): the
match is two ``substring_index`` probes — does the host's 2-label tail
sit in the 2-label suffix set, else does its 1-label tail sit in the
1-label set — taking the longest match, exactly the PSL algorithm
restricted to the shipped depth. At deploy time the full PSL (~9k
entries) drops into the same two arrays; Catalyst turns array_contains
over a sorted literal array into a hash-set probe, so the projection
stays whole-stage-codegen at any list size. Wildcard (``*.ck``) and
exception (``!www.ck``) rules are the documented seam — they need one
more probe level each, same shape.

Fallbacks, per the PSL algorithm: a host whose tail matches nothing is
its own registrable domain (intranet names, bare ``localhost``); a host
that IS a public suffix (someone linking to ``co.uk`` itself) also maps
to itself rather than NULL — callers group on the value, and a handful
of suffix-host rows grouping to themselves is harmless.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Curated subset: the generic TLDs plus the multi-label and private
# suffixes the synthesis/tests exercise. Deploy seam: replace with the
# full publicsuffix.org dat (same two tuples, built by a 20-line parser).
SUFFIXES_1 = (
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co",
    "ai", "dev", "app", "info", "biz", "uk", "de", "fr", "jp", "au",
    "cn", "ru", "br", "in", "us", "eu", "nl", "it", "es", "se", "ch",
)
SUFFIXES_2 = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in",
    # private-registry suffixes: each label under them is a publisher
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "cloudfront.net", "amazonaws.com", "netlify.app", "vercel.app",
)


def registrable_domain(host: Column) -> Column:
    """Registrable domain (eTLD+1) of a lowercase hostname Column."""
    h = F.lower(host)
    n = F.size(F.split(h, r"\."))
    tail1 = F.substring_index(h, ".", -1)
    tail2 = F.substring_index(h, ".", -2)
    in1 = F.array_contains(F.lit(list(SUFFIXES_1)).cast("array<string>"), tail1)
    in2 = F.array_contains(F.lit(list(SUFFIXES_2)).cast("array<string>"), tail2)
    return (
        F.when(in2 & (n >= 3), F.substring_index(h, ".", -3))
        .when(in2, h)  # the host IS a 2-label suffix
        .when(in1 & (n >= 2), tail2)
        .otherwise(h)  # unknown tail or bare label: host is its own domain
    )
