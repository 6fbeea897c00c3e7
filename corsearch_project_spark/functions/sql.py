"""Reusable JVM-side Column helpers (no Python UDFs — SURVEY §2.10 rule).

All of these compile to Catalyst expressions inside whole-stage codegen; they
exist so the hot path never needs a Python round-trip for derivable columns.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, functions as F

# url -> host (scheme://[user@]host[:port]/...) — regexp, stays in codegen.
def host_of(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    )


def registered_domain_of(url: Column | str) -> Column:
    """Last-two-labels approximation of webextract.rules.registered_domain;
    exact two-level-suffix handling happens Python-side only where rules are
    dispatched (inside the kernel)."""
    return F.regexp_extract(host_of(url), r"([^.]+\.[^.]+)$", 1)


def sha256_of(col: Column | str) -> Column:
    """E18: per-url digest computed in-JVM (BASELINE.json:6)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("binary"), 256)


def digest_xor_chunks(digest_col: str = "text_sha256") -> List[Column]:
    """Order-insensitive 256-bit rollup of sha256 hex digests (lineage S4/A5):
    XOR the digest in eight 32-bit chunks entirely JVM-side — scale-safe
    (no collect_list; works at 10^8 rows/bucket where a sorted-concat
    grouped-map would not fit in memory)."""
    return [
        F.bit_xor(
            F.conv(F.substring(F.col(digest_col), i * 8 + 1, 8), 16, 10).cast("long")
        ).alias(f"_x{i}")
        for i in range(8)
    ]


def digest_xor_concat() -> Column:
    """Recombine the eight XOR'd chunks into a 64-hex-char rollup string."""
    return F.concat(
        *[F.lpad(F.lower(F.hex(F.col(f"_x{i}"))), 8, "0") for i in range(8)]
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Embedding dot product via higher-order functions (SURVEY O13) —
    JVM-side, no UDF: aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (s,v) -> s+v)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
