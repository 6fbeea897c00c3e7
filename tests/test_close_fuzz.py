"""Seeded randomized fuzz for the round-4-close operators: mirror-host
detection, nepotistic-link features, blocklist census, Unicode script
census — each checked against an independent brute-force PYTHON reference
on random inputs (stronger than invariants: full output equality)."""

import random
import re
import unicodedata

from pyspark.sql import functions as F

from corsearch_project_spark.operators.dedup import mirror_hosts
from corsearch_project_spark.operators.linkgraph import link_spam_features
from corsearch_project_spark.operators.textstats import (
    SCRIPT_ORDER,
    SCRIPT_RANGES,
    blocklist_census,
    script_census,
)

SEED = 20260819


def test_mirror_hosts_vs_bruteforce(spark):
    rng = random.Random(SEED)
    hosts = [f"h{i}.example" for i in range(12)]
    digests = [f"d{i}" for i in range(30)]
    rows = [
        (rng.choice(hosts), rng.choice(digests)) for _ in range(400)
    ]
    min_shared, cap = 2, 5

    # brute force
    hd = set(rows)
    by_digest = {}
    for h, d in hd:
        by_digest.setdefault(d, set()).add(h)
    kept = {(h, d) for h, d in hd if len(by_digest[d]) <= cap}
    sizes = {}
    for h, d in kept:
        sizes[h] = sizes.get(h, 0) + 1
    pair_shared = {}
    for d, hs in by_digest.items():
        if len(hs) > cap:
            continue
        hs = sorted(hs)
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                pair_shared[(hs[i], hs[j])] = (
                    pair_shared.get((hs[i], hs[j]), 0) + 1
                )
    want = {
        (a, b): (n, n * 1000 // min(sizes[a], sizes[b]))
        for (a, b), n in pair_shared.items()
        if n >= min_shared
    }

    df = spark.createDataFrame(rows, "host string, digest string")
    got = {
        (r["host_a"], r["host_b"]): (r["n_shared"], r["overlap_permille"])
        for r in mirror_hosts(
            df, min_shared=min_shared, max_hosts_per_digest=cap
        ).collect()
    }
    assert got == want and len(want) > 0


def test_link_spam_vs_bruteforce(spark):
    rng = random.Random(SEED + 1)
    hosts = [f"s{i}" for i in range(10)]
    edges = {}
    for _ in range(120):
        a, b = rng.choice(hosts), rng.choice(hosts)
        edges[(a, b)] = edges.get((a, b), 0) + rng.randrange(1, 5)

    nonself = {(a, b): n for (a, b), n in edges.items() if a != b}
    want = {}
    for src in {a for a, _ in edges}:
        n_out = sum(n for (a, _), n in edges.items() if a == src)
        outs = {b: n for (a, b), n in nonself.items() if a == src}
        total_out = sum(outs.values())
        recip = sum(1 for b in outs if (b, src) in nonself)
        want[src] = (
            n_out,
            len(outs),
            (n_out - total_out) * 1000 // n_out,
            max(outs.values()) * 1000 // total_out if total_out else 0,
            recip * 1000 // len(outs) if outs else 0,
        )

    df = spark.createDataFrame(
        [(a, b, n) for (a, b), n in edges.items()],
        "src_host string, dst_host string, n_links long",
    )
    got = {
        r["host"]: (r["n_out_links"], r["out_hosts"], r["self_permille"],
                    r["top_dst_permille"], r["recip_permille"])
        for r in link_spam_features(df).collect()
    }
    assert got == want


def test_blocklist_vs_bruteforce(spark):
    rng = random.Random(SEED + 2)
    terms = ("zorb", "qux.x")  # metachar term exercises escaping
    domains = ("bad.example",)
    words = ["zorb", "zorbs", "QUX.X", "quxSx", "clean", "prose", "Zorb."]
    hosts = ["ok.example", "bad.example", "sub.bad.example",
             "notbad.example", "BAD.EXAMPLE:8080"]
    rows = []
    for i in range(200):
        text = " ".join(rng.choice(words) for _ in range(rng.randrange(0, 12)))
        rows.append((i, f"https://{rng.choice(hosts)}/p/{i}", text))

    pat = re.compile(
        r"\b(?:" + "|".join(sorted(re.escape(t) for t in terms)) + r")\b"
    )
    want = {}
    for i, url, text in rows:
        hits = len(pat.findall(text.lower()))
        host = re.match(r"^https?://([^/?#]+)", url).group(1).lower()
        host = re.sub(r":\d+$", "", host)
        blocked = any(host == d or host.endswith("." + d) for d in domains)
        want[i] = (hits, blocked, hits == 0 and not blocked)

    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {
        r["doc_id"]: (r["term_hits"], r["url_blocked"], r["keep"])
        for r in blocklist_census(df, terms, domains).collect()
    }
    assert got == want
    assert any(h for h, _, _ in want.values())  # fuzz actually hit terms


def test_script_census_vs_bruteforce(spark):
    rng = random.Random(SEED + 3)
    pools = {
        name: [c for c in _expand(rng_str) if not unicodedata.combining(c)]
        for name, rng_str in SCRIPT_RANGES
    }
    other = list(" 0123456789.,!?-—…")
    rows = []
    for i in range(200):
        chars = []
        for _ in range(rng.randrange(0, 60)):
            bucket = rng.choice(list(pools) + ["other"] * 3)
            chars.append(
                rng.choice(other if bucket == "other" else pools[bucket])
            )
        rows.append((i, "".join(chars)))

    spans = {
        name: _ranges(rng_str) for name, rng_str in SCRIPT_RANGES
    }
    want = {}
    for i, text in rows:
        counts = {
            n: sum(1 for c in text if any(a <= c <= b for a, b in spans[n]))
            for n in SCRIPT_ORDER
        }
        total = sum(counts.values())
        best = max(counts.values())
        dom = "none"
        if best > 0:
            dom = next(n for n in SCRIPT_ORDER if counts[n] == best)
        perm = best * 1000 // total if total else 0
        want[i] = (tuple(counts[n] for n in SCRIPT_ORDER), total, dom, perm)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            tuple(r[f"n_{n}"] for n in SCRIPT_ORDER),
            r["scripted_chars"], r["dominant_script"], r["dominant_permille"],
        )
        for r in script_census(df).collect()
    }
    assert got == want


def _ranges(rng_str):
    """'A-Za-z...' class body -> [(lo_char, hi_char), ...]."""
    out, i = [], 0
    while i < len(rng_str):
        if i + 2 < len(rng_str) and rng_str[i + 1] == "-":
            out.append((rng_str[i], rng_str[i + 2]))
            i += 3
        else:
            out.append((rng_str[i], rng_str[i]))
            i += 1
    return out


def _expand(rng_str, cap_per_range: int = 40):
    chars = []
    for lo, hi in _ranges(rng_str):
        a, b = ord(lo), ord(hi)
        step = max(1, (b - a) // cap_per_range)
        chars.extend(chr(c) for c in range(a, b + 1, step))
    return chars
