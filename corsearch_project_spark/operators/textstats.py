"""Text analysis operators for training-data curation (SURVEY-mandated):
token counting, quality scoring, n-gram-heuristic language ID, and document
fingerprinting — all as JVM Column expressions (no Python on the hot path),
each reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from corsearch_project_spark.operators.dedup import word_shingles, words
from corsearch_project_spark.functions.portable import phash

# Tiny per-language stopword marker sets for the n-gram-heuristic language
# scorer. Order is the deterministic tie-break priority.
LANG_MARKERS = {
    "en": ("the", "and", "with", "for"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "que", "una"),
    "de": ("der", "und", "die", "nicht"),
}
LANG_ORDER = ("en", "fr", "es", "de")


def token_count(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_chars(text: Column) -> Column:
    """Punctuation char count via length-difference (regexp_replace is
    global in both engines)."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?'\"()-]", ""))
    ).cast("long")


def stopword_hits(text: Column, markers) -> Column:
    low = F.filter(words(F.lower(text)), lambda x: x.isin(*markers))
    return F.size(low).cast("long")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize very short docs, high
    punctuation density, and low stopword ratio — the shape of C4/Gopher
    quality rules, deterministic integer/double math only."""
    n_tok = token_count(text)
    n_chr = char_count(text)
    punct_ratio = punct_chars(text).cast("double") / F.greatest(
        n_chr, F.lit(1)
    ).cast("double")
    stop_ratio = stopword_hits(text, LANG_MARKERS["en"]).cast("double") / F.greatest(
        n_tok, F.lit(1)
    ).cast("double")
    len_term = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * len_term
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))),
        6,
    )


def sentence_count(text: Column) -> Column:
    """Sentence count as runs of terminal punctuation (``[.!?]+`` — '...',
    '?!' etc. end ONE sentence). A trailing fragment with no terminator is
    not counted; callers clamp with greatest(_, 1). regexp_count is JVM
    codegen; DuckDB twin is len(regexp_extract_all(...))."""
    return F.regexp_count(text, F.lit(r"[.!?]+")).cast("long")


def syllable_count(text: Column) -> Column:
    """Syllable approximation: vowel-group runs (``[aeiouy]+``) over the
    lowercased doc — the classic readability heuristic (each maximal vowel
    cluster ≈ one syllable; silent-e and zero-vowel tokens are accepted
    error, documented). Pure codegen, exact SQL twin."""
    return F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+")).cast("long")


def readability(text: Column) -> dict:
    """Flesch reading-ease + Flesch-Kincaid grade from the three counts.

    Both scores are plain double arithmetic over integer counts in a fixed
    operand order, so Spark and DuckDB produce bit-identical IEEE doubles
    (same rule as quality_score): wps = words/max(sentences,1), spw =
    syllables/max(words,1); flesch = 206.835 - 1.015*wps - 84.6*spw;
    fk_grade = 0.39*wps + 11.8*spw - 15.59. Rounded to 4 dp."""
    n_w = token_count(text)
    n_s = sentence_count(text)
    n_y = syllable_count(text)
    wps = n_w.cast("double") / F.greatest(n_s, F.lit(1)).cast("double")
    spw = n_y.cast("double") / F.greatest(n_w, F.lit(1)).cast("double")
    return {
        "n_words": n_w,
        "n_sentences": n_s,
        "n_syllables": n_y,
        "flesch": F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4),
        "fk_grade": F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4),
    }


def char_entropy_stats(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-doc Shannon entropy of the CHARACTER distribution — the
    low-entropy alarm (template spam, base64 blobs, repeated separators)
    quality cascades use beside the word-level repetition filters.

    Exactness: the one float op per distinct character, ``-ln(c/n)``, is
    evaluated on bit-identical double operands in both engines and
    quantized to integer micro-nats immediately (the operators/lm.py
    recipe), so the per-doc sum Σ c·surprisal_micro is order-independent
    BIGINT math; the final /n division is one double op in a fixed order.
    Shape: char explode → (id, ch) partial-agg count → id-window total →
    id partial-agg sum — two id-keyed shuffles, no Python."""
    from pyspark.sql import Window

    counts = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy(id_col))
    surprisal_u = F.round(
        -F.log(F.col("c").cast("double") / n.cast("double")) * F.lit(1e6), 0
    ).cast("long")
    per = counts.select(
        id_col,
        F.col("c"),
        n.alias("n"),
        (F.col("c") * surprisal_u).alias("contrib"),
    )
    return per.groupBy(id_col).agg(
        F.max("n").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum("contrib").alias("entropy_micro"),
    ).select(
        id_col,
        "n_chars",
        "n_distinct_chars",
        "entropy_micro",
        F.round(
            F.col("entropy_micro").cast("double")
            / (F.col("n_chars").cast("double") * F.lit(1e6)),
            6,
        ).alias("entropy"),
    )


def dup_fraction(arr: Column) -> Column:
    """Repetition ratio of an array: 1 - distinct/total, rounded to 6 dp.

    The Gopher/MassiveText repetition filters (duplicate-line fraction,
    duplicate-n-gram fraction) are all this shape over different unit
    arrays; array_distinct keeps it a narrow JVM projection — no explode,
    no shuffle, per-row work linear in doc length."""
    n = F.size(arr)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(arr)).cast("double")
            / F.greatest(n, F.lit(1)).cast("double"),
            6,
        )
    )


def lang_scores(text: Column):
    """dict lang -> hit-count Column."""
    return {lang: stopword_hits(text, m) for lang, m in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts with fixed priority tie-break; 'und'
    when nothing matched."""
    scores = lang_scores(text)
    best = F.greatest(*[scores[lg] for lg in LANG_ORDER])
    expr = F.lit("und")
    # build reversed so earlier langs in LANG_ORDER win ties
    for lg in reversed(LANG_ORDER):
        expr = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


def fingerprint(text: Column, n: int = 4) -> Column:
    """Document fingerprint: minimum portable hash over word n-gram
    shingles (a 1-permutation MinHash — the rolling-hash winnowing
    primitive). Null for docs shorter than n words."""
    grams = word_shingles(text, n)
    hashes = F.transform(grams, lambda g: phash(g))
    return F.array_min(hashes)


def hash_split(key: Column, train: int = 80, valid: int = 10) -> Column:
    """Reproducible train/valid/test assignment from the portable hash of a
    stable key (url/doc_id) — the standard deterministic-split recipe for
    training corpora: membership is a pure function of the key, so reruns,
    increments and different cluster sizes all agree; no rand(), no state.
    Buckets: [0,train) -> 'train', [train,train+valid) -> 'valid',
    rest -> 'test'."""
    h = phash(key) % 100
    return (
        F.when(h < train, F.lit("train"))
        .when(h < train + valid, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def pack_bins(tokens: Column, budget: int, order, partition) -> Column:
    """Sequence-packing bin id: contiguous docs (in ``order`` within
    ``partition``) are packed by token cumsum — bin = floor(
    cumsum_before / budget). A bin can overflow by at most the ONE doc
    straddling its boundary (exact greedy packing needs a sequential reset
    per bin — not expressible as a window); downstream packers truncate or
    spill the straddler. One window per partition key (packing shard); at
    10^12 docs the shard key (lang, url_bucket, ...) bounds window state
    per task, so no global sort materializes."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*partition)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens).over(w), F.lit(0).cast("long"))
    return F.floor(cum_before / F.lit(budget)).cast("long")


# --------------------------------------------------------------------------
# PII scrubbing (round 4): the redaction pass every published LLM data
# pipeline runs before training (emails/phones/IPs at minimum). Patterns
# are written in the RE2 ∩ java.util.regex common dialect so the Spark
# plan and the DuckDB oracle twin execute the SAME regexes; replacement is
# ordered email -> ip -> phone so the later, looser phone class can never
# eat a dotted IP or an address local-part. Pure regexp_replace chain —
# whole-stage codegen, no Python.
# --------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def scrub_pii(text: Column) -> Column:
    """Redact emails, IPv4 addresses and phone-shaped digit runs (in that
    order) with typed placeholder tokens."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def pii_counts(text: Column) -> tuple:
    """(n_emails, n_ips, n_phones) found in ``text`` (pre-redaction)."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)),
    )


def mixture_keep(
    stratum: Column,
    key: Column,
    rates_permille: dict,
    default_permille: int = 1000,
    salt: str = "mix:",
) -> Column:
    """Deterministic training-mixture DOWN-sampling verdict.

    Corpus mixtures (The Pile's per-source weights, DoReMi-style domain
    reweighting, per-language caps) need each stratum sampled at its own
    rate — reproducibly, so increments, reruns and any cluster size keep
    the exact same rows. Verdict: ``phash(salt || key) % 1000 <
    rate[stratum]`` — a pure function of the row, no rand()/state, no
    shuffle; the rate CASE over the (small, broadcast-free) literal dict
    and the hash are one codegen projection. The salt decorrelates the
    sampling hash from `hash_split`'s (the same key must not make
    'kept for training' correlate with 'assigned to test').

    Rates above 1000 (up-sampling) are out of scope by design: repeat an
    up-weighted stratum by unioning k salted copies instead, which keeps
    the pure-function-of-key property per copy.
    """
    h = phash(F.concat(F.lit(salt), key)) % 1000
    verdict = F.lit(default_permille)
    for name, rate in sorted(rates_permille.items(), reverse=True):
        verdict = F.when(stratum == name, F.lit(int(rate))).otherwise(verdict)
    return h < verdict


def chunk_sentences(
    df,
    max_tokens: int,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """Sentence-boundary chunking for training-sequence prep.

    ``pack_bins`` packs whole documents into token budgets; tokenizer
    pipelines also need the converse — splitting LONG documents into
    ~max_tokens chunks WITHOUT cutting mid-sentence, so no training
    sequence starts in the middle of a thought. Sentences (split at
    ``[.!?]`` + whitespace, a codegen lookbehind regex) are greedily
    assigned chunk ids by token cumsum: chunk = floor(tokens_before /
    max_tokens) — the same straddle rule as pack_bins (one sentence may
    overflow its chunk; a single sentence longer than the budget becomes
    its own oversized chunk rather than being cut). Reassembly orders by
    sentence position via array_sort over (pos, sent) structs —
    collect_list alone has no deterministic order.

    Scale shape: posexplode to sentence rows, ONE window + ONE groupBy
    both keyed on the doc (AQE sees the shared partitioning); per-doc
    state is bounded by document length, never corpus-sized; no Python.
    Returns (doc, chunk_id, chunk_text, n_tok).
    """
    from pyspark.sql import Window

    sents = df.select(
        F.col(doc_col).alias("doc"),
        F.posexplode(
            F.split(F.col(text_col), r"(?<=[.!?])\s+")
        ).alias("pos", "sent"),
    ).where(F.trim(F.col("sent")) != "")
    n_tok = F.size(F.split(F.trim(F.col("sent")), " "))
    w = Window.partitionBy("doc").orderBy("pos")
    staged = sents.select(
        "doc", "pos", "sent", n_tok.alias("n_tok")
    ).withColumn(
        "before",
        F.coalesce(
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    return (
        staged.withColumn(
            "chunk_id", F.floor(F.col("before") / max_tokens).cast("long")
        )
        .groupBy("doc", "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                    lambda x: x["sent"],
                ),
                " ",
            ).alias("chunk_text"),
            F.sum("n_tok").alias("n_tok"),
        )
    )


def domain_cap(
    df,
    cap: int,
    domain_col: str = "domain",
    key_col: str = "url",
):
    """Per-domain document cap (RefinedWeb-style): keep at most ``cap``
    docs per domain, chosen DETERMINISTICALLY by portable-hash rank of
    the stable key — not by input order, so reruns, increments and any
    cluster size keep the same survivors, and the kept subset is an
    unbiased pseudo-random sample of each domain (hash order is
    uncorrelated with crawl order or quality).

    Mega-domains dominate web corpora (the largest registrable domains
    hold billions of pages); capping them is the standard defense
    against domain-level memorization and topic skew. One window
    shuffle keyed on the domain; AQE's skew split handles the very
    mega-domains being capped. Ties cannot happen (rank includes the
    key itself as tiebreak)."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        phash(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )


def common_token_fraction(
    docs,
    min_df: int = 3,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """Corpus-relative vocabulary quality: per doc, the permille of its
    tokens whose corpus DOCUMENT frequency is >= min_df.

    Gibberish, OCR noise, and boilerplate-free spam share one signature:
    tokens that appear almost nowhere else in the corpus. CCNet ranks by
    LM perplexity; this is the LM-free integer-exact analogue (corpus df
    as the probability proxy), bit-identical across engines where a
    float logprob sum would not be.

    Shape — the doc<->corpus statistics join, distinct from every other
    textstats op: (1) explode to (doc, token) pairs, de-duped per doc;
    (2) partial-agg token -> df (vocab-sized relation, Zipf-small
    relative to the corpus); (3) join pairs back to df on token — AQE
    broadcasts the df side when it fits, else shuffle-joins on token
    with map-side combine having already collapsed repeats; (4) per-doc
    agg to the permille. Three linear shuffles, no Python.

    Returns (doc, n_tok, n_common_tok, common_permille) where n_tok
    counts DISTINCT tokens (the df relation is per-doc-distinct by
    construction — within-doc repetition is q_text_repetition's job).
    """
    pairs = docs.select(
        F.col(doc_col).alias("doc"),
        F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), " "))).alias("tok"),
    ).where(F.col("tok") != "")
    df_rel = pairs.groupBy("tok").agg(F.countDistinct("doc").alias("df"))
    joined = pairs.join(df_rel, "tok")
    return (
        joined.groupBy("doc")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum((F.col("df") >= min_df).cast("int")).cast("long").alias("n_common_tok"),
        )
        .select(
            "doc", "n_tok", "n_common_tok",
            F.expr("(n_common_tok * 1000) div n_tok").alias("common_permille"),
        )
    )


# Mojibake: UTF-8 bytes re-decoded as Latin-1/cp1252 leave a fingerprint —
# every 2-byte UTF-8 sequence becomes 'Ã'/'Â' + trailer, every 3-byte
# punctuation sequence becomes 'â€' + trailer. Counting those three lead
# sequences (with any following char) catches the corruption regardless of
# which original characters were mangled. '.' spans any codepoint on both
# RE2 (DuckDB) and Java regex (Spark); matches are non-overlapping
# left-to-right on both, so counts are cross-engine exact.
MOJIBAKE_PATTERN = "(Ã.|Â.|â€.)"


def mojibake_hits(text: Column) -> Column:
    """Count of mojibake lead sequences in the text — pure codegen."""
    return F.regexp_count(text, F.lit(MOJIBAKE_PATTERN)).cast("long")


def mojibake_census(docs, host_col: str = "host", text_col: str = "text"):
    """(host, n_docs, n_suspect, hits_total) — double-encoding QA rollup.

    A host whose docs consistently carry mojibake was crawled with the
    wrong charset (or its origin double-encodes): route it back through
    charset re-detection (E2) rather than shipping corrupted text to
    training. One partial-agg shuffle on host; the hit count is a
    projection fused into the scan.
    """
    h = mojibake_hits(F.col(text_col))
    return (
        docs.select(F.col(host_col).alias("host"), h.alias("hits"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("hits") > 0).cast("int")).cast("long").alias(
                "n_suspect"
            ),
            F.sum("hits").cast("long").alias("hits_total"),
        )
    )


# ------------------------------------------------- wordlist blocklisting

import re as _re


def blocklist_hits(text: Column, terms: tuple[str, ...]) -> Column:
    """Whole-word, case-insensitive hit count of ``terms`` in ``text`` —
    the C4 "bad words" filter primitive (Raffel et al. 2020 drop any doc
    containing a listed word; RefinedWeb keeps the same shape). The term
    list is compiled into ONE alternation regex in the plan (pure
    codegen, no broadcast, no Python): ``\\b(t1|t2|...)\\b`` over the
    lowercased text. ``\\b`` and non-capturing alternation behave
    identically in Java regex and RE2, so the DuckDB oracle twin counts
    the same matches. Terms are regex-escaped; the deploy seam is the
    caller's list — the repo ships NO embedded vocabulary (lists are
    deployment policy, not engine code).
    """
    if not terms:
        return F.lit(0).cast("long")
    alt = "|".join(_re.escape(t.lower()) for t in sorted(terms))
    return F.regexp_count(F.lower(text), F.lit(rf"\b(?:{alt})\b")).cast("long")


def host_blocked(url: Column, domains: tuple[str, ...]) -> Column:
    """TRUE when the url's host equals, or is a subdomain of, any entry
    in ``domains`` (the RefinedWeb URL-blocklist arm). Same literal-
    suffix-array discipline as functions/psl.py: the list compiles into
    the plan as equality/endswith terms — no join, no Python. At deploy
    scale (the public ~4.6M-domain UT1 list) swap this for a broadcast
    semi-join on registrable domain; the seam is this function.
    """
    host = F.lower(F.regexp_extract(url, r"^https?://([^/?#]+)", 1))
    host = F.regexp_replace(host, r":\d+$", "")
    cond = F.lit(False)
    for d in sorted(domains):
        dl = d.lower()
        cond = cond | (host == dl) | host.endswith("." + dl)
    return cond


def blocklist_census(
    docs,
    terms: tuple[str, ...],
    domains: tuple[str, ...],
    id_col: str = "doc_id",
    url_col: str = "url",
    text_col: str = "text",
):
    """Per-doc blocklist verdict: (id, term_hits, url_blocked, keep)
    where keep = zero term hits AND unblocked host — the C4 drop policy.
    One pure-codegen projection; the downstream filter is a pushed
    predicate, so at 10^12 docs the dropped rows never leave the scan
    stage of whatever consumes this.
    """
    return docs.select(
        id_col,
        blocklist_hits(F.col(text_col), terms).alias("term_hits"),
        host_blocked(F.col(url_col), domains).alias("url_blocked"),
        (
            (blocklist_hits(F.col(text_col), terms) == 0)
            & ~host_blocked(F.col(url_col), domains)
        ).alias("keep"),
    )


# --------------------------------------------------- Unicode script profile

# Explicit code-point ranges, NOT \p{Script} classes: Java regex spells
# them \p{IsCyrillic} while RE2 uses \p{Cyrillic}, but raw ranges mean
# the same thing in both engines — the portable-dialect discipline.
# Han covers CJK ideographs; Kana and Hangul get their own rows because
# the ja/ko split is exactly what a mixture sampler needs.
SCRIPT_RANGES = (
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿݐ-ݿ"),
    ("hebrew", "֐-׿"),
    ("devanagari", "ऀ-ॿ"),
    ("han", "一-鿿㐀-䶿"),
    ("kana", "぀-ゟ゠-ヿ"),
    ("hangul", "가-힯ᄀ-ᇿ"),
)
SCRIPT_ORDER = tuple(name for name, _ in SCRIPT_RANGES)


def script_counts(text: Column) -> dict:
    """Per-script character counts via the global-regexp_replace length
    difference (same trick as punct_chars — one codegen expression per
    script, no explode, no Python)."""
    return {
        name: (
            F.length(text)
            - F.length(F.regexp_replace(text, f"[{rng}]", ""))
        ).cast("long")
        for name, rng in SCRIPT_RANGES
    }


def script_census(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc writing-system census: (id, n_<script>..., scripted_chars,
    dominant_script, dominant_permille) — the structural signal lang_id
    (E-family stopword markers, Latin-alphabet only) cannot give: it
    separates ru/el/ar/he/hi/zh/ja/ko text and catches mixed-script spam
    (Latin prose stuffed with Han SEO tokens). dominant_permille is the
    winner's share of SCRIPTED chars (integer div, bit-exact vs the SQL
    twin; 0 with dominant 'none' when nothing scripted). Two stacked
    projections that Catalyst collapses into the scan stage — no
    shuffle, no Python; thresholds compose with mixture_keep and the
    curation keep rule.
    """
    text = F.col(text_col)
    counts = script_counts(text)
    base = docs.select(
        F.col(id_col),
        *[counts[n].alias(f"n_{n}") for n in SCRIPT_ORDER],
    )
    total = F.col(f"n_{SCRIPT_ORDER[0]}")
    for name in SCRIPT_ORDER[1:]:
        total = total + F.col(f"n_{name}")
    best = F.greatest(*[F.col(f"n_{n}") for n in SCRIPT_ORDER])
    dom = F.lit("none")
    for name in reversed(SCRIPT_ORDER):
        dom = F.when(
            (F.col(f"n_{name}") == best) & (best > 0), F.lit(name)
        ).otherwise(dom)
    names = ", ".join(f"n_{n}" for n in SCRIPT_ORDER)
    permille = F.expr(
        f"CASE WHEN {' + '.join(f'n_{n}' for n in SCRIPT_ORDER)} > 0 "
        f"THEN (greatest({names}) * 1000) div "
        f"({' + '.join(f'n_{n}' for n in SCRIPT_ORDER)}) ELSE 0 END"
    )
    return base.select(
        "*",
        total.cast("long").alias("scripted_chars"),
        dom.alias("dominant_script"),
        permille.cast("long").alias("dominant_permille"),
    )


def sliding_passages(
    df,
    chunk: int = 64,
    stride: int = 48,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """Fixed-token sliding windows with overlap — the passage shape
    retrieval/embedding pipelines index (chunk_sentences is the
    sentence-aligned, non-overlapping converse). Chunk k covers tokens
    [k*stride, k*stride + chunk); the last window clamps at the document
    end; every token belongs to >= 1 window by construction when
    stride <= chunk. Pure codegen: words split -> sequence + explode ->
    slice + array_join; no shuffle at all — the explode fans out inside
    the scan projection, so at 10^12 docs this is embarrassingly parallel
    and the output inherits the input partitioning.

    -> (doc, chunk_id, start_tok, n_tokens, passage).
    """
    if stride <= 0 or chunk <= 0 or stride > chunk:
        raise ValueError("need 0 < stride <= chunk")
    base = (
        df.select(
            F.col(doc_col).alias("doc"), words(F.col(text_col)).alias("ws")
        )
        .withColumn("n", F.size(F.col("ws")))
        .where(F.col("n") > 0)
    )
    last_k = F.expr(
        f"CASE WHEN n <= {chunk} THEN 0 "
        f"ELSE (n - {chunk} + {stride} - 1) div {stride} END"
    )
    return (
        base.withColumn("k", F.explode(F.sequence(F.lit(0), last_k)))
        .select(
            "doc",
            F.col("k").cast("long").alias("chunk_id"),
            (F.col("k") * stride).cast("long").alias("start_tok"),
            F.expr(f"slice(ws, k * {stride} + 1, {chunk})").alias("toks"),
        )
        .select(
            "doc",
            "chunk_id",
            "start_tok",
            F.size(F.col("toks")).cast("long").alias("n_tokens"),
            F.array_join(F.col("toks"), " ").alias("passage"),
        )
    )


# ---------------------------------------------------- filter cascade

# Stopword probe set for the cascade's lexical-sanity rule (wider than
# LANG_MARKERS["en"]: function words the contract corpus actually emits,
# so the rule discriminates instead of failing everything).
CASCADE_STOPWORDS = ("a", "the", "and", "of", "to", "in", "is")


def cascade_verdict(
    text: Column,
    min_tokens: int = 20,
    max_tokens: int = 80,
    mwl_low_x10: int = 40,
    mwl_high_x10: int = 52,
    rep_pct: int = 60,
    stopwords: tuple = CASCADE_STOPWORDS,
) -> Column:
    """Sequenced keep/drop verdict with first-failing-reason attribution —
    the C4/Gopher/RefinedWeb rule-cascade shape (Raffel et al. 2020 §2.2;
    Rae et al. 2021 appendix A): cheap lexical gates applied in a fixed
    order, emitting WHY a document was dropped, not just that it was.
    Reason attribution is what makes corpus filtering auditable (per-rule
    removal censuses, threshold tuning) — the Dolma/RefinedWeb 'attributes'
    pattern.

    Rules, in order (first failure wins):
      too_short / too_long   — token-count band
      word_len_low/_high     — mean word length outside
                               [mwl_low_x10, mwl_high_x10]/10, compared by
                               integer cross-multiplication (letters*10 vs
                               n*bound — no division, exact)
      repetitive             — duplicate-token fraction > rep_pct/100,
                               again cross-multiplied: 100*(n-distinct) >
                               rep_pct*n
      no_stopwords           — zero hits from ``stopwords`` (the Gopher
                               'must contain 2 of 5 stop words'
                               lexical-sanity gate, zero-threshold form).
                               The set is LANGUAGE POLICY: pass an empty
                               tuple to disable the rule on corpora that
                               are not natural text in the list's language
                               (a non-English corpus would fail wholesale)
      keep                   — survived everything

    One narrow JVM projection per row: split once, a handful of integer
    comparisons — no explode, no shuffle, no Python. The word-character
    count derives from the single-spaced contract text as
    len(trim(text)) - (n-1), avoiding a per-word aggregate.
    """
    w = words(text)
    n = F.size(w).cast("long")
    d = F.size(F.array_distinct(w)).cast("long")
    letters = F.length(F.trim(text)).cast("long") - (n - F.lit(1))
    verdict = (
        F.when(n < min_tokens, F.lit("too_short"))
        .when(n > max_tokens, F.lit("too_long"))
        .when(letters * 10 < n * mwl_low_x10, F.lit("word_len_low"))
        .when(letters * 10 > n * mwl_high_x10, F.lit("word_len_high"))
        .when((n - d) * 100 > n * rep_pct, F.lit("repetitive"))
    )
    if stopwords:
        verdict = verdict.when(
            stopword_hits(text, stopwords) == 0, F.lit("no_stopwords")
        )
    return verdict.otherwise(F.lit("keep"))


# ------------------------------------------------ winnowing (MOSS)


def winnow_fingerprints(text: Column, k: int = 4, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word k-gram, slide a
    w-hash window, keep the MINIMUM of each window (rightmost on ties).
    Guarantees: any shared run of at least w+k-1 words between two
    documents shares at least one selected fingerprint, at an expected
    density of 2/(w+1) — positional, unlike the single global-min
    ``fingerprint()``, so matches localize to spans.

    Returns array<struct<pos:int, h:bigint>> (1-based gram position).
    Pure array expressions — slice/min/reverse/position per window inside
    ONE projection; documents shorter than k+w-1 words yield an empty
    array. No shuffle, no Python; only the downstream census aggregates.
    """
    grams = word_shingles(text, k)
    hs = F.transform(grams, lambda g: phash(g))
    n = F.size(hs)

    def sel(i):
        win = F.slice(hs, i, w)
        m = F.array_min(win)
        # rightmost occurrence of the min inside the window, absolute pos
        return i - 1 + (F.lit(w + 1) - F.array_position(F.reverse(win), m)).cast("int")

    # adjacent windows usually re-select the same position — dedupe on the
    # position alone (same pos => same hash), which keeps the distinct over
    # a plain int array (struct-list distinct is uneven across engines)
    pos_d = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n - F.lit(w - 1)), sel)
    )
    fps = F.transform(
        pos_d,
        lambda p: F.struct(p.alias("pos"), F.element_at(hs, p).alias("h")),
    )
    return F.when(n >= w, fps).otherwise(
        F.array().cast("array<struct<pos:int,h:bigint>>")
    )


def section_passages(
    extracted,
    chunk: int = 64,
    stride: int = 48,
    id_col: str = "url",
    text_col: str = "extracted_text",
    spans_col: str = "spans",
):
    """Section-aware passage windows over the EXTRACTED table — the
    composition of the span relation (E10: every kept block carries its
    tag) with ``sliding_passages``: heading blocks (tag h1-h6) open a new
    section, each section's body re-chunks independently, and every
    passage carries (section_idx, section_title). This is what a RAG /
    embedding indexer wants instead of flat windows: passages never bleed
    across a section boundary and arrive pre-labeled with their heading.

    -> (url, section_idx, section_title, chunk_id, start_tok, n_tokens,
    passage). Text before the first heading is section 0 with NULL title;
    documents whose headings were all stripped as boilerplate degrade to
    exactly the flat chunking (one section, NULL title).

    Shape: explode of spans inside the scan, one id-keyed window pass
    (running heading count + last-heading title), one partial-agg
    reassembly per section (order restored by array_sort over struct
    (span start, text) — collect_list alone is partition-order-
    dependent), then the shuffle-free sliding window. At 10^12 docs the
    two id-keyed exchanges are the cost; the fan-out stays in the scan."""
    from pyspark.sql import Window

    sep = "\x1f"  # unit separator: cannot appear in a url or block text
    sp = extracted.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.explode(spans_col).alias("s"),
    ).select(
        "__id",
        "__t",
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.kind").rlike("^h[1-6]$").alias("is_heading"),
    )
    w = (
        Window.partitionBy("__id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = F.expr("substring(__t, start + 1, end - start)")
    sp = sp.withColumn(
        "section_idx", F.sum(F.col("is_heading").cast("long")).over(w)
    ).withColumn(
        "section_title",
        F.last(F.when(F.col("is_heading"), seg), ignorenulls=True).over(w),
    )
    body = (
        sp.where(~F.col("is_heading"))
        .groupBy("__id", "section_idx", "section_title")
        .agg(
            # blocks join with a single space (words() tokenizes on ' ',
            # so a newline joiner would weld two block-boundary words into
            # one token)
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("start"), seg.alias("t")))
                    ),
                    lambda x: x["t"],
                ),
                " ",
            ).alias("text")
        )
        .withColumn(
            "__k",
            F.concat(
                F.col("__id"),
                F.lit(sep),
                F.col("section_idx").cast("string"),
                F.lit(sep),
                F.coalesce(F.col("section_title"), F.lit("")),
            ),
        )
    )
    out = sliding_passages(
        body, chunk=chunk, stride=stride, doc_col="__k", text_col="text"
    )
    parts = F.split(F.col("doc"), sep, 3)
    return out.select(
        parts.getItem(0).alias(id_col),
        parts.getItem(1).cast("long").alias("section_idx"),
        F.when(parts.getItem(2) != "", parts.getItem(2)).alias("section_title"),
        "chunk_id",
        "start_tok",
        "n_tokens",
        "passage",
    )
