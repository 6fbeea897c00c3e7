"""Deduplication operators for large-scale training-data pipelines.

Four families, all pure DataFrame programs (JVM-side, no Python UDFs):

  * exact        — hash-groupBy on a content digest (md5).
  * n-gram Jaccard — word-shingle explode → self-equi-join on shingle →
                   pairwise Jaccard. Exact but quadratic in collisions; a
                   stopgap frequent-shingle cap keeps the join bounded.
  * MinHash+LSH  — P permutations of a portable 32-bit hash, banded into
                   (P/r) LSH bands; candidate pairs share ≥1 band. This is
                   the 10^12-scale path: cost is linear in Σ|shingles| and
                   the band join only shuffles (band, signature) keys.
  * SimHash      — 32-bit sign-aggregated fingerprint; near-dup = Hamming
                   distance ≤ k over candidate pairs.

The hash is the portable construction shared with the DuckDB oracle
(queries.base.phash), so every step is cross-checkable against ANSI SQL.
At cluster scale swap phash for ``F.xxhash64`` (same plan shape, faster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from corsearch_project_spark.functions.portable import phash

DEFAULT_PERMS = 12
DEFAULT_BAND_ROWS = 3
MAX_SHINGLE_DF = 50  # drop shingles present in more docs (stopword-grams)


def words(text: Column) -> Column:
    """Single-space word split (the driver corpus is single-spaced; using
    plain split keeps DuckDB `string_split` byte-compatible)."""
    return F.split(F.trim(text), " ")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-grams ('w1 w2 w3'); empty array below n words.

    Built from n shifted slices folded with zip_with rather than an
    element_at lambda: Catalyst inlines the underlying split() into every
    lambda call, so the element_at form re-splits the text per gram
    (O(grams × words) — measured 10× slower); the slice form splits O(n)
    times per row."""
    w = words(text)
    size = F.size(w)
    m = size - F.lit(n - 1)  # gram count
    grams = F.slice(w, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(w, j + 1, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) exploded — the input relation for both the Jaccard
    self-join and MinHash. Jaccard needs ``distinct=True`` (set semantics).
    MinHash callers pass ``distinct=False``: min() is invariant under
    duplicates, so skipping the distinct removes an entire shuffle+dedup
    pass — map-side partial min absorbs the multiset for free."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), word_shingles(F.col(text_col), n).alias("sh")
    ).select("doc_id", F.explode("sh").alias("shingle"))
    return sh.distinct() if distinct else sh


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5(content) groups with canonical (min) id."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col).cast("binary")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _rare_shingles(sh: DataFrame, max_df: int = MAX_SHINGLE_DF) -> DataFrame:
    """Drop ultra-frequent shingles (present in > max_df docs): they carry
    no dedup signal and quadratically inflate the self-join — the standard
    document-frequency cap used before pairwise LSH verification."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return sh.join(freq.where(F.col("df") <= max_df), "shingle", "inner").select(
        "doc_id", "shingle"
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard ≥ τ).

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — all-integer until the one final
    double division, so cross-engine exact."""
    sh = _rare_shingles(doc_shingles(df, id_col, text_col, n), max_df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


# Affine-permutation constants: mh_i = min((A[i]*h + B[i]) % MINHASH_P) over
# shingle hashes h. One base hash per shingle, P cheap arithmetic perms —
# at 10^12 docs the signature costs exactly one groupBy(doc_id) shuffle.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime); A*h < 2^45 ≪ 2^63
PERM_A = (3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41)
PERM_B = (
    101, 2029, 30011, 40009, 50021, 60013,
    70001, 80021, 90001, 100003, 110017, 120011,
)


def _perm_expr(i: int) -> Column:
    return (F.lit(PERM_A[i]) * F.col("h") + F.lit(PERM_B[i])) % F.lit(MINHASH_P)


def minhash_sig(sh: DataFrame, perms: int = DEFAULT_PERMS) -> DataFrame:
    """(doc_id, mh0..mh{P-1}): wide MinHash signature in ONE aggregation —
    hash each shingle once (phash), derive every permutation arithmetically,
    take P mins in the same groupBy. No explode, one shuffle on doc_id."""
    hashed = sh.select("doc_id", phash(F.col("shingle")).alias("h"))
    return hashed.groupBy("doc_id").agg(
        *[F.min(_perm_expr(i)).alias(f"mh{i}") for i in range(perms)]
    )


def signatures_for(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "extracted_text",
    n: int = 3,
    perms: int = DEFAULT_PERMS,
) -> DataFrame:
    """The ONE definition of "this corpus's MinHash signature relation" —
    (doc_id, mh0..mh{P-1}) with the pipeline's shingle parameters. Both
    the batch curation job (which persists it to <out>/signatures) and the
    increment job (which bands new docs against that store) MUST build
    signatures through here: the incremental == batch invariant
    (store(prior) ∪ sig(inc) == sig(prior ∪ inc)) holds only while every
    producer agrees on (n, perms, distinct=False)."""
    return minhash_sig(
        doc_shingles(
            df.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            ),
            "doc_id", "text", n, distinct=False,
        ),
        perms,
    )


def banded_sig(
    sig: DataFrame, perms: int = DEFAULT_PERMS, band_rows: int = DEFAULT_BAND_ROWS
) -> DataFrame:
    """(doc_id, band, sig): the signature stacked into P/r LSH bands — the
    join key relation both the self-join (``lsh_candidate_pairs``) and the
    increment-vs-prior cross join (``lsh_cross_candidate_pairs``) bucket
    on."""
    n_bands = perms // band_rows
    stack_args = []
    for b in range(n_bands):
        cols = [f"mh{b * band_rows + j}" for j in range(band_rows)]
        stack_args.append(f"{b}, concat_ws(',', {', '.join(cols)})")
    return sig.selectExpr(
        "doc_id", f"stack({n_bands}, {', '.join(stack_args)}) AS (band, sig)"
    )


def lsh_candidate_pairs(
    sig: DataFrame, perms: int = DEFAULT_PERMS, band_rows: int = DEFAULT_BAND_ROWS
) -> DataFrame:
    """Stack the signature into (P/r) bands, equi-join docs sharing any
    (band, band-signature) bucket → distinct candidate pairs. At scale this
    is the only pairwise step and it only shuffles (band, sig) keys."""
    banded = banded_sig(sig, perms, band_rows)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_cross_candidate_pairs(
    sig_new: DataFrame,
    sig_prior: DataFrame,
    perms: int = DEFAULT_PERMS,
    band_rows: int = DEFAULT_BAND_ROWS,
) -> DataFrame:
    """(doc_a=new, doc_b=prior) candidate pairs between a NEW signature
    relation and a PRIOR (persisted) one — the incremental-dedup join: the
    increment's docs bucket against the existing corpus's banded
    signatures without any rescan of prior text. Same (band, sig) equi-key
    as the self-join; no ordering constraint because the two sides are
    disjoint id spaces by contract (same id on both sides = same url
    re-crawled, which the caller excludes upstream)."""
    a = banded_sig(sig_new, perms, band_rows).alias("a")
    b = banded_sig(sig_prior, perms, band_rows).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def est_jaccard_pairs(
    cands: DataFrame,
    sig_a: DataFrame,
    sig_b: DataFrame,
    perms: int = DEFAULT_PERMS,
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard): score candidate pairs by signature
    agreement — matching-component fraction, each side's wide signature
    joined once (no per-perm join). ``sig_b`` may be the same relation as
    ``sig_a`` (self-join scoring) or a persisted prior store."""
    sa = sig_a.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(perms)],
    )
    sb = sig_b.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(perms)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(perms)
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / F.lit(float(perms))).alias("est_jaccard"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    perms: int = DEFAULT_PERMS,
    band_rows: int = DEFAULT_BAND_ROWS,
) -> DataFrame:
    """Full MinHash+LSH dedup: candidates from banding, then the estimated
    similarity = fraction of matching signature components (computed from
    the wide signatures joined once per side — no per-perm join)."""
    sh = doc_shingles(df, id_col, text_col, n, distinct=False)
    # The signature relation feeds four join sides below; persist it so the
    # shingle explode + hash + groupBy run once (at cluster scale this is a
    # materialized signatures table — the standard MinHash pipeline shape,
    # and exactly what run_curation writes to <out>/signatures so
    # curate_increment can band against it without rescanning prior text).
    sig = minhash_sig(sh, perms).persist()
    cands = lsh_candidate_pairs(sig, perms, band_rows)
    return est_jaccard_pairs(cands, sig, sig, perms)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(doc_id, simhash): sign-aggregated 32-bit fingerprint over distinct
    word hashes. All bit arithmetic is SQL-expression-level so the DuckDB
    oracle can replay it exactly.

    The per-bit sign sums are ``bits`` branch-free bit-count aggregates in
    ONE groupBy(doc_id) — not an explode over bit positions, which would
    inflate the word relation ×bits before the shuffle (measured 4× slower
    end-to-end at sf0.1; at 10^12 docs the explode is a non-starter). The
    classic ±1 sign sum s_b is recovered as s_b = 2·cnt_b − n, so the sign
    test s_b > 0 becomes 2·cnt_b > n (identical fingerprints, ~3× cheaper
    per-row aggregation: one shift+mask instead of a CASE branch)."""
    w = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(words(F.col(text_col))).alias("word"))
        .distinct()
        .withColumn("wh", phash(F.col("word")))
    )
    sums = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nw"),
        *[F.sum(F.expr(f"shiftright(wh, {b}) & 1")).alias(f"c{b}") for b in range(bits)],
    )
    fingerprint = sum(
        F.expr(
            f"CASE WHEN 2*c{b} > nw THEN shiftleft(CAST(1 AS BIGINT), {b}) ELSE CAST(0 AS BIGINT) END"
        )
        for b in range(bits)
    )
    return sums.select("doc_id", fingerprint.alias("simhash"))


def simhash_candidates(
    sims: DataFrame, max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Pigeonhole chunk banding: split the fingerprint into (max_hamming+1)
    equal bit-chunks; any pair within Hamming ≤ max_hamming must agree on at
    least one chunk exactly, so an equi-join on (chunk_idx, chunk_value)
    finds every true pair — no recall loss, and the only pairwise work is
    within exact-match buckets (same plan shape as lsh_candidate_pairs)."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    assert chunk_bits * n_chunks == bits, "bits must divide into max_hamming+1 chunks"
    mask = (1 << chunk_bits) - 1
    stack_args = ", ".join(
        f"{i}, (shiftright(simhash, {i * chunk_bits}) & {mask})" for i in range(n_chunks)
    )
    banded = sims.selectExpr(
        "doc_id", "simhash", f"stack({n_chunks}, {stack_args}) AS (chunk, cv)"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )


def simhash_pairs(
    sims: DataFrame, max_hamming: int = 3, bits: int = 32, exact_plan: bool = False
) -> DataFrame:
    """Near-dup pairs by Hamming distance over simhashes — identical output
    from two plans: the default pigeonhole-banded equi-join (linear shuffle,
    the 10^12-doc path), or ``exact_plan=True`` for the O(n²) cross-compare
    used as the property-test control arm."""
    if exact_plan:
        a = sims.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
        b = sims.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
        cands = a.join(b, F.col("doc_a") < F.col("doc_b"))
    else:
        cands = simhash_candidates(sims, max_hamming, bits)
    return (
        cands.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, component) for every vertex in the pair relation, where
    component = min doc_id reachable through the near-dup graph — the
    canonical-document grouping step after candidate generation.

    Iterative min-label propagation WITH pointer-jump shortcutting: each
    round every vertex takes the min of (its own label, its neighbors'
    labels, the label OF its label). The shortcut join halves the distance
    to the component min each round, so convergence is O(log diameter)
    rounds — a 10^6-hop near-dup chain converges in ~20 rounds where plain
    propagation needs 10^6 (the same doubling trick that makes
    large-star/small-star O(log n); near-dup components are usually dense
    cliques that finish in 2-3 rounds either way). Each round is two
    equi-joins + one partial-aggregating groupBy, one materialization, with
    checkpointing to truncate lineage growth across iterations.

    Checkpoint seam: with ``checkpoint_dir`` set, per-round materialization
    uses reliable ``checkpoint()`` against that directory — the cluster
    setting, where an executor loss after lineage truncation must be
    recoverable from stable storage. Default (None) is executor-local
    ``localCheckpoint()``: faster, correct on local[N], NOT fault-tolerant.

    Convergence is REQUIRED: a component whose log-diameter exceeds
    ``max_iter`` would exit with wrong labels. Exhausting ``max_iter``
    without a fixed point raises rather than silently returning unconverged
    components (which would make the downstream keep-filter drop/keep the
    wrong documents). With shortcutting the default budget of 20 rounds
    covers diameters up to ~2^20 — far beyond any real dedup graph."""
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _materialize(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def _materialize(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # Materialize the edge relation ONCE: every iteration joins against it,
    # and without this each round would recompute the pairs' full upstream
    # plan (e.g. the entire MinHash pipeline) from scratch.
    edges = _materialize(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("doc_id")).distinct().withColumn(
        "component", F.col("doc_id")
    )
    changed = 1
    for rnd in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.src, "left"
        ).select(
            "doc_id",
            F.col("component").alias("_old"),
            F.least(
                labels["component"],
                F.coalesce(F.col("nbr_min"), labels["component"]),
            ).alias("_c1"),
        )
        if rnd == 0:
            # Round 1: every label is still its own id, so the parent lookup
            # is the identity — skip the shortcut join entirely.
            jumped = stepped.select(
                "doc_id", "_old", F.col("_c1").alias("_c2")
            )
        else:
            # Pointer-jump shortcut: look up the label OF the candidate
            # label (every label value is itself a vertex id, so the join
            # is total). This halves each vertex's distance to the
            # component min per round — O(log diameter) total rounds
            # instead of O(diameter).
            parent = labels.select(
                F.col("doc_id").alias("_pid"), F.col("component").alias("_pcomp")
            )
            jumped = stepped.join(
                parent, stepped["_c1"] == parent["_pid"], "left"
            ).select(
                "doc_id",
                "_old",
                F.least(
                    F.col("_c1"), F.coalesce(F.col("_pcomp"), F.col("_c1"))
                ).alias("_c2"),
            )
        # ONE materialization per round: the checkpointed relation carries
        # both the new label and a changed flag, so convergence detection is
        # a near-free scan of checkpointed data instead of a diff join
        # against the previous labels (halves the Spark jobs per round).
        updated = _materialize(
            jumped.select(
                "doc_id",
                F.col("_c2").alias("component"),
                (F.col("_c2") < F.col("_old")).alias("_chg"),
            )
        )
        changed = updated.where(F.col("_chg")).limit(1).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (component diameter exceeds the round budget); raise "
            "max_iter — returning unconverged labels would be silently wrong"
        )
    return labels


def substring_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Exact-substring duplication stats (Lee et al. 2022, 'Deduplicating
    Training Data Makes Language Models Better'): a token span is
    duplicated if the ``window``-word shingle starting there appears in
    >= 2 DISTINCT documents. Returns per-doc
    (id, n_tokens, dup_tokens, dup_fraction) where dup_tokens is the size
    of the UNION of all matched [pos, pos+window) intervals — overlapping
    matches are not double-counted.

    The reference construction is a corpus-wide suffix array; the
    distributed re-expression is shingle-join: posexplode the
    ``window``-grams with positions, count distinct docs per gram
    (partial-agg shuffle; the hash, not the string, is the shuffle key),
    semi-join each doc's grams against the shared set, then compute the
    interval-union length with one running-max window per doc
    (contribution = (p+w) - max(p, max_prev_end), clamped at 0). Three
    linear shuffles total, no self-join, no all-pairs; viral shingles
    (boilerplate) are the AQE skew-join case. Within-doc repetition alone
    does NOT count (that is q_text_repetition's job) — this operator
    targets cross-document contamination.
    """
    from pyspark.sql import Window

    toks = words(F.col(text_col))
    base = df.select(id_col, F.size(toks).cast("long").alias("n_tokens"))
    grams = df.select(
        id_col,
        F.posexplode(word_shingles(F.col(text_col), window)).alias(
            "pos", "gram"
        ),
    ).select(id_col, "pos", phash(F.col("gram")).alias("g"))
    shared = (
        grams.groupBy("g")
        .agg(F.countDistinct(id_col).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    matched = grams.join(shared, "g", "left_semi")
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + window).over(w_prev)
    contrib = F.greatest(
        F.lit(0),
        (F.col("pos") + window)
        - F.greatest(F.col("pos"), F.coalesce(prev_end, F.col("pos"))),
    )
    per_doc = (
        matched.select(id_col, contrib.alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").cast("long").alias("dup_tokens"))
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_fraction"),
    )


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    min_shared: int = 3,
    max_hosts_per_digest: int = 8,
) -> DataFrame:
    """Mirror-host detection (Bharat & Broder WWW'99 shape): host pairs
    that serve many byte-identical documents are the same site behind
    two names — crawl one, skip the other, and collapse both out of the
    training corpus before per-domain caps are applied (a mirrored site
    otherwise gets 2x its cap).

    -> (host_a, host_b, n_shared, overlap_permille), host_a < host_b,
    n_shared >= min_shared. overlap_permille = shared digests * 1000 /
    the SMALLER host's distinct-digest count (containment, not Jaccard:
    a small mirror of a big site must still score ~1000).

    Plan: one partial-agg distinct on (host, digest); per-digest host
    counts ride the same keying, and digests on > max_hosts_per_digest
    hosts are dropped BEFORE pairing — those are vendor default pages /
    parked-domain shells whose pair fan-out is quadratic in host count
    and which say nothing about mirroring (same cap discipline as the
    LSH band caps). The self-join then fans out at most C(cap, 2) pairs
    per digest — linear shuffle volume end-to-end — and the pair census
    is one (host_a, host_b) partial agg. Per-host sizes broadcast back
    onto the pair relation (#qualifying host pairs << corpus).
    Integer permille keeps the oracle twin bit-exact across engines.
    """
    from pyspark.sql import Window

    hd = docs.select(
        F.col(host_col).alias("host"), F.col(digest_col).alias("digest")
    ).distinct()
    hd = hd.withColumn(
        "n_hosts", F.count(F.lit(1)).over(Window.partitionBy("digest"))
    ).where(F.col("n_hosts") <= max_hosts_per_digest).drop("n_hosts")
    sizes = hd.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_digests")
    )
    a, b = hd.alias("a"), hd.alias("b")
    pairs = (
        a.join(b, "digest")
        .where(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    sa = F.broadcast(sizes.withColumnRenamed("n_digests", "na"))
    sb = F.broadcast(
        sizes.select(
            F.col("host").alias("host_b"), F.col("n_digests").alias("nb")
        )
    )
    return (
        pairs.join(sa, pairs["host_a"] == sa["host"])
        .drop("host")
        .join(sb, "host_b")
        .select(
            "host_a",
            "host_b",
            "n_shared",
            F.expr("(n_shared * 1000) div least(na, nb)")
            .cast("long")
            .alias("overlap_permille"),
        )
    )


# ------------------------------------- content-defined chunking (CDC)


def cdc_chunk_texts(text: Column, divisor: int = 16) -> Column:
    """Split a document's word sequence into content-defined chunks — the
    LBFS/rsync boundary trick (Muthitacharoen et al., SOSP 2001) at word
    granularity: a word whose portable hash ≡ 0 (mod divisor) CLOSES the
    current chunk. Boundaries depend only on local content, so an edit
    changes the chunk containing it (and at most its neighbor) while every
    other chunk in the document keeps its exact text — the shift
    resistance fixed-width shingles lack, at O(n/divisor) chunks instead
    of O(n) overlapping grams.

    Entirely array expressions inside one projection — boundary positions
    via filter over a position sequence, chunk k = slice between
    consecutive boundaries — so chunking itself is shuffle-free and
    Python-free; only the downstream census shuffles.
    """
    w = words(text)
    n = F.size(w)
    bpos = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: phash(F.element_at(w, i)) % divisor == 0,
    )
    # ensure the tail chunk closes at the last word (skip when the last
    # word is itself a boundary — no empty trailing chunk)
    bposx = F.concat(
        bpos,
        F.when(
            (n > 0) & (phash(F.element_at(w, n)) % divisor != 0),
            F.array(n),
        ).otherwise(F.array().cast("array<int>")),
    )
    return F.transform(
        F.sequence(F.lit(1), F.size(bposx)),
        lambda k: F.array_join(
            F.slice(
                w,
                F.when(k == 1, F.lit(0))
                .otherwise(F.element_at(bposx, (k - 1).cast("int")))
                + 1,
                F.element_at(bposx, k.cast("int"))
                - F.when(k == 1, F.lit(0)).otherwise(
                    F.element_at(bposx, (k - 1).cast("int"))
                ),
            ),
            " ",
        ),
    )


def cdc_chunk_relation(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 16,
) -> DataFrame:
    """(id, chunk_idx, h, n_words): the exploded CDC chunk relation —
    the shared front half of cdc_dup_stats and cdc_change_stats.

    STAGED chunking, not the one-Column cdc_chunk_texts form: inside a
    single projection, the word array and its per-word hashes are
    subexpressions that higher-order lambdas re-evaluate PER ELEMENT —
    split+md5 become O(n_words^2) per doc (measured 38 s at sf0.1 for
    work whose linear form costs ~1 s). Materializing __w and __wh as
    real columns across .select stages defeats that: CollapseProject
    never inlines a non-cheap expression referenced more than once, so
    each array computes exactly once per row and every lambda touches
    only element_at over an attribute. Same chunks, byte-identical."""
    w0 = df.select(F.col(id_col), words(F.col(text_col)).alias("__w"))
    w1 = w0.select(
        id_col,
        "__w",
        F.transform("__w", lambda x: phash(x) % divisor).alias("__wh"),
    )
    n = F.size("__w")
    bpos = F.filter(
        F.sequence(F.lit(1), n), lambda i: F.element_at("__wh", i) == 0
    )
    bposx = F.concat(
        bpos,
        F.when(
            (n > 0) & (F.element_at("__wh", n) != 0), F.array(n)
        ).otherwise(F.array().cast("array<int>")),
    )
    w2 = w1.select(id_col, "__w", bposx.alias("__b"))
    chunk_arr = F.transform(
        F.sequence(F.lit(1), F.size("__b")),
        lambda k: F.array_join(
            F.slice(
                F.col("__w"),
                F.when(k == 1, F.lit(0))
                .otherwise(F.element_at("__b", (k - 1).cast("int")))
                + 1,
                F.element_at("__b", k.cast("int"))
                - F.when(k == 1, F.lit(0)).otherwise(
                    F.element_at("__b", (k - 1).cast("int"))
                ),
            ),
            " ",
        ),
    )
    return w2.select(
        F.col(id_col), F.posexplode(chunk_arr).alias("chunk_idx", "chunk_text")
    ).select(
        id_col,
        "chunk_idx",
        phash(F.col("chunk_text")).alias("h"),
        F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("n_words"),
    )


def cdc_change_stats(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    divisor: int = 16,
) -> DataFrame:
    """Graded change fraction between two snapshots of the same documents —
    the magnitude signal the binary digest diff (snapshot_diff) cannot
    give: a one-word edit and a full rewrite are both 'changed' there, but
    recrawl budgeting (Cho & Garcia-Molina change-rate scheduling) wants
    to know HOW MUCH changed.

    Both sides chunk with the shift-resistant CDC boundaries, so an
    insertion near the top perturbs only the chunk containing it; the
    per-url multiset overlap Σ min(c_old, c_new) over chunk hashes then
    credits every untouched chunk. Reported per url (inner join — urls in
    both snapshots; added/removed urls are snapshot_diff's department):

      n_chunks_old / n_chunks_new / common_chunks (multiset min)
      change_permille = 1000 − (2000·common) div (old+new)   (Dice, exact)

    Shape at 10^12 urls: chunking is projection-only; one (url, h)
    partial-agg count per side, one url-keyed equi-join of the two count
    relations, one url rollup — all bucket-prunable on url-bucketed
    tables. Integer math end to end ⇒ exact cross-engine."""
    co = (
        cdc_chunk_relation(old, id_col, text_col, divisor)
        .groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("c_old"))
    )
    cn = (
        cdc_chunk_relation(new, id_col, text_col, divisor)
        .groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("c_new"))
    )
    j = co.join(cn, [id_col, "h"], "full").select(
        id_col,
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    per = j.groupBy(id_col).agg(
        F.sum("c_old").cast("long").alias("n_chunks_old"),
        F.sum("c_new").cast("long").alias("n_chunks_new"),
        F.sum(F.least("c_old", "c_new")).cast("long").alias("common_chunks"),
    )
    # inner-join semantics on urls present in BOTH snapshots: the full
    # outer join above is per (url, h) for the multiset, so filter urls
    # that never appeared on one side
    per = per.where((F.col("n_chunks_old") > 0) & (F.col("n_chunks_new") > 0))
    return per.withColumn(
        "change_permille",
        (
            F.lit(1000)
            - F.expr(
                "(2000 * common_chunks) div (n_chunks_old + n_chunks_new)"
            )
        ).cast("long"),
    )


def cdc_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 16,
) -> DataFrame:
    """Per-doc duplicated-content census over content-defined chunks.

    Explodes each doc's CDC chunks, hashes them, and marks chunks whose
    hash appears in ≥2 distinct docs; per doc reports chunk/word totals
    and the duplicated-word share (integer permille — exact). The same
    relation at 10^12 docs: the chunk-hash census is one partial-agg
    groupBy over ~n_words/divisor rows per doc (vs n_words rows for
    shingle schemes), and the shared-set join is an equi-join on the
    chunk hash.
    """
    chunks = cdc_chunk_relation(df, id_col, text_col, divisor)
    # Materialize ONCE for the two consumers below (census + probe) —
    # localCheckpoint, not persist, so blocks release with the result's
    # lifetime (same discipline as bitext_margin_pairs).
    chunks = chunks.localCheckpoint()
    shared = (
        chunks.groupBy("h")
        .agg(F.countDistinct(id_col).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    flagged = chunks.join(shared.withColumn("dup", F.lit(True)), "h", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("long").alias("dup_chunks"),
            F.sum("n_words").alias("total_words"),
            F.sum(F.when(F.col("dup"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("dup_words"),
        )
        .withColumn(
            "dup_word_permille",
            F.expr("(dup_words * 1000) div greatest(total_words, 1)").cast("long"),
        )
    )
