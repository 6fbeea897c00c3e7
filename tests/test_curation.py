"""End-to-end curation pipeline: extraction output → stats + exact-dup
canonicalization + MinHash-LSH near-dup detection + keep flags. A planted
exact duplicate and a planted near-duplicate must both be caught."""

import os

from pyspark.sql import functions as F

from corsearch_project_spark.fixtures.gen_pages import default_rules, gen_pages, pages_to_pandas
from corsearch_project_spark.plans.extract_pipeline import ExtractConfig, run_extract
from jobs.run_curation import run_curation


def test_curation_end_to_end(spark, tmp_path):
    rows = gen_pages(120, seed=77, dup_frac=0.0)
    inp = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(pages_to_pandas(rows)).write.parquet(inp)
    out = os.path.join(str(tmp_path), "out")
    cfg = ExtractConfig(input_path=inp, output_path=out, run_id="cur", buckets=8)
    run_extract(spark, cfg, default_rules())

    # plant an exact duplicate (same text, different url) and a near-dup
    # (same text with one word changed) directly in the extracted table
    ext = spark.read.parquet(cfg.extracted_path)
    donor = ext.orderBy(F.desc("n_chars")).first()
    near_text = "changedword " + donor["extracted_text"].split(" ", 1)[1]
    extra = spark.createDataFrame(
        [
            ("https://plant.test/exact", donor["extracted_text"], donor["text_sha256"], 3),
            ("https://plant.test/near", near_text, "0" * 64, 4),
        ],
        "url string, extracted_text string, text_sha256 string, url_bucket int",
    )
    merged = ext.select("url", "extracted_text", "text_sha256", "url_bucket").unionByName(extra)
    merged_path = os.path.join(str(tmp_path), "merged")
    merged.write.parquet(merged_path)

    report = run_curation(spark, merged_path, os.path.join(str(tmp_path), "cur"))
    assert report["docs"] == 122
    assert report["exact_dups"] >= 1
    assert report["near_dup_docs"] >= 2  # the near-dup pair (both endpoints)
    assert 0 < report["kept"] < report["docs"]

    cur = spark.read.parquet(report["curated_path"])
    planted = {r["url"]: r for r in cur.where(F.col("url").like("https://plant.test/%")).collect()}
    dup_row = planted["https://plant.test/exact"]
    # one of the sha-identical pair is canonical, the other flagged
    group = cur.where(F.col("text_sha256") == donor["text_sha256"]).collect()
    assert len(group) == 2
    assert sum(1 for r in group if r["is_exact_dup"]) == 1
    # the planted near-dup was caught by LSH against its donor
    assert planted["https://plant.test/near"]["near_dup_degree"] >= 1
    # schema essentials
    for c in ("n_tokens", "quality", "pred_lang", "fingerprint", "keep",
              "model_score", "substring_dup_fraction"):
        assert c in cur.columns


def test_curation_near_dup_component_kills_noncanonical(spark, tmp_path):
    """Of a near-dup cluster, exactly the lexicographic-min url survives the
    keep filter (given quality passes)."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    ).strip()
    rows = [
        ("https://c.test/a", base, "a" * 64, 0),
        ("https://c.test/b", base.replace("alpha", "changed", 1), "b" * 64, 1),
        ("https://c.test/c", base.replace("kappa", "altered", 1), "c" * 64, 2),
        ("https://c.test/unique", "totally different words " + " ".join(f"w{i}" for i in range(60)), "d" * 64, 3),
    ]
    src = os.path.join(str(tmp_path), "ext2")
    spark.createDataFrame(
        rows, "url string, extracted_text string, text_sha256 string, url_bucket int"
    ).write.parquet(src)
    rep = run_curation(spark, src, os.path.join(str(tmp_path), "cur2"))
    cur = {r["url"]: r for r in spark.read.parquet(rep["curated_path"]).collect()}
    cluster = [u for u in cur if cur[u]["near_dup_component"] == "https://c.test/a"]
    assert set(cluster) == {"https://c.test/a", "https://c.test/b", "https://c.test/c"}
    assert cur["https://c.test/a"]["keep"]
    assert not cur["https://c.test/b"]["keep"] and not cur["https://c.test/c"]["keep"]
    assert cur["https://c.test/unique"]["near_dup_component"] is None


def test_curated_split_is_reproducible_and_partitioned(spark, tmp_path):
    """The curated table's split column: pure function of url (same url ->
    same split on rerun), all three classes present at this corpus size,
    proportions within loose bounds of 80/10/10."""
    import os


    rows = gen_pages(120, seed=77, dup_frac=0.0)
    src = str(tmp_path / "p.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pages_to_pandas(rows)), src,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    out = str(tmp_path / "o")
    run_extract(spark, ExtractConfig(input_path=src, output_path=out,
                                     run_id="C", buckets=8))
    cur_out = str(tmp_path / "c")
    run_curation(spark, os.path.join(out, "extracted"), cur_out)
    cur = spark.read.parquet(os.path.join(cur_out, "curated"))
    splits = {r["split"]: r["n"] for r in
              cur.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(splits) == {"train", "valid", "test"}
    total = sum(splits.values())
    assert splits["train"] / total > 0.6  # 80% nominal, loose bound
    # reproducible: second curation run assigns identical splits
    cur_out2 = str(tmp_path / "c2")
    run_curation(spark, os.path.join(out, "extracted"), cur_out2)
    a = {r["url"]: r["split"] for r in cur.select("url", "split").collect()}
    b = {r["url"]: r["split"] for r in
         spark.read.parquet(os.path.join(cur_out2, "curated"))
         .select("url", "split").collect()}
    assert a == b


def test_export_corpus_shards(spark, tmp_path):
    """extract → curate → export closes the loop: only keep=true docs land
    in shards, partitioned by split, with pack bins that respect the token
    budget (each bin's token sum ≤ budget unless a single doc exceeds it)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    from export_corpus import export_corpus

    rows = gen_pages(120, seed=88, dup_frac=0.1)
    src = str(tmp_path / "p.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pages_to_pandas(rows)), src,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    out = str(tmp_path / "o")
    run_extract(spark, ExtractConfig(input_path=src, output_path=out,
                                     run_id="E", buckets=8))
    cur_out = str(tmp_path / "c")
    run_curation(spark, os.path.join(out, "extracted"), cur_out)
    shards = str(tmp_path / "shards")
    rep = export_corpus(spark, os.path.join(out, "extracted"),
                        os.path.join(cur_out, "curated"), shards,
                        pack_budget=256)
    kept = spark.read.parquet(os.path.join(cur_out, "curated")).where("keep")
    assert rep["docs"] == kept.count() > 0
    df = spark.read.parquet(shards)
    # split dirs on disk
    assert any(d.startswith("split=") for d in os.listdir(shards))
    # bin budget: cumsum binning overflows by at most the one straddling
    # doc — per-bin sum ≤ budget + max doc in the bin (exact greedy would
    # need a sequential reset; documented in textstats.pack_bins)
    bins = df.groupBy("split", "url_bucket", "bin_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx"),
        F.count(F.lit(1)).alias("n")).collect()
    for b in bins:
        assert b["tok"] <= 256 + b["mx"], b
    # no dropped doc sneaks in
    dropped = spark.read.parquet(os.path.join(cur_out, "curated")).where("NOT keep")
    joined = df.join(dropped.select("url"), "url", "inner").count()
    assert joined == 0


def test_boilerplate_line_removal_newline_path(spark):
    """remove_boilerplate_lines over real newline-joined text: lines shared
    by >=2 docs drop, document-local repetition survives, order is
    preserved, and a fully-boilerplate doc yields NULL cleaned_text (the
    string_agg-over-zero-rows convention the oracle twin uses)."""
    from corsearch_project_spark.operators.boilerplate import (
        remove_boilerplate_lines,
    )

    rows = [
        (1, "unique alpha\ncookie banner\nunique beta"),
        (2, "cookie banner\nsecond body\nsecond body\nfooter nav"),
        (3, "footer nav\nthird body\ncookie banner"),
        (4, "cookie banner\nfooter nav"),  # nothing survives
        (5, "only line here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert len(got) == 5
    assert (got[1]["n_lines"], got[1]["n_dropped"]) == (3, 1)
    assert got[1]["cleaned_text"] == "unique alpha\nunique beta"
    # doc-local repetition ("second body" twice, one doc) is KEPT
    assert got[2]["cleaned_text"] == "second body\nsecond body"
    assert got[2]["n_dropped"] == 2
    assert got[3]["cleaned_text"] == "third body"
    assert got[4]["cleaned_text"] is None and got[4]["n_dropped"] == 2
    assert got[5]["cleaned_text"] == "only line here" and got[5]["n_dropped"] == 0


def test_boilerplate_segment_words_windows(spark):
    """segment_words: fixed 3-word windows, short tail kept, single-word
    and empty-string edges produce exactly one segment."""
    from corsearch_project_spark.operators.boilerplate import segment_words

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["segs"]
        for r in df.select(
            "doc_id", segment_words(F.col("text"), 3).alias("segs")
        ).collect()
    }
    assert got[1] == ["a b c", "d e f", "g"]
    assert got[2] == ["x"]
    assert got[3] == [""]


def test_curation_blocklist_gate(spark, tmp_path):
    """--blocklist-json drops term-hit docs and blocked hosts from keep
    (columns recorded for audit), and an absent blocklist leaves the
    schema identical with constant-clean columns."""
    rows = gen_pages(40, seed=31, dup_frac=0.0)
    inp = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(pages_to_pandas(rows)).write.parquet(inp)
    out = os.path.join(str(tmp_path), "out")
    cfg = ExtractConfig(input_path=inp, output_path=out, run_id="bl", buckets=4)
    run_extract(spark, cfg, default_rules())

    ext = spark.read.parquet(cfg.extracted_path)
    donor = ext.orderBy(F.desc("n_chars")).first()
    extra = spark.createDataFrame(
        [
            ("https://clean.test/a",
             donor["extracted_text"] + " zorblax appended", "1" * 64, 0),
            ("https://evil.blocked.example/b",
             donor["extracted_text"] + " different tail entirely", "2" * 64, 1),
        ],
        "url string, extracted_text string, text_sha256 string, url_bucket int",
    )
    merged = ext.select(
        "url", "extracted_text", "text_sha256", "url_bucket"
    ).unionByName(extra)
    merged_path = os.path.join(str(tmp_path), "merged")
    merged.write.parquet(merged_path)

    rep = run_curation(
        spark, merged_path, os.path.join(str(tmp_path), "cur"),
        blocklist={"terms": ["zorblax"], "domains": ["blocked.example"]},
    )
    assert rep["blocklist_dropped"] == 2
    cur = spark.read.parquet(rep["curated_path"])
    got = {r["url"]: r for r in cur.where(
        F.col("url").rlike("clean.test|blocked.example")).collect()}
    a = got["https://clean.test/a"]
    assert a["term_hits"] == 1 and not a["url_blocked"] and not a["keep"]
    b = got["https://evil.blocked.example/b"]
    assert b["term_hits"] == 0 and b["url_blocked"] and not b["keep"]

    # no blocklist: same schema, constant-clean verdicts, nothing dropped
    rep2 = run_curation(spark, merged_path, os.path.join(str(tmp_path), "cur2"))
    assert rep2["blocklist_dropped"] == 0
    cur2 = spark.read.parquet(rep2["curated_path"])
    assert cur2.where("term_hits != 0 OR url_blocked").count() == 0
    assert sorted(cur.columns) == sorted(cur2.columns)


def test_export_corpus_bpe_token_budget(spark, tmp_path):
    """--bpe-merges denominates packing in learned subword tokens: the
    merge table ships under <out>/_tokenizer (invisible to shard readers),
    and every shard row's n_tokens equals an independent pure-Python
    segmentation of its text under those merges, applied in merge order."""
    import os
    import re
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    from export_corpus import export_corpus

    rows = gen_pages(80, seed=89, dup_frac=0.1)
    src = str(tmp_path / "p.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pages_to_pandas(rows)), src,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    out = str(tmp_path / "o")
    run_extract(spark, ExtractConfig(input_path=src, output_path=out,
                                     run_id="E", buckets=8))
    cur_out = str(tmp_path / "c")
    run_curation(spark, os.path.join(out, "extracted"), cur_out)
    shards = str(tmp_path / "shards")
    rep = export_corpus(spark, os.path.join(out, "extracted"),
                        os.path.join(cur_out, "curated"), shards,
                        pack_budget=256, bpe_merges=4)
    assert rep["token_unit"] == "bpe"
    assert rep["bpe"]["n_merges"] == 4

    mdf = spark.read.parquet(rep["bpe"]["merges_path"])
    merges = [(r["left"], r["right"]) for r in mdf.orderBy("step").collect()]
    assert [r["step"] for r in mdf.orderBy("step").collect()] == [1, 2, 3, 4]

    # _tokenizer must not leak into the shard read (underscore convention)
    df = spark.read.parquet(shards)
    assert "step" not in df.columns and "merged" not in df.columns

    def py_bpe_count(text):
        # Java-regex \s+ word split (ASCII whitespace, like the engine)
        n = 0
        for w in re.split(r"[ \t\n\x0b\f\r]+", text):
            if not w:
                continue
            syms = list(w) + ["</w>"]
            for a, b in merges:
                o, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        o.append(a + b)
                        i += 2
                    else:
                        o.append(syms[i])
                        i += 1
                syms = o
            n += len(syms)
        return n

    got = {r["url"]: (r["n_tokens"], r["extracted_text"])
           for r in df.select("url", "n_tokens", "extracted_text").collect()}
    assert got
    for url, (n, text) in got.items():
        assert n == py_bpe_count(text), url

    # packing property still holds under the BPE denomination
    bins = df.groupBy("split", "url_bucket", "bin_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx")).collect()
    for b in bins:
        assert b["tok"] <= 256 + b["mx"], b

    # vocab artifact closure: the census's total token mass equals the sum
    # of per-doc n_tokens over the kept corpus (same dict, same merges)
    vocab = spark.read.parquet(rep["bpe"]["vocab_path"])
    census_total = vocab.agg(F.sum("n")).collect()[0][0]
    assert census_total == sum(n for n, _ in got.values())
    assert vocab.where(F.col("token") == "</w>").count() <= 1


def test_export_corpus_markdown_arm(spark, tmp_path):
    """--text-col extracted_md: a --with-markdown table exports the
    markdown serialization under the STABLE shard schema (column stays
    named extracted_text), token budgets count the markdown arm's tokens,
    and the report records which arm shipped."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    from export_corpus import export_corpus

    rows = gen_pages(80, seed=21)
    src = str(tmp_path / "p.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pages_to_pandas(rows)), src,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    out = str(tmp_path / "o")
    run_extract(spark, ExtractConfig(input_path=src, output_path=out,
                                     run_id="E", buckets=8,
                                     with_markdown=True))
    cur_out = str(tmp_path / "c")
    run_curation(spark, os.path.join(out, "extracted"), cur_out)
    shards = str(tmp_path / "shards_md")
    rep = export_corpus(spark, os.path.join(out, "extracted"),
                        os.path.join(cur_out, "curated"), shards,
                        pack_budget=256, text_col="extracted_md")
    assert rep["text_col"] == "extracted_md"
    df = spark.read.parquet(shards)
    assert "extracted_text" in df.columns and "extracted_md" not in df.columns
    # shard text equals the table's markdown arm per url
    ext = spark.read.parquet(os.path.join(out, "extracted")).select(
        "url", "extracted_md")
    diff = df.join(ext, "url").where(
        F.col("extracted_text") != F.col("extracted_md")).count()
    assert diff == 0
    # at least some shipped docs actually carry markdown decoration
    dec = df.where(F.col("extracted_text").rlike(r"\]\(|^# |\n- ")).count()
    assert dec > 0
    # token budgets count the MARKDOWN arm's tokens: every shard row's
    # n_tokens equals the whitespace token count of the shipped text, and
    # bins respect the budget in those tokens (+ one straddling doc)
    bad = df.where(
        F.col("n_tokens")
        != F.when(F.trim("extracted_text") == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim("extracted_text"), r"\s+"))
        ).cast("long")
    ).count()
    assert bad == 0
    over = (
        df.groupBy("split", "url_bucket", "bin_id")
        .agg(F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m"))
        .where((F.col("s") > 256) & (F.col("s") - F.col("m") > 256))
        .count()
    )
    assert over == 0


def test_curation_cascade_and_ppl_gates(spark, tmp_path):
    """--cascade folds the rule-cascade verdict into keep (reason column
    recorded either way); --ppl-drop-tail trains the bigram LM and drops
    the worst tercile; both off leaves the schema identical with
    cascade_reason recorded and ppl_bucket null."""
    rows = gen_pages(40, seed=37, dup_frac=0.0)
    inp = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(pages_to_pandas(rows)).write.parquet(inp)
    out = os.path.join(str(tmp_path), "out")
    cfg = ExtractConfig(input_path=inp, output_path=out, run_id="cp", buckets=4)
    run_extract(spark, cfg, default_rules())

    ext = spark.read.parquet(cfg.extracted_path)
    donor = ext.orderBy(F.desc("n_chars")).first()
    # a doc the cascade drops (too_short: <20 tokens) that still clears the
    # pipeline's own n_tokens >= 5 floor
    extra = spark.createDataFrame(
        [("https://shorty.test/a", "the quick brown fox of note", "3" * 64, 2)],
        "url string, extracted_text string, text_sha256 string, url_bucket int",
    )
    merged = ext.select(
        "url", "extracted_text", "text_sha256", "url_bucket"
    ).unionByName(extra)
    merged_path = os.path.join(str(tmp_path), "merged")
    merged.write.parquet(merged_path)

    rep = run_curation(
        spark, merged_path, os.path.join(str(tmp_path), "cur"),
        cascade_gate=True, ppl_drop_tail=True,
    )
    cur = spark.read.parquet(rep["curated_path"])
    shorty = cur.where(F.col("url") == "https://shorty.test/a").first()
    assert shorty["cascade_reason"] == "too_short" and not shorty["keep"]
    assert rep["cascade_dropped"] >= 1
    # the Gopher-band gate must not be degenerate on real extracted prose
    assert rep["kept"] > 0
    # tercile sizes over the scoreable docs; every tail doc is dropped
    assert rep["ppl_tail_dropped"] >= 1
    assert cur.where("ppl_bucket = 'tail' AND keep").count() == 0
    kept_reasons = {r["cascade_reason"] for r in cur.where("keep").collect()}
    assert kept_reasons <= {"keep"}

    # both gates off: same schema, ppl_bucket null, reasons still recorded
    rep2 = run_curation(
        spark, merged_path, os.path.join(str(tmp_path), "cur2")
    )
    assert rep2["cascade_dropped"] is None and rep2["ppl_tail_dropped"] is None
    cur2 = spark.read.parquet(rep2["curated_path"])
    assert sorted(cur.columns) == sorted(cur2.columns)
    assert cur2.where("ppl_bucket IS NOT NULL").count() == 0
    assert cur2.where("cascade_reason IS NULL").count() == 0


def test_curation_rep_quality_keeps_best_cluster_member(spark, tmp_path):
    """--rep-quality: the HIGHEST-quality member of a near-dup cluster
    survives instead of the min-url one; default mode is unchanged."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    ).strip()
    # url 'a' (min) is degraded with punctuation-noise so its quality score
    # drops below its near-dups; 'c' is the cleanest copy
    rows = [
        ("https://q.test/a", base.replace("beta", "!!?? ## @@", 1), "a" * 64, 0),
        ("https://q.test/b", base.replace("alpha", "changed", 1), "b" * 64, 1),
        ("https://q.test/c", base.replace("kappa", "altered", 1), "c" * 64, 2),
    ]
    src = os.path.join(str(tmp_path), "ext_rq")
    spark.createDataFrame(
        rows, "url string, extracted_text string, text_sha256 string, url_bucket int"
    ).write.parquet(src)

    rep = run_curation(spark, src, os.path.join(str(tmp_path), "cur_rq"),
                       rep_quality=True)
    assert rep["rep_mode"] == "quality"
    cur = {r["url"]: r for r in spark.read.parquet(rep["curated_path"]).collect()}
    # all three are one cluster; the kept one is the max-quality member
    comps = {r["near_dup_component"] for r in cur.values()}
    assert len(comps) == 1
    kept = [u for u, r in cur.items() if r["keep"]]
    best = max(cur.values(), key=lambda r: (r["quality"], r["url"] == min(cur)))
    qualities = {u: r["quality"] for u, r in cur.items()}
    assert len(kept) == 1
    assert qualities[kept[0]] == max(qualities.values())
    assert kept[0] != "https://q.test/a"  # min-url is NOT the survivor here
    assert all(r["near_dup_rep"] == kept[0] for r in cur.values())

    # default mode: min-url representative, near_dup_rep == component
    rep2 = run_curation(spark, src, os.path.join(str(tmp_path), "cur_rq2"))
    assert rep2["rep_mode"] == "min_url"
    cur2 = {r["url"]: r for r in spark.read.parquet(rep2["curated_path"]).collect()}
    kept2 = [u for u, r in cur2.items() if r["keep"]]
    assert kept2 == ["https://q.test/a"]
    assert all(r["near_dup_rep"] == r["near_dup_component"] for r in cur2.values())


def test_curate_increment_dedups_against_prior_corpus(spark, tmp_path):
    """jobs/curate_increment.py: an increment's docs dedup against the
    PRIOR corpus through its persisted digest + signature store — exact
    copies and near-dups of prior docs are dropped, fresh docs keep, and
    the updated signature store equals a from-scratch build over the
    union (the incremental == batch invariant)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    from curate_increment import curate_increment
    from corsearch_project_spark.operators import dedup as D

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).strip()
    other = ("solar lunar stellar orbit comet nebula quasar photon meson prism " * 6).strip()
    prior_rows = [
        ("https://p.test/one", base, "1" * 64, 0),
        ("https://p.test/two", other, "2" * 64, 1),
    ]
    prior_ext = os.path.join(str(tmp_path), "prior_ext")
    spark.createDataFrame(
        prior_rows,
        "url string, extracted_text string, text_sha256 string, url_bucket int",
    ).write.parquet(prior_ext)
    prior_out = os.path.join(str(tmp_path), "prior_cur")
    run_curation(spark, prior_ext, prior_out)

    fresh = "completely novel content " + " ".join(f"n{i}" for i in range(60))
    inc_rows = [
        # exact copy of a prior kept doc (same sha)
        ("https://i.test/exact", base, "1" * 64, 0),
        # near-dup of a prior doc (one word changed, new sha)
        ("https://i.test/near", base.replace("alpha", "changed", 1), "3" * 64, 1),
        # within-increment near-dup pair
        ("https://i.test/wa", other.replace("solar", "altered", 1), "4" * 64, 2),
        ("https://i.test/wb", other.replace("solar", "altered", 1).replace("prism", "glass", 1), "5" * 64, 3),
        # fresh unique doc
        ("https://i.test/fresh", fresh, "6" * 64, 4),
        # a url the prior corpus already curated: must be skipped entirely
        ("https://p.test/one", fresh, "7" * 64, 5),
    ]
    inc_ext = os.path.join(str(tmp_path), "inc_ext")
    spark.createDataFrame(
        inc_rows,
        "url string, extracted_text string, text_sha256 string, url_bucket int",
    ).write.parquet(inc_ext)
    out = os.path.join(str(tmp_path), "inc_cur")
    rep = curate_increment(spark, inc_ext, prior_out, out)

    assert rep["increment_docs"] == 6 and rep["known_urls_skipped"] == 1
    cur = {r["url"]: r for r in spark.read.parquet(rep["curated_path"]).collect()}
    assert set(cur) == {
        "https://i.test/exact", "https://i.test/near",
        "https://i.test/wa", "https://i.test/wb", "https://i.test/fresh",
    }
    assert cur["https://i.test/exact"]["dup_of_prior"]
    assert not cur["https://i.test/exact"]["keep"]
    assert cur["https://i.test/near"]["near_dup_prior"]
    assert not cur["https://i.test/near"]["keep"]
    # within-increment cluster: near-dups of each other but NOT of prior
    # ('other' itself is in prior — wa/wb are near-dups of it too, so both
    # are near_dup_prior; the within-component still forms)
    assert cur["https://i.test/wa"]["near_dup_prior"]
    assert cur["https://i.test/wb"]["near_dup_prior"]
    assert cur["https://i.test/fresh"]["keep"]
    assert not cur["https://i.test/fresh"]["near_dup_prior"]

    # incremental == batch: updated store equals a from-scratch signature
    # build over prior ∪ (accepted) increment
    union_rows = prior_rows + [r for r in inc_rows if r[0] != "https://p.test/one"]
    union_df = spark.createDataFrame(
        union_rows,
        "url string, extracted_text string, text_sha256 string, url_bucket int",
    )
    want_sig = D.minhash_sig(
        D.doc_shingles(
            union_df.select(F.col("url").alias("doc_id"),
                            F.col("extracted_text").alias("text")),
            "doc_id", "text", 3, distinct=False,
        )
    )
    got_sig = spark.read.parquet(rep["signatures_path"])
    assert sorted(map(tuple, got_sig.collect())) == sorted(
        map(tuple, want_sig.collect())
    )


def test_curate_increment_chain_sees_whole_corpus(spark, tmp_path):
    """Chained increments: increment B (--prior = increment A's output)
    must still dedup against the ORIGINAL batch corpus through the
    frontier and the accumulated signature store — and its curated output
    is export-compatible (split column, same pure url hash)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    from curate_increment import curate_increment

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).strip()
    schema = "url string, extracted_text string, text_sha256 string, url_bucket int"
    prior_ext = os.path.join(str(tmp_path), "b_ext")
    spark.createDataFrame(
        [("https://b.test/one", base, "1" * 64, 0)], schema
    ).write.parquet(prior_ext)
    batch_out = os.path.join(str(tmp_path), "b_cur")
    run_curation(spark, prior_ext, batch_out)

    freshA = "novel increment alpha content " + " ".join(f"a{i}" for i in range(60))
    incA_ext = os.path.join(str(tmp_path), "a_ext")
    spark.createDataFrame(
        [("https://a.test/fresh", freshA, "a" * 64, 1)], schema
    ).write.parquet(incA_ext)
    outA = os.path.join(str(tmp_path), "a_cur")
    repA = curate_increment(spark, incA_ext, batch_out, outA)
    assert repA["kept"] == 1

    incB_rows = [
        # exact copy of the ORIGINAL BATCH doc (two hops back)
        ("https://c.test/exact_batch", base, "1" * 64, 0),
        # near-dup of increment A's doc (one hop back)
        ("https://c.test/near_a", freshA.replace("novel", "changed", 1), "c" * 64, 2),
        # re-crawl of a batch url: skipped via the frontier
        ("https://b.test/one", "whatever " * 30, "d" * 64, 3),
        # fresh
        ("https://c.test/fresh", "unique c words " + " ".join(f"c{i}" for i in range(60)), "e" * 64, 4),
    ]
    incB_ext = os.path.join(str(tmp_path), "c_ext")
    spark.createDataFrame(incB_rows, schema).write.parquet(incB_ext)
    outB = os.path.join(str(tmp_path), "c_cur")
    repB = curate_increment(spark, incB_ext, outA, outB)

    assert repB["known_urls_skipped"] == 1  # the batch re-crawl
    cur = {r["url"]: r for r in spark.read.parquet(repB["curated_path"]).collect()}
    assert cur["https://c.test/exact_batch"]["dup_of_prior"]
    assert not cur["https://c.test/exact_batch"]["keep"]
    assert cur["https://c.test/near_a"]["near_dup_prior"]
    assert not cur["https://c.test/near_a"]["keep"]
    assert cur["https://c.test/fresh"]["keep"]
    # export contract: split present and equal to the batch hash of url
    from corsearch_project_spark.operators import textstats as X
    want_split = spark.createDataFrame(
        [("https://c.test/fresh",)], "url string"
    ).select(X.hash_split(F.col("url")).alias("s")).head()["s"]
    assert cur["https://c.test/fresh"]["split"] == want_split
    for c in ("split", "near_dup_degree", "substring_dup_fraction"):
        assert c in spark.read.parquet(repB["curated_path"]).columns
    # the frontier accumulated all three generations
    fr = {r["url"] for r in spark.read.parquet(repB["frontier_path"]).collect()}
    assert {"https://b.test/one", "https://a.test/fresh",
            "https://c.test/exact_batch", "https://c.test/fresh"} <= fr
    # signature store covers all accepted docs across generations
    sig_ids = {r["doc_id"] for r in
               spark.read.parquet(repB["signatures_path"]).collect()}
    assert {"https://b.test/one", "https://a.test/fresh",
            "https://c.test/exact_batch"} <= sig_ids


def test_readability_counts_and_scores(spark):
    """readability(): vowel-group syllables, [.!?]+ sentence runs (an
    ellipsis or '?!' ends ONE sentence), zero-terminator and zero-vowel
    edges clamp via greatest(_, 1), and the Flesch / FK formulas match a
    hand computation in fixed operand order."""
    from corsearch_project_spark.operators.textstats import readability
    from pyspark.sql import functions as F

    rows = [
        (1, "The cat sat."),           # 3 words, 1 sentence, 3 syllables
        (2, "Wait... really?! Yes."),  # 3 sentence runs
        (3, "no terminator here"),     # 0 sentences -> clamp to 1
        (4, "xkcd grr"),               # 0 vowel groups
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = readability(F.col("text"))
    got = {
        row["doc_id"]: row
        for row in df.select("doc_id", *[v.alias(k) for k, v in r.items()]).collect()
    }
    assert (got[1]["n_words"], got[1]["n_sentences"], got[1]["n_syllables"]) == (3, 1, 3)
    assert got[1]["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)
    assert got[1]["fk_grade"] == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 4)
    assert got[2]["n_sentences"] == 3
    assert got[3]["n_sentences"] == 0
    # clamp: wps uses max(sentences, 1) so the score is finite
    assert got[3]["flesch"] is not None
    assert got[4]["n_syllables"] == 0


def test_train_quality_cli_and_model_gated_curation(spark, tmp_path, capsys):
    """End-to-end CCNet-style model filter: train on trusted-vs-crawl
    extracted tables (jobs/train_quality.py), then curate with
    --model-weights / --min-model-score and check the trained margin —
    not the hash stand-in — gates keep."""
    import hashlib
    import json
    import os
    import random
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import run_curation as CUR
    import train_quality as TQ

    rng = random.Random(17)
    common = ["the", "and", "with", "for", "page", "report"]
    pos_v = ["science", "museum", "archive", "research", "culture"]
    neg_v = ["casino", "pills", "winner", "bonus", "cheap"]

    def mk(n, vocab, host):
        rows = []
        for i in range(n):
            words = [rng.choice(vocab if rng.random() < 0.6 else common)
                     for _ in range(rng.randint(15, 30))]
            # unique token guards against exact/near-dup collapse
            text = " ".join(words) + f" marker{host}{i}"
            url = f"https://{host}.example.com/d{i}"
            rows.append((url, text,
                         hashlib.sha256(text.encode()).hexdigest(), i % 4))
        return rows

    schema = "url string, extracted_text string, text_sha256 string, url_bucket int"
    pos_path = os.path.join(str(tmp_path), "pos")
    neg_path = os.path.join(str(tmp_path), "neg")
    spark.createDataFrame(mk(80, pos_v, "wiki"), schema).write.parquet(pos_path)
    spark.createDataFrame(mk(80, neg_v, "spam"), schema).write.parquet(neg_path)

    weights_path = os.path.join(str(tmp_path), "w.json")
    rc = TQ.main(["--positive", pos_path, "--negative", neg_path,
                  "--output", weights_path, "--max-iter", "40",
                  "--max-per-class", "0"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    rep = json.loads(out)
    assert rep["holdout_accuracy"] is None or rep["holdout_accuracy"] >= 0.9
    w = json.load(open(weights_path))
    assert len(w["weights"]) == w["n_buckets"]

    # curate a mixed table with the trained gate at the decision boundary
    mixed_path = os.path.join(str(tmp_path), "mixed")
    mixed = mk(30, pos_v, "goodmix") + mk(30, neg_v, "badmix")
    spark.createDataFrame(mixed, schema).write.parquet(mixed_path)
    cur_out = os.path.join(str(tmp_path), "cur")
    rc = CUR.main(["--input", mixed_path, "--output", cur_out,
                   "--min-quality", "0.0",
                   "--model-weights", weights_path,
                   "--min-model-score", "0.0"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    report = json.loads(out)
    assert report["model"] == "trained"
    cur = spark.read.parquet(os.path.join(cur_out, "curated"))
    rows = cur.collect()
    good = [r for r in rows if "goodmix" in r["url"]]
    bad = [r for r in rows if "badmix" in r["url"]]
    # the trained margin separates the two hosts
    good_kept = sum(1 for r in good if r["keep"]) / len(good)
    bad_kept = sum(1 for r in bad if r["keep"]) / len(bad)
    assert good_kept >= 0.9, good_kept
    assert bad_kept <= 0.1, bad_kept
    assert report["model_dropped"] >= len(bad) * 0.9

    # --min-model-score without --model-weights is refused
    rc = CUR.main(["--input", mixed_path, "--output", cur_out + "2",
                   "--min-model-score", "0.0"])
    capsys.readouterr()
    assert rc == 1


def test_train_quality_cap_is_a_band_not_a_modulus(spark, tmp_path):
    """--max-per-class must bound the subsample even when cap < n < 2*cap
    (a floor-division modulus filter kept ALL rows in that band), via a
    fixed hash-space threshold that stays correct for n beyond 2^32."""
    import hashlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import train_quality as TQ

    n, cap = 150, 100
    rows = [(f"https://h.example.com/{i}", f"text {i}", "x", 0)
            for i in range(n)]
    p = os.path.join(str(tmp_path), "side")
    spark.createDataFrame(
        rows, "url string, extracted_text string, text_sha256 string, url_bucket int"
    ).write.parquet(p)
    got = TQ._load_side(spark, p, 1.0, cap, "extracted_text").count()

    def phash(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    threshold = max((cap * (1 << 32)) // n, 1)
    want = sum(1 for u, *_ in rows if phash(u) < threshold)
    assert got == want
    assert got < n  # the old modulus filter kept all 150


def test_char_entropy_known_values(spark):
    """Entropy pinned against a pure-Python computation with the same
    micro-nat quantization; degenerate single-char doc has entropy 0."""
    import math

    from corsearch_project_spark.operators.textstats import char_entropy_stats

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy_stats(df).collect()}

    def ref(text):
        n = len(text)
        from collections import Counter

        micro = sum(
            c * int(round(-math.log(c / n) * 1e6))
            for c in Counter(text).values()
        )
        return micro, round(micro / (n * 1e6), 6)

    for did, text in rows:
        micro, ent = ref(text)
        assert got[did]["entropy_micro"] == micro, text
        assert got[did]["entropy"] == ent, text
    assert got[1]["entropy"] == 0.0
    # uniform 4-char doc: ln(4) nats per char
    assert abs(got[3]["entropy"] - 1.386294) < 1e-6
