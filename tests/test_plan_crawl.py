"""End-to-end crawl planning — jobs/plan_crawl.py.

Fixture: sitemap XML files + <host>.txt robots files + a crawled parquet;
the plan must chain frontier -> politeness -> scheduling correctly.
"""

import os

import pytest

from jobs.plan_crawl import plan_crawl, read_robots_dir


@pytest.fixture()
def crawl_inputs(spark, tmp_path):
    sm = tmp_path / "sitemaps"
    rb = tmp_path / "robots"
    sm.mkdir()
    rb.mkdir()
    (sm / "a.xml").write_text(
        "<urlset>"
        "<loc>https://a.com/keep/1</loc>"
        "<loc>https://a.com/keep/2</loc>"
        "<loc>https://a.com/private/x</loc>"
        "<loc>https://a.com/old/1</loc>"   # already crawled
        "</urlset>"
    )
    (sm / "b.xml").write_text(
        "<urlset>"
        "<loc>https://a.com/keep/2</loc>"  # duplicate across files
        "<loc>https://b.com/only</loc>"
        "</urlset>"
    )
    (rb / "a.com.txt").write_text(
        "User-agent: googlebot\nDisallow: /\nCrawl-delay: 99\n"
        "User-agent: *\nDisallow: /private\nCrawl-delay: 10\n"
    )
    # b.com has no robots file: default-allow, default delay
    crawled = spark.createDataFrame(
        [("https://a.com/old/1",)], "url string"
    )
    pq = str(tmp_path / "crawled.parquet")
    crawled.write.parquet(pq)
    return str(sm), str(rb), pq


def test_read_robots_dir_host_from_filename(spark, crawl_inputs):
    _, rb, _ = crawl_inputs
    got = {r["host"]: r["robots"] for r in read_robots_dir(spark, rb).collect()}
    assert list(got) == ["a.com"]
    assert "Disallow: /private" in got["a.com"]


def test_plan_crawl_end_to_end(spark, crawl_inputs, tmp_path):
    sm, rb, pq = crawl_inputs
    out = str(tmp_path / "plan")
    report = plan_crawl(spark, sm, rb, pq, out)
    # frontier: a.com {keep/1, keep/2, private/x} (old/1 crawled, keep/2
    # deduped), b.com {only}; /private blocked by robots
    assert report == {
        "hosts": 2, "n_new": 3, "n_blocked": 1,
        # a.com: 2 allowed * 10s = 20s; b.com: 1 * 1s. Round = max = 20.
        "est_round_s": 20, "output": out,
    }
    rows = {r["host"]: r.asDict() for r in
            spark.read.parquet(out).collect()}
    assert rows["a.com"]["n_new"] == 2
    assert rows["a.com"]["n_blocked"] == 1
    assert rows["a.com"]["crawl_delay_s"] == 10
    assert rows["a.com"]["est_fetch_s"] == 20
    assert rows["b.com"]["n_new"] == 1
    assert rows["b.com"]["crawl_delay_s"] == 1
    assert os.path.exists(out)
