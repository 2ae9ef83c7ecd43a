"""MAX_CRAWL_DURATION on the logical clock (crawler.py:108, loop check
1138-1143): the engine must stop at exactly the same round boundary as
the sequential oracle, leaving an identical partial crawl state."""

from __future__ import annotations

from meilisearchcrawler_spark.config import CrawlConfig
from meilisearchcrawler_spark.engine.crawler import CrawlEngine
from meilisearchcrawler_spark.fixtures.webgen import generate_web, write_parquet
from meilisearchcrawler_spark.oracle.refcrawler import crawl_site


def test_duration_cap_matches_oracle(spark, tmp_path):
    fx = generate_web(seed=17, n_sites=2, pages_per_site=28)
    paths = write_parquet(fx, str(tmp_path / "web"))
    cap = 3.0  # logical seconds @ round_seconds=1.0 → rounds 0..3
    oracle = {s["site"]: crawl_site(fx, s, batch_size=3, max_duration=cap)
              for s in fx.seeds}
    eng = CrawlEngine(spark, str(tmp_path / "cat"), paths["pages"],
                      fx.seeds, fx.robots,
                      CrawlConfig(round_budget=3, shuffle_partitions=4,
                                  max_crawl_duration=cap),
                      initial_url_seen=fx.url_seen)
    executed = eng.run()
    assert executed == 4  # rounds 0..3 then the cap fires
    log = eng.catalog.read("crawl_log").collect()
    for site, orc in oracle.items():
        e_seq = sorted((r["round"], r["pos_in_round"], r["url"], r["counter"])
                       for r in log
                       if r["action"] == "admitted" and r["site"] == site)
        o_seq = sorted((r["round"], r["pos_in_round"], r["url"], r["counter"])
                       for r in orc.crawl_log if r["action"] == "admitted")
        assert e_seq == o_seq, site
        # the cap produced a strictly partial crawl (the knob did fire)
        site_cfg = next(s for s in fx.seeds if s["site"] == site)
        full = crawl_site(fx, site_cfg, batch_size=3)
        assert len(o_seq) < sum(
            1 for r in full.crawl_log if r["action"] == "admitted")
