"""F17 safety filter, streaming metrics rollup, embedding encode stage."""

from __future__ import annotations

import random

from pyspark.sql import Row

from meilisearchcrawler_spark.search.safety import (
    filter_results,
    is_safe_oracle,
)

SAFETY_CFG = {
    "blocked_domains": ["bad.example.com"],
    "allowed_domains": [],
    "blocked_keywords": ["forbidden", "nsfw"],
    "blocked_patterns": [r"secret\s+pattern"],
}


def _results(seed=5, n=40):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        domain = rng.choice(["www.Good.example.com", "bad.example.com", "ok.org"])
        title = rng.choice(["Nice article", "A FORBIDDEN title", "Plain"])
        content = rng.choice(["hello world", "contains secret  pattern inside",
                              "totally fine", None])
        rows.append({"url": f"http://{domain}/p{i}" + ("?nsfw=1" if i % 9 == 0 else ""),
                     "title": title, "excerpt": rng.choice(["short", None]),
                     "content": content})
    return rows


class TestSafety:
    def test_matches_oracle(self, spark):
        rows = _results()
        df = spark.createDataFrame(
            [Row(**r) for r in rows],
            schema="url string, title string, excerpt string, content string")
        got = {r["url"] for r in filter_results(df, SAFETY_CFG).collect()}
        want = {r["url"] for r in rows if is_safe_oracle(SAFETY_CFG, r)}
        assert got == want
        assert 0 < len(want) < len(rows)  # both branches exercised

    def test_whitelist_mode(self, spark):
        cfg = dict(SAFETY_CFG, allowed_domains=["ok.org"])
        rows = _results()
        df = spark.createDataFrame(
            [Row(**r) for r in rows],
            schema="url string, title string, excerpt string, content string")
        got = {r["url"] for r in filter_results(df, cfg).collect()}
        want = {r["url"] for r in rows if is_safe_oracle(cfg, r)}
        assert got == want
        assert all("ok.org" in u for u in got)


class TestStreamingMetrics:
    def test_live_rollup_over_catalog(self, spark, tmp_path):
        """Run a short crawl, then drain the metrics stream and compare
        the running rollup against a batch aggregation of the same
        table (the status.json analog, S9/A2)."""
        from pyspark.sql import functions as F

        from meilisearchcrawler_spark.config import CrawlConfig
        from meilisearchcrawler_spark.engine.crawler import CrawlEngine
        from meilisearchcrawler_spark.fixtures.webgen import (
            generate_web, write_parquet,
        )
        from meilisearchcrawler_spark.streaming.metrics_stream import (
            run_rollup_once,
        )

        fx = generate_web(seed=13, n_sites=1, pages_per_site=28)
        paths = write_parquet(fx, str(tmp_path / "web"))
        root = str(tmp_path / "cat")
        eng = CrawlEngine(spark, root, paths["pages"], fx.seeds, fx.robots,
                          CrawlConfig(round_budget=6, shuffle_partitions=4),
                          initial_url_seen=fx.url_seen)
        eng.run(max_rounds=12)

        rows = run_rollup_once(spark, root, str(tmp_path / "ckpt"))
        got = {(r["site"], r["action"]): r["total"] for r in rows}
        batch = eng.catalog.read("metrics").groupBy("site", "action") \
                   .agg(F.sum("count").alias("total")).collect()
        want = {(r["site"], r["action"]): r["total"] for r in batch}
        assert got == want
        assert any(a == "indexed" for (_, a) in got)


class TestEmbeddings:
    def test_encode_deterministic_and_cached(self, spark):
        from meilisearchcrawler_spark.operators.embeddings import encode_documents

        docs = spark.createDataFrame([
            Row(id="a", title="T1", content="C1"),
            Row(id="b", title="T2", content="C2"),
            Row(id="c", title="T1", content="C1"),  # same text as a
        ])
        out = {r["id"]: r["vectors"] for r in encode_documents(docs, dim=16).collect()}
        assert all(len(v) == 16 for v in out.values())
        assert out["a"] == out["c"]  # deterministic (and LRU-hit) path
        assert out["a"] != out["b"]
        again = {r["id"]: r["vectors"] for r in encode_documents(docs, dim=16).collect()}
        assert again == out
        # unit norm
        import math

        assert abs(sum(x * x for x in out["a"]) - 1.0) < 1e-3


class TestSearchPipeline:
    def _sources(self, seed=11):
        rng = random.Random(seed)
        def mk(prefix, n, with_vec):
            rows = []
            for i in range(n):
                vec = ([round(rng.uniform(-1, 1), 4) for _ in range(6)]
                       if with_vec and i % 3 else None)
                rows.append({
                    "id": f"{prefix}{i}", "url": f"http://{prefix}.org/page{i}",
                    "title": f"{prefix} title {i}",
                    "excerpt": "an excerpt", "content": "body text",
                    "score": round(rng.uniform(0.1, 1.0), 3),
                    "vectors": vec, "rank": i})
            return rows
        meili = mk("meili", 10, True)
        cse = mk("cse", 8, False)
        # force a url collision: cse rank 0 duplicates meili rank 0
        cse[0]["url"] = "http://WWW.meili.org/page0/"
        wiki = mk("wiki", 6, True)
        wiki[3]["id"] = wiki[0]["id"]  # wiki dup by id
        return meili, cse, wiki

    def _to_df(self, spark, rows):
        schema = ("id string, url string, title string, excerpt string, "
                  "content string, score double, vectors array<double>, rank int")
        return spark.createDataFrame(rows, schema=schema)

    def test_pipeline_matches_oracle(self, spark):
        from meilisearchcrawler_spark.search.pipeline import (
            search_pipeline, search_pipeline_oracle,
        )

        meili, cse, wiki = self._sources()
        cfg = {"blocked_keywords": ["title 7"]}
        q = [0.3, -0.2, 0.9, 0.1, -0.5, 0.4]
        for emb in (q, None):
            got = search_pipeline(self._to_df(spark, meili), self._to_df(spark, cse),
                                  self._to_df(spark, wiki), limit=8,
                                  safety_cfg=cfg, query_embedding=emb).collect()
            want = search_pipeline_oracle(meili, cse, wiki, limit=8,
                                          safety_cfg=cfg, query_embedding=emb)
            assert [g["id"] for g in got] == [w["id"] for w in want], f"emb={emb is not None}"
            assert "vectors" not in got[0].asDict()
            for g, w in zip(got, want):
                import math
                assert math.isclose(g["score"], w["score"], rel_tol=1e-6)


class TestStreamingDedup:
    """applyInPandasWithState stateful URL dedup (streaming F1): only
    first occurrences survive, and operator state persists across a
    query restart via the checkpoint."""

    def test_first_occurrence_across_restarts(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from meilisearchcrawler_spark.streaming.dedup_stream import (
            streaming_url_dedup,
        )

        src = tmp_path / "urls"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")

        def drop(name, rows):
            pq.write_table(pa.Table.from_pylist(rows), str(src / name))

        out_dir = str(tmp_path / "out")

        def drain():
            stream = (spark.readStream
                      .schema("url_hash long, url string, site string")
                      .parquet(str(src)))
            q = (streaming_url_dedup(stream, n_buckets=8)
                 .writeStream.format("parquet").option("path", out_dir)
                 .outputMode("append").option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            return [r.asDict() for r in
                    spark.read.parquet(out_dir).collect()]

        rows1 = [{"url_hash": h, "url": f"u{h}", "site": "s"}
                 for h in [1, 2, 3, 2, 1, 64 + 1, 5]]
        drop("a.parquet", rows1)
        got1 = drain()
        assert sorted(r["url_hash"] for r in got1) == [1, 2, 3, 5, 65]

        # second drop + a NEW query from the same checkpoint: state
        # must remember batch-1 hashes
        rows2 = [{"url_hash": h, "url": f"u{h}", "site": "s"}
                 for h in [2, 5, 7, 65, 7, 9]]
        drop("b.parquet", rows2)
        got2 = drain()  # cumulative sink: batch-1 rows + only-new batch-2 rows
        assert sorted(r["url_hash"] for r in got2) == [1, 2, 3, 5, 7, 9, 65]
