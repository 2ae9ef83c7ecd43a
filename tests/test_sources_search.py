"""S2 (JSON API), S3/S4+P12+F15/F16 (MediaWiki), J5/T2 (merger) and T3
(reranker) — Spark implementations vs direct reference-semantics
oracles."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row

from meilisearchcrawler_spark.sources import json_source as J
from meilisearchcrawler_spark.sources import mediawiki as W


class TestNestedValue:
    def test_basic_paths(self):
        data = {"a": {"b": {"c": 7}}, "l": [{"x": 1}, {"x": 2}, {"y": 3}]}
        assert J.get_nested_value(data, "a.b.c") == 7
        assert J.get_nested_value(data, "l[].x") == [1, 2]
        assert J.get_nested_value(data, "a.missing") is None
        assert J.get_nested_value(data, "") is None
        # reference quirk: a bare "[]" splits to ["", "[]"] and the empty
        # key fails the dict check → None (crawler.py:449-466)
        assert J.get_nested_value([1, 2], "[]") is None
        assert J.get_nested_value({"l": [1, 2]}, "l") == [1, 2]

    def test_template_substitution(self):
        item = {"id": 42, "slug": "abc"}
        assert J.substitute_template("http://x/{{slug}}/{{id}}", item) == "http://x/abc/42"
        assert J.substitute_template("http://x/{{missing}}", item) is None


JSON_SITE = {
    "site": "jsonsite",
    "lang": "en",
    "json": {
        "root": "data.items",
        "title": "name",
        "url": "http://api.example.com/view/{{id}}",
        "content": "summary,tags",
        "image": "http://img.example.com/{{img.file}}",
    },
}


def _json_payload(n=25, seed=3):
    rng = random.Random(seed)
    items = []
    for i in range(n):
        item = {
            "id": i,
            "name": f"Item {i}" if i % 7 else "",
            "summary": " ".join(rng.choice(["alpha", "beta", "gamma", "delta",
                                            "epsilon longer sentence here"])
                                for _ in range(rng.randint(5, 30))),
            "tags": [f"t{j}" for j in range(i % 4)],
        }
        if i % 3 == 0:
            item["img"] = {"file": f"f{i}.png"}
        if i % 10 == 9:
            del item["id"]  # unresolvable template → rejected
        items.append(item)
    return {"data": {"items": items}}


class TestJsonSource:
    def test_matches_oracle(self, spark):
        payload = _json_payload()
        got = J.extract_json_documents(spark, payload, JSON_SITE,
                                       exclude_patterns=["/view/13"]).collect()
        want = J.oracle_json_documents(payload, JSON_SITE,
                                       exclude_patterns=["/view/13"])
        got_by_id = {r["doc_id"]: r for r in got}
        assert set(got_by_id) == {d["doc_id"] for d in want}
        for d in want:
            g = got_by_id[d["doc_id"]]
            for k in ("url", "title", "content", "excerpt", "content_hash"):
                assert g[k] == d[k], k

    def test_missing_root_raises(self, spark):
        with pytest.raises(ValueError):
            J.json_items_df(spark, {"nope": 1}, "data.items")


class TestWikitext:
    def test_clean_wikitext_constructs(self):
        src = ("{{Infobox|a={{nested|x}}}}'''Bold''' text [[Page|label]] "
               "and [[Plain]] <ref>ref body</ref><b>html</b> "
               "[[Catégorie:C]][[Fichier:F.png|t]] {| table |} end")
        out = W.clean_wikitext(src)
        assert "{{" not in out and "[[" not in out and "<" not in out
        assert "label" in out and "Plain" in out
        assert "Bold text" in out
        # reference rule-order quirks we reproduce exactly
        # (mediawiki_crawler.py:285-300): the generic HTML strip runs
        # *before* the <ref>…</ref> rule, so ref bodies survive as text;
        # the generic [[x|y]] rule runs *before* the category/file
        # rules, so those collapse to their label text
        assert "ref body" in out
        assert "Catégorie:C" in out
        assert "table" not in out  # {| … |} genuinely removed

    def test_end_section_truncation_only_past_500(self):
        long_body = "x" * 600
        cut = W.clean_wikitext(long_body + " == Références == tail")
        assert "tail" not in cut
        short_body = "y" * 100
        kept = W.clean_wikitext(short_body + " == Références == tail")
        assert "tail" in kept  # min_pos ≤ 500 ⇒ no truncation (ref :317)

    def test_safety_gate(self):
        assert not W.is_safe_content("Catastrophe de X", "")
        assert W.is_safe_content("Histoire de X", "")

    def test_wiki_content_hash_composition(self):
        import hashlib

        assert W.wiki_content_hash("T", "C") == hashlib.md5(b"T|C").hexdigest()


class TestMediaWikiPipeline:
    def test_fetch_documents(self, spark):
        from meilisearchcrawler_spark.fixtures.wikigen import generate_wiki_pages

        store = generate_wiki_pages(seed=9, n_pages=60)
        site = {"site": "wiki", "lang": "fr", "max_pages": 0}
        docs = W.fetch_wiki_documents(spark, store, site, namespaces=[0]).collect()
        # expected: sequential application of the same gates
        expect_ids = []
        for pid in W.list_page_ids(store, [0]):
            page = store[pid]
            content = W.clean_wikitext(page["wikitext"])
            if W.is_safe_content(page["title"], content) and len(content) >= 50:
                expect_ids.append(pid)
        assert sorted(r["page_id"] for r in docs) == sorted(expect_ids)
        assert expect_ids, "fixture produced no admissible wiki pages"
        one = next(r for r in docs if r["page_id"] == expect_ids[0])
        page = store[expect_ids[0]]
        assert one["content_hash"] == W.wiki_content_hash(
            page["title"], W.clean_wikitext(page["wikitext"]))
        # gates actually exercised
        assert any(store[p]["ns"] != 0 for p in store)
        assert any(store[p].get("redirect") for p in store)


class TestMergeRerank:
    def _fixture(self, seed=4):
        rng = random.Random(seed)
        meili = [{"url": f"http://www.Site.com/p{i}/",
                  "score": round(rng.uniform(0.2, 1.0), 3), "rank": i}
                 for i in range(12)]
        cse = [{"url": f"http://site.com/p{i}",  # normalizes onto meili
                "score": round(rng.uniform(0.2, 1.0), 3), "rank": i}
               for i in range(6, 18)]
        return meili, cse

    def test_merge_matches_oracle(self, spark):
        from meilisearchcrawler_spark.search.merge import merge_oracle, merge_results

        meili, cse = self._fixture()
        got = merge_results(spark.createDataFrame([Row(**r) for r in meili]),
                            spark.createDataFrame([Row(**r) for r in cse]),
                            limit=10).collect()
        want = merge_oracle(meili, cse, limit=10)
        assert len(got) == len(want)
        assert {g["url"] for g in got} == {w["url"] for w in want}
        for g, w in zip(sorted(got, key=lambda r: -r["score"]),
                        sorted(want, key=lambda r: -r["score"])):
            assert math.isclose(g["score"], w["score"], rel_tol=1e-9)
            assert g["source"] == w["source"]

    def test_rerank_matches_oracle(self, spark):
        from meilisearchcrawler_spark.search.rerank import rerank, rerank_oracle

        rng = random.Random(7)
        rows = []
        for i in range(15):
            vec = [round(rng.uniform(-1, 1), 4) for _ in range(8)] if i % 4 else None
            rows.append({"url": f"u{i}", "score": round(rng.uniform(0, 1), 3),
                         "vectors": vec, "rank": i})
        q = [round(rng.uniform(-1, 1), 4) for _ in range(8)]
        got = rerank(spark.createDataFrame(
            rows, schema="url string, score double, vectors array<double>, rank int"),
            q, top_k=8).collect()
        want = rerank_oracle(rows, q, top_k=8)
        assert [g["url"] for g in got] == [w["url"] for w in want]
        for g, w in zip(got, want):
            assert math.isclose(g["score"], w["score"], rel_tol=1e-6)


class TestHybridSearch:
    """Hybrid keyword+semantic blend (meilisearch_client.py:110-125) —
    Spark DataFrame form vs the sequential oracle implementation."""

    def _corpus(self):
        rng = random.Random(13)
        vocab = ("spark frontier fetch crawl index window vector merge "
                 "table batch row agg").split()
        docs = [{"doc_id": i,
                 "text": " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40)))}
                for i in range(60)]
        embeddings = {i: [round(rng.uniform(-1, 1), 4) for _ in range(8)]
                      for i in range(60) if i % 3}  # a third lack vectors
        return docs, embeddings

    def test_hybrid_matches_oracle(self, spark):
        from meilisearchcrawler_spark.search.hybrid import (
            hybrid_oracle, hybrid_topk)

        docs, embeddings = self._corpus()
        qterms = ["spark", "vector", "merge"]
        qvec = [0.5, -0.25, 0.1, 0.9, -0.3, 0.0, 0.7, -0.8]
        docs_df = spark.createDataFrame(docs, schema="doc_id long, text string")
        emb_df = spark.createDataFrame(
            [{"vec_id": i, "embedding": v} for i, v in embeddings.items()],
            schema="vec_id long, embedding array<double>")
        got = hybrid_topk(docs_df, emb_df, qterms, qvec, k=15).collect()
        want = hybrid_oracle(docs, embeddings, qterms, qvec, k=15)
        assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]
        for g, w in zip(got, want):
            for c in ("keyword_score", "semantic_score", "score"):
                assert math.isclose(g[c], w[c], abs_tol=2e-6), (g, w, c)

    def test_keyword_only_and_semantic_only_extremes(self, spark):
        from meilisearchcrawler_spark.search.hybrid import hybrid_topk

        docs, embeddings = self._corpus()
        docs_df = spark.createDataFrame(docs, schema="doc_id long, text string")
        emb_df = spark.createDataFrame(
            [{"vec_id": i, "embedding": v} for i, v in embeddings.items()],
            schema="vec_id long, embedding array<double>")
        qvec = [1.0] + [0.0] * 7
        kw_only = hybrid_topk(docs_df, emb_df, ["spark"], qvec,
                              semantic_ratio=0.0, k=5).collect()
        assert all(r["score"] == r["keyword_score"] for r in kw_only)
        sem_only = hybrid_topk(docs_df, emb_df, ["spark"], qvec,
                               semantic_ratio=1.0, k=5).collect()
        assert all(r["score"] == r["semantic_score"] for r in sem_only)


class TestWikiSearchScan:
    """S12 — WikiClient.search result mapping (wiki_client.py:104-161):
    srlimit truncation before the validity skip, wiki_{pageid} ids,
    curid URLs, HTML snippets kept."""

    def test_scan_matches_oracle(self, spark):
        from meilisearchcrawler_spark.sources.mediawiki import (
            wiki_search_oracle, wiki_search_scan)

        rng = random.Random(31)
        raw = []
        per_query = {}
        for q in ("castles", "volcanoes", "empty"):
            items = []
            n = 0 if q == "empty" else 9
            for r in range(n):
                items.append({
                    "pageid": None if r == 1 else 1000 + r,
                    "title": None if r == 3 else f"{q} page {r}",
                    "snippet": f"<b>{q}</b> snippet {r}" if r % 2 else None,
                })
            per_query[q] = items
            raw += [{"query": q, "rank": r, **it}
                    for r, it in enumerate(items)]
        df = spark.createDataFrame(
            raw, schema=("query string, rank int, pageid long, "
                         "title string, snippet string"))
        got = {}
        for r in wiki_search_scan(df, "https://fr.vikidia.org/wiki",
                                  "Vikidia", "fr", limit=5).collect():
            got.setdefault(r["query"], []).append(r.asDict())
        for q, items in per_query.items():
            want = wiki_search_oracle(items, "https://fr.vikidia.org/wiki",
                                      "Vikidia", "fr", limit=5)
            g = sorted(got.get(q, []), key=lambda r: r["rank"])
            assert len(g) == len(want), q
            for a, b in zip(g, want):
                for k in ("id", "url", "title", "excerpt", "source",
                          "site", "lang", "score", "rank"):
                    assert a[k] == b[k], (q, k, a, b)
        # invalid rows consumed srlimit slots: 5 served, 2 invalid → 3 out
        assert len(got["castles"]) == 3
