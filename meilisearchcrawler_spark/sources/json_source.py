"""JSON API source (S2) — config-mapped document extraction.

Reference: ``crawl_json_api_async`` crawler.py:1227-1336 and
``get_nested_value`` crawler.py:444-467. One GET returns a JSON
payload; ``json_config = {root, title, url, content, image}`` maps it
to documents via ``{{key}}`` template substitution (P13) and
``a.b[].c`` nested-path extraction.

Spark shape: the single payload is parsed driver-side (it is one HTTP
response, not data at scale — the reference does the same), the item
list becomes a DataFrame of JSON strings, and all per-item extraction
(templates, nested paths, excerpt, content-hash) runs in one
Arrow-batched ``mapInPandas`` using the shared kernels. Admission
(validity F6, exclusion F3) and the cache-skip gate (F11 minus the
dup-content check, which the JSON path does not apply —
crawler.py:1302) are DataFrame ops downstream.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

from ..functions import text as T
from ..functions.urls import generate_doc_id, is_excluded, is_valid_url

_TEMPLATE_KEY = re.compile(r"\{\{(.*?)\}\}")


def get_nested_value(data, key_path: str):
    """Nested-path extraction with ``[]`` list fan-out —
    crawler.py:444-467 semantics (including the falsy-filtering of list
    results)."""
    if not isinstance(data, (dict, list)) or not key_path:
        return None
    keys = key_path.replace("[]", ".[]").split(".")
    current = data
    for i, key in enumerate(keys):
        if current is None:
            return None
        if key == "[]":
            if not isinstance(current, list):
                return None
            remaining = ".".join(keys[i + 1:])
            if not remaining:
                return current
            results = []
            for item in current:
                res = get_nested_value(item, remaining)
                if res:
                    results.extend(res if isinstance(res, list) else [res])
            return results
        if not isinstance(current, dict):
            return None
        current = current.get(key)
    return current


def substitute_template(template: str, item) -> str | None:
    """P13 (crawler.py:1255-1262): replace every ``{{key}}`` with the
    item's nested value; reject if any ``{{`` survives."""
    out = template
    for t_key in _TEMPLATE_KEY.findall(template):
        value = get_nested_value(item, t_key.strip())
        if value:
            out = out.replace(f"{{{{{t_key}}}}}", str(value))
    if not out or "{{" in out:
        return None
    return out


EXTRACT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("doc_id", StringType()),
    StructField("title", StringType()),
    StructField("content", StringType()),
    StructField("excerpt", StringType()),
    StructField("images_json", StringType()),
    StructField("content_hash", StringType()),
    StructField("status", IntegerType()),  # 1 ok | 0 bad-template/invalid | -1 error
])


def _make_extract_udf(json_config: dict):
    def extract(batches):
        for pdf in batches:
            out = []
            for raw in pdf["item_json"]:
                rec = dict.fromkeys((f.name for f in EXTRACT_SCHEMA.fields))
                rec["status"] = -1
                try:
                    item = json.loads(raw)
                    url = substitute_template(json_config["url"], item)
                    if url is None or not is_valid_url(url):
                        rec["status"] = 0
                        out.append(rec)
                        continue
                    title = str(get_nested_value(item, json_config["title"]) or "Sans titre")
                    image_url = None
                    if json_config.get("image"):
                        image_url = substitute_template(json_config["image"], item)
                    images = ([{"url": image_url, "alt": title, "description": title}]
                              if image_url else [])
                    content_parts = []
                    for content_key in json_config.get("content", "").split(","):
                        if not content_key.strip():
                            continue
                        value = get_nested_value(item, content_key.strip())
                        if isinstance(value, list):
                            content_parts.extend(map(str, value))
                        elif value:
                            content_parts.append(str(value))
                    content = " ".join(content_parts)
                    excerpt = T.create_excerpt(content)
                    rec.update(
                        url=url, doc_id=generate_doc_id(url), title=title,
                        content=content, excerpt=excerpt,
                        images_json=json.dumps(images, sort_keys=True),
                        content_hash=T.get_content_hash(content, title, images, excerpt),
                        status=1)
                except Exception:
                    pass
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in EXTRACT_SCHEMA.fields])

    return extract


def json_items_df(spark: SparkSession, payload, root: str,
                  num_partitions: int = 8) -> DataFrame:
    """Item list from one JSON payload → DataFrame of json strings with
    the item's original position (doc order matters for determinism)."""
    items = get_nested_value(payload, root)
    if not items:
        raise ValueError(f"root element {root!r} not found")
    rows = [(i, json.dumps(it, sort_keys=True)) for i, it in enumerate(items)]
    return spark.createDataFrame(rows, schema="pos int, item_json string") \
                .repartition(num_partitions)


def extract_json_documents(spark: SparkSession, payload, site: dict,
                           exclude_patterns: list[str] | None = None) -> DataFrame:
    """The full S2 pipeline minus sinks: payload → items → extraction →
    admission (status gate + F3 exclusion). Returns candidate documents
    ready for the cache-skip join and index append."""
    json_config = site["json"]
    items = json_items_df(spark, payload, json_config["root"])
    extracted = items.mapInPandas(_make_extract_udf(json_config),
                                  schema=EXTRACT_SCHEMA)
    ok = extracted.filter(F.col("status") == 1)
    patterns = exclude_patterns or []
    if patterns:
        from ..functions.urls import is_excluded_col

        ok = ok.filter(~is_excluded_col(F.col("url"), patterns))
    return ok.withColumn("site", F.lit(site["site"])) \
             .withColumn("lang", F.lit(site.get("lang", "fr")))


def oracle_json_documents(payload, site: dict,
                          exclude_patterns: list[str] | None = None) -> list[dict]:
    """Sequential reference-semantics oracle for the JSON path (used by
    tests the same way oracle/refcrawler.py backs the HTML path)."""
    json_config = site["json"]
    items = get_nested_value(payload, json_config["root"]) or []
    docs = []
    for item in items:
        url = substitute_template(json_config["url"], item)
        if url is None or not is_valid_url(url):
            continue
        if is_excluded(url, exclude_patterns or []):
            continue
        title = str(get_nested_value(item, json_config["title"]) or "Sans titre")
        image_url = substitute_template(json_config["image"], item) \
            if json_config.get("image") else None
        images = ([{"url": image_url, "alt": title, "description": title}]
                  if image_url else [])
        content_parts = []
        for content_key in json_config.get("content", "").split(","):
            if not content_key.strip():
                continue
            value = get_nested_value(item, content_key.strip())
            if isinstance(value, list):
                content_parts.extend(map(str, value))
            elif value:
                content_parts.append(str(value))
        content = " ".join(content_parts)
        excerpt = T.create_excerpt(content)
        docs.append({
            "url": url, "doc_id": generate_doc_id(url), "title": title,
            "content": content, "excerpt": excerpt,
            "content_hash": T.get_content_hash(content, title, images, excerpt),
            "images": images,
        })
    return docs
