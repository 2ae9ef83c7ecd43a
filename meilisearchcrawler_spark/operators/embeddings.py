"""Embedding encode stage — the multi-provider encoder surface
(embeddings.py:55-65,139-186; J7 doc↔vector zip crawler.py:739-744).

The reference batches texts to Gemini/HF-TEI/Ollama with an LRU cache
(embeddings.py:95,148-153). The container has no model runtime, so the
encoder kernel here is a clearly-marked deterministic stand-in
(hash-seeded unit vectors) behind the *real* Spark plumbing: Arrow
``mapInPandas`` batches, per-executor LRU, dimension check
(crawler.py:740), text assembly ``f"{title}\\n{content}"`` (P15,
crawler.py:705). Swapping in a real provider changes only
``_encode_batch``.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType, StructField, StructType

_LRU_MAX = 10_000
_lru: OrderedDict[str, list[float]] = OrderedDict()


def _encode_one(text: str, dim: int) -> list[float]:
    """Deterministic stand-in encoder: md5-seeded Gaussian unit vector.
    NOT a semantic embedding — replace with a provider call in
    deployment (this is the stubbed decode step the task brief allows;
    the Spark-side batching/caching around it is real)."""
    seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v) or 1.0
    return [float(x) for x in np.round(v, 6)]


def _encode_batch(texts: list[str], dim: int) -> list[list[float]]:
    out = []
    for t in texts:
        key = f"{dim}|{t}"
        if key in _lru:
            _lru.move_to_end(key)
            out.append(_lru[key])
            continue
        vec = _encode_one(t, dim)
        if len(vec) != dim:  # dimension gate, crawler.py:740
            raise ValueError(f"embedding dim {len(vec)} != {dim}")
        _lru[key] = vec
        if len(_lru) > _LRU_MAX:
            _lru.popitem(last=False)
        out.append(vec)
    return out


def text_to_embed(title_col: str = "title", content_col: str = "content",
                  max_len: int | None = None):
    """P15 (crawler.py:705): ``f"{title}\\n{content}".strip()``."""
    joined = F.concat_ws("\n", F.coalesce(F.col(title_col), F.lit("")),
                         F.coalesce(F.col(content_col), F.lit("")))
    trimmed = F.trim(joined)
    return F.substring(trimmed, 1, max_len) if max_len else trimmed


def encode_documents(df: DataFrame, dim: int = 64, id_col: str = "id",
                     title_col: str = "title",
                     content_col: str = "content") -> DataFrame:
    """doc → (id, vectors) with per-executor LRU inside the Arrow batch
    loop (SURVEY §4 'embedding LRU cache')."""
    schema = StructType([
        StructField(id_col, StringType()),
        StructField("vectors", ArrayType(FloatType())),
    ])

    def kernel(batches):
        for pdf in batches:
            vecs = _encode_batch(list(pdf["_embed_text"]), dim)
            yield pd.DataFrame({id_col: pdf[id_col], "vectors": vecs})

    prepared = df.select(F.col(id_col),
                         text_to_embed(title_col, content_col).alias("_embed_text"))
    return prepared.mapInPandas(kernel, schema=schema)
