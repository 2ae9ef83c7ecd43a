"""Search-side result pipeline: multi-source merge (J5/U1/T2) and
semantic rerank (T3)."""
