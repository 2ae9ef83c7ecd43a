"""Scalar function kernels.

Each kernel exists twice on purpose:

* a **pure-Python** form (used by pandas UDF bodies *and* by the
  in-process reference-semantics oracle in ``oracle/refcrawler.py``),
  so extraction byte-equality between engine and oracle holds by
  construction and the equivalence tests exercise the *algorithmic*
  content (ordering, seen-set, scheduling), and
* where expressible, a **Spark Column** form built only from
  ``pyspark.sql.functions`` so the hot path stays inside whole-stage
  codegen (SURVEY.md §2.2).
"""
