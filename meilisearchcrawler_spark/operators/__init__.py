"""Relational + training-data-pipeline operators.

Each module is Spark-first: built-in ``pyspark.sql.functions`` wherever
the semantics allow (JVM-side, whole-stage codegen), Arrow-batched
pandas UDFs only where they genuinely don't (image decode), and every
shuffle accounted for in the docstring.
"""
