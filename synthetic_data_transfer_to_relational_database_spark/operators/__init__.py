"""Operator packs. Each module exposes ``QUERIES`` (name -> fn(spark, sf_dir)
-> DataFrame) and ``ORACLE`` (name -> DuckDB SQL) dicts; ``registry.py``
aggregates them for the driver contract (__spark_entry__.py).

Cache contract: a handful of operators ``cache()`` a shared subframe that
feeds multiple plan branches (the MinHash signature frame, the inverted
token index, n-gram/edge/degree frames) because Spark has no cross-branch
common-subexpression elimination — uncached, each branch re-derives the
subtree from the scan. The operators cannot ``unpersist()`` themselves:
they return LAZY DataFrames, and the cache must stay alive until the
caller materializes the result. Callers composing operators in a
long-lived session therefore call ``spark.catalog.clearCache()`` between
operators (as bench.py and the driver do) or ``unpersist()`` the inputs
they're done with; otherwise executor storage accumulates across calls.
Every ``cache()`` site's docstring notes what is cached and why.
"""
