"""Operator packs. Each module exposes ``QUERIES`` (name -> fn(spark, sf_dir)
-> DataFrame) and ``ORACLE`` (name -> DuckDB SQL) dicts; ``registry.py``
aggregates them for the driver contract (__spark_entry__.py)."""
