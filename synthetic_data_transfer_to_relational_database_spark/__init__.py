"""PySpark-native analytics + synthetic-data engine.

A brand-new, Spark-first implementation of the capabilities of the
reference repo ``Cihan9946/Synthetic-data-transfer-to-relational-database``
(surveyed in /root/repo/SURVEY.md): catalog/schema introspection,
rule-driven referentially-consistent data generation, bulk relational
load — plus the full relational query surface and LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required by BASELINE.json, all expressed as DataFrame/SQL logical plans
that Catalyst optimizes.

Design principles (SURVEY.md §7):
- DataFrame/SQL only; zero custom Catalyst rules.
- Explicit seeds everywhere (the reference is seedless; determinism is a
  deliberate improvement, SURVEY.md §2.1).
- Every operator ships with a ``queries()`` entry and, where
  SQL-expressible, a DuckDB ``oracle_sql()`` twin.
- Designed for 100 TB scale: broadcast small dims, partial aggregation,
  no driver-side collect() in the data path.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
