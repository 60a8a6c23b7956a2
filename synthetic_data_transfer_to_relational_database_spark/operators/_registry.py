"""Tiny decorator framework shared by operator modules.

Usage inside an operator module::

    QUERIES, ORACLE, q = make_registry()

    @q("join_inner", sql="SELECT ...")
    def join_inner(spark, sf_dir): ...

Cross-engine determinism rules every query here follows (so the driver's
order-insensitive value-hash matches DuckDB exactly):

- **Additive aggregates over doubles are banned.** Double summation order
  differs between engines (and between Spark runs — partial aggregation).
  Money-like 2-decimal doubles are summed as ``SUM(CAST(x AS
  DECIMAL(18,2)))`` (exact, order-independent) or as integer cents
  ``SUM(CAST(ROUND(x*100) AS BIGINT))``.
- **Averages** are expressed as ``CAST(sum_cents AS DOUBLE)/100.0/cnt`` —
  exact integers followed by IEEE divisions, which are deterministic and
  identical in both engines.
- **Row-wise double arithmetic is fine** (same IEEE ops on identical
  inputs ⇒ bit-identical).
- **``CAST(decimal AS DOUBLE)`` is NOT engine-identical** (r13 sf1
  find): Spark converts via Java BigDecimal (correctly rounded), DuckDB
  via two roundings that can land one ulp off — it bit the Q1 shape's
  sum_charge at the 6M-row spot-check scale and is LATENT in every
  direct decimal→double cast at untested magnitudes. The safe route is
  scaled-int64: ``CAST(CAST(dec * 10^s AS BIGINT) AS DOUBLE) / 10^s.0``
  (int64→double is a correctly-rounded hardware conversion everywhere,
  then one IEEE division) — see relational3._dbl_exact. Existing direct
  casts are green at every checked scale; new money outputs should use
  the scaled route from the start.
- Every ORDER-dependent op (limit, top-k, lag) carries a total-order
  tiebreaker key.
- Computed columns are aliased identically in Spark and SQL (driver
  compares columns sorted by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


def hash_bucket(key: Column, mod: int) -> Column:
    """Content-stable uniform bucket in [0, mod): the first 8 hex chars
    of md5(key) read as a 32-bit int, modulo ``mod``. THE one definition
    of the deterministic-assignment recipe (corpus_split's train/val/
    test, corpus_quality_resample's tiered keep, events_ab_test's arm
    assignment — each salts ``key`` its own way before calling). md5
    rather than xxhash64 so DuckDB oracles reproduce it bit-for-bit
    (the SQL twin is ``CAST(('0x' || substr(md5(<key>), 1, 8)) AS
    BIGINT) % mod``); stable across runs, engines, and repartitioning,
    which rand()/randomSplit are not."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % mod


def make_registry():
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}

    def q(name: str, sql: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            queries[name] = fn
            if sql is not None:
                oracle[name] = sql
            return fn

        return deco

    return queries, oracle, q
