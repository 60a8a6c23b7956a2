"""Skew-handling join utility: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the plan-level
alternative for the pathological case AQE can't fix: ONE key so hot that
even a split partition's build side is a bottleneck, or a broadcast-
ineligible dimension joined on a hot key.

Mechanics: the skewed (fact) side gets a random salt in [0, n); the
compact (dim) side is exploded n× with every salt value; the join key
becomes (key, salt), spreading each hot key over n reducers. Cost: dim
side inflates n× — use only when dim ≪ fact (the usual skew shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON on`` with each hot key's load spread over
    ``n_salts`` reducers. The salt is deterministic —
    ``pmod(xxhash64(<all fact columns>, seed), n_salts)`` — so results
    are reproducible across runs and repartitionings (``rand()`` would
    not be)."""
    salt_f = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns], F.lit(seed)), F.lit(n_salts))
    f = fact.withColumn("__salt", salt_f.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")
