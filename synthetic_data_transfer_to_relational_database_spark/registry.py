"""Aggregates every operator module's QUERIES/ORACLE dicts for the driver
contract (__spark_entry__.py). Import side-effect free; modules register
via the decorator in operators/_registry.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    dedup,
    events,
    generator_ops,
    multimodal,
    relational,
    relational2,
    scalars,
    similarity,
    streaming_ops,
    text,
)

# Registration order is also the driver's sweep order, and the round-1
# sweep stopped at its budget before reaching the tail. The flagship
# LLM-pipeline packs (dedup, similarity, multimodal, generator, streaming)
# therefore register FIRST, right after the relational core, so a
# truncated sweep still judges every operator family.
_MODULES = [
    relational,
    dedup,
    similarity,
    multimodal,
    generator_ops,
    streaming_ops,
    relational2,
    scalars,
    events,
    text,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
