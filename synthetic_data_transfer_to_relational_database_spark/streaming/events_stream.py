"""Structured-Streaming variants of the events_* window operators.

The reference has no streaming surface (SURVEY.md §2.2); this is the
BASELINE.json extension surface. The design rule: the STREAMING plan reuses
the IDENTICAL aggregation expressions as the batch operators in
operators/events.py — same window spec, same cents arithmetic, same
aliases — so batch output is the ground truth for streaming output
(verified in tests/test_streaming.py and by the driver's oracle, which
compares the run-to-completion streaming result against the same DuckDB
SQL as the batch operator).

Execution model notes (the part that matters at scale):

- File-source streams: ``readStream.parquet`` over the testdata directory.
  One parquet file ⇒ ``Trigger.AvailableNow`` processes it as exactly one
  micro-batch, which is what makes update-mode results deterministic here.
  On a real cluster the same plan runs over a growing directory / Kafka
  with no code change.
- Watermarks bound state: ``withWatermark('ts', delay)`` lets Spark drop
  window state older than ``max(event time) − delay``. For the
  run-to-completion parity queries we use complete/update mode (nothing
  may be dropped — the oracle sees all windows); the append-mode +
  watermark late-data path is exercised in tests where partial emission
  is the EXPECTED semantics. The exact late-data policy is pinned by an
  out-of-order multi-batch replay drill (tests/test_streaming.py
  ``*_late_event_*``): a late row still MERGES while its window's state
  is live — including in the very batch whose watermark finalizes the
  window, since finalization+eviction happen at batch END — and is
  DROPPED (no recount, no duplicate emission, no watermark movement)
  once the window has been evicted; append emits each window exactly
  once and withholds the open tail.
- Session windows shuffle once on (user_id); Spark merges overlapping
  session state per key — the streaming analogue of the batch
  gap-and-islands plan.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..sources.tables import events_ts_unit

# Schema must be declared for file streams (no inference mid-stream).
# The ts field's declared type depends on the file's physical annotation
# (see sources/tables.py::events_ts_unit): TIMESTAMP(NANOS) files are read
# as raw long (legacy conf) and floored to micros; TIMESTAMP(MICROS) files
# are read as TIMESTAMP_NTZ and cast (session TZ is pinned UTC, so the
# cast is value-identical). Both paths end at session-TZ TimestampType —
# the same normalization as the batch loader.
def _events_schema(ts_unit: str) -> StructType:
    ts_type = LongType() if ts_unit == "ns" else TimestampNTZType()
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


_SINK_IDS = itertools.count()


def _assert_uniform_ts_unit(sf_dir: str, expected: str) -> None:
    """Startup guard for the mixed-annotation hazard documented in
    ``stream_events``: every parquet file in the watched directory whose
    name could ever match the events glob must carry the SAME ts
    annotation as the sniffed one. Raises instead of letting an
    ns-declared stream silently div-1000 a MICROS file."""
    import glob as _glob
    import os as _os

    from ..sources.tables import parquet_ts_unit

    for p in sorted(_glob.glob(_os.path.join(sf_dir, "events*.parquet"))):
        unit = parquet_ts_unit(p)
        if unit != expected:
            raise ValueError(
                f"mixed events ts annotations in {sf_dir}: {p} is "
                f"TIMESTAMP({unit.upper()}) but the stream was declared "
                f"for {expected.upper()} — regenerate the directory in "
                "one layout (fixed-schema file streams cannot mix them)"
            )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table (file source, declared schema).

    A file stream's schema is immutable for the stream's lifetime, so the
    ts layout is sniffed from the file present at start and the
    normalization is EXACTLY the batch loader's (unconditional
    ``div 1000`` for ns files) — batch output stays bit-identical ground
    truth for streaming output for every value, including pre-1973
    instants. The corollary is that a watched directory must hold ONE
    layout for the stream's lifetime:

    - us-declared stream, NANOS file arrives: Spark 4 refuses to read
      TIMESTAMP(NANOS) into the declared NTZ column — loud failure.
    - ns-declared stream, MICROS file arrives: both annotations are
      physically INT64, so the raw-long read succeeds and the div-1000
      produces garbage — NOT detectable in-plan (a magnitude heuristic
      would instead silently misread legitimate pre-1973 ns values and
      diverge from batch). Mixed-layout directories are operator error:
      regenerate the directory in one layout, as with any fixed-schema
      file stream. Two mitigations: the glob filter pins the stream to
      the single file name ``events.parquet`` (a second, differently-
      annotated file can never match), and ``_assert_uniform_ts_unit``
      fails construction LOUDLY if the directory already holds
      mixed-annotation events files — so the silent path requires
      replacing the file in place mid-stream.

    The legacy nanosAsLong conf is set session-wide here (NOT scoped like
    the batch loader's): a file stream re-resolves parquet footers at
    every micro-batch, so the conf must outlive this call for the
    stream's lifetime.
    """
    ts_unit = events_ts_unit(sf_dir)
    _assert_uniform_ts_unit(sf_dir, ts_unit)
    if ts_unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # File streams take a DIRECTORY (they watch it for new files); select
    # just the events table out of it with a glob filter.
    raw = (
        spark.readStream.schema(_events_schema(ts_unit))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_unit == "ns":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _cents(c):
    return F.round(F.col(c) * 100).cast("long")


def tumbling_agg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Same expressions as operators/events.py::events_tumbling."""
    e = events.withWatermark("ts", watermark) if watermark else events
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(_cents("value")).alias("value_cents"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "value_cents")
    )


def sliding_agg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    e = events.withWatermark("ts", watermark) if watermark else events
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(_cents("value")).alias("value_cents"))
        .select(F.col("w.start").alias("win_start"), "n_events", "value_cents")
    )


def session_agg(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Session windows (30-min gap). Streaming session_window REQUIRES a
    watermark; 0s means nothing is considered late (parity mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(_cents("value")).alias("value_cents"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


def run_to_completion(sdf: DataFrame, output_mode: str) -> DataFrame:
    """Drain a finite stream with Trigger.AvailableNow into a memory sink
    and return the materialized result as a batch DataFrame.

    The memory sink is driver-resident — fine for test/driver scale; on a
    cluster the same query writes to parquet/Kafka with exactly-once file
    sink semantics instead.
    """
    name = f"sdt_stream_sink_{next(_SINK_IDS)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
