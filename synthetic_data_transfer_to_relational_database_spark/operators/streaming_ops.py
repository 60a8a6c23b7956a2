"""Driver-facing streaming operators: each runs a Structured-Streaming
query to completion (Trigger.AvailableNow) and returns the materialized
result, so the SAME DuckDB oracles as the batch events_* operators apply —
streaming vs batch parity is checked by the driver itself.

stream_tumbling/stream_sliding run in complete mode (full result each
trigger). stream_session also runs in complete mode (update is
unsupported for streaming session windows; append would withhold
sessions the final watermark hasn't closed). stream_user_profile exercises the
applyInPandasWithState arbitrary-state path (rows-only: per-key emission
cadence is engine-defined, not SQL-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.events_stream import (
    run_to_completion,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)
from ..streaming.stateful import user_profile_stream
from ._registry import make_registry

QUERIES, ORACLE, q = make_registry()

_TUMBLING_SQL = """
    SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 3600) * 3600) AS TIMESTAMP) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
"""

_SLIDING_SQL = """
    WITH base AS (
      SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS b, ts, value
      FROM events
    ), assigned AS (
      SELECT b AS win_start, ts, value FROM base
      UNION ALL
      SELECT b - INTERVAL 30 MINUTE, ts, value FROM base
    )
    SELECT win_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM assigned
    WHERE ts >= win_start AND ts < win_start + INTERVAL 60 MINUTE
    GROUP BY win_start
"""

_SESSION_SQL = """
    WITH ordered AS (
      SELECT user_id, ts, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ), grouped AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM grouped
    GROUP BY user_id, session_id
"""


@q("stream_tumbling", sql=_TUMBLING_SQL)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_completion(tumbling_agg(stream_events(spark, sf_dir)), "complete")


@q("stream_sliding", sql=_SLIDING_SQL)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_completion(sliding_agg(stream_events(spark, sf_dir)), "complete")


@q("stream_session", sql=_SESSION_SQL)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_completion(session_agg(stream_events(spark, sf_dir)), "complete")


@q("stream_user_profile")
def stream_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_completion(user_profile_stream(stream_events(spark, sf_dir)), "update")


_DEDUP_SQL = """
    SELECT event_id, MIN(user_id) AS user_id, MIN(event_type) AS event_type
    FROM events
    GROUP BY event_id
"""


@q("stream_dedup", sql=_DEDUP_SQL)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on the event key: dropDuplicatesWithinWatermark
    bounds state to the watermark horizon (a plain streaming dropDuplicates
    keeps EVERY key forever — unbounded state). events has unique event_ids,
    so the dedup is an identity the batch GROUP BY oracle reproduces; the
    point is the plan: state keyed by event_id, expired as the watermark
    passes — the standard at-least-once → exactly-once ingest repair."""
    from pyspark.sql import functions as F

    e = stream_events(spark, sf_dir)
    deduped = (
        e.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return run_to_completion(deduped, "append")


_INTERVAL_JOIN_SQL = """
    SELECT c.user_id AS c_user,
           c.event_id AS click_id,
           c.ts AS click_ts,
           v.event_id AS view_id,
           v.ts AS view_ts
    FROM events c JOIN events v
      ON v.user_id = c.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL 30 MINUTE
"""


@q("stream_jdbc_exactly_once")
def stream_jdbc_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end run of the exactly-once transactional JDBC streaming
    sink (streaming/batch_sink.write_stream_to_jdbc): the events stream's
    tumbling aggregate drains run-to-completion into an embedded Derby
    table — per micro-batch a staging bulk-append then ONE transaction
    publishing staging + ledger row — the stream is then RESTARTED
    against the same checkpoint (recovery drill: replayed/empty batches
    must not duplicate rows), and the result is the target table read
    back over spark.read.jdbc.

    Rows-only by design: the payload matches the stream_tumbling oracle
    semantically, but the value under test is the sink protocol
    (staging/transaction/ledger/replay), and a JDBC round trip does not
    preserve Spark-exact column typing for hash comparison. Transactional
    semantics (checkpoint replay, rollback atomicity, orphan-staging
    reap) are pytest-locked in tests/test_streaming.py; this entry is the
    driver-visible surface. Derby stands in for the reference's MSSQL
    target (run_engine.py:255-266) — same JDBC path, in-process."""
    import tempfile

    from ..sinks.jdbc import JdbcTarget
    from ..streaming.batch_sink import write_stream_to_jdbc

    work = tempfile.mkdtemp(prefix="sdt_stream_jdbc_")
    target = JdbcTarget(url=f"jdbc:derby:{work}/db;create=true", dialect="derby")
    agg = tumbling_agg(stream_events(spark, sf_dir))
    for _ in range(2):  # second start = recovery drill against the same checkpoint
        write_stream_to_jdbc(
            agg,
            target,
            table="EVENTS_TUMBLING",
            checkpoint_dir=f"{work}/ckpt",
            available_now=True,
        ).awaitTermination()
    back = spark.read.jdbc(
        target.url, "EVENTS_TUMBLING", properties=target.jdbc_properties()
    )
    back = back.toDF(*[c.lower() for c in back.columns])  # Derby may uppercase
    return back.select(
        "win_start",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("value_cents").cast("long").alias("value_cents"),
    )


@q("stream_interval_join", sql=_INTERVAL_JOIN_SQL)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (clicks x preceding views per user,
    30-min bound), both sides watermarked so Spark can EVICT join state
    older than (watermark - bound) — without the event-time range
    condition the buffers grow forever and append mode rejects the join.
    The batch twin is the relational range-join family; the run-to-
    completion result matches the batch range-join oracle row-for-row."""
    from ..streaming.joins import clicks_views_within

    return run_to_completion(
        clicks_views_within(stream_events(spark, sf_dir), minutes=30), "append"
    )
