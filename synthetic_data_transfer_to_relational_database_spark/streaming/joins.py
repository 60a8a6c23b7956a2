"""Stream-stream join: clicks ⋈ views within a time bound, both sides
watermarked.

Spark buffers both sides in state; the watermarks + the time-range join
condition bound how much state is kept (without them the buffers grow
forever — the join would be rejected in append mode). This is the
streaming face of the batch as-of/range join family (relational2.join_asof,
relational.join_range).

Scale shape: one shuffle per side on user_id; state store holds only rows
younger than (watermark − join window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_views_within(events: DataFrame, minutes: int = 30) -> DataFrame:
    """Pairs each click with every view by the same user in the preceding
    ``minutes``. Event-time bounds on BOTH sides let Spark evict state."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "0 seconds")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "0 seconds")
    )
    return clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {minutes} MINUTES")),
        "inner",
    ).select("c_user", "click_id", "click_ts", "view_id", "view_ts")
