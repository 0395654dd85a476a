"""Stream-stream joins and streaming deduplication.

Completes the streaming surface (SURVEY §2.6): an interval-bounded
stream-stream equi-join (purchases ⋈ prior views within a horizon)
and watermark-bounded deduplication. Both are append-mode-safe: the
time bound + watermark let Spark evict join/dedup state once the
watermark passes the horizon, so state is O(events within horizon),
not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_views_purchases(
    purchases: DataFrame,
    views: DataFrame,
    horizon: str = "1 hour",
    key_col: str = "user_id",
) -> DataFrame:
    """Each purchase joined to the same user's views within
    ``[purchase_ts - horizon, purchase_ts]`` — the attribution join.
    Both inputs must carry watermarks when streaming; the interval
    condition is what bounds the join state."""
    p = purchases.select(
        F.col(key_col).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = views.select(
        F.col(key_col).alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"interval {horizon}"))
    )
    return p.join(v, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "p_ts", "purchase_value", "view_id", "v_ts",
    )


def interval_left_join_views_purchases(
    purchases: DataFrame,
    views: DataFrame,
    horizon: str = "1 hour",
    key_col: str = "user_id",
) -> DataFrame:
    """LEFT OUTER variant of the attribution join: every purchase is
    emitted, un-attributed ones with null view columns. In streaming
    this is the semantics corner the inner join avoids: the null row
    for an unmatched purchase can only be emitted once the WATERMARK
    has passed its join horizon (no earlier view can still arrive),
    so outer results trail the inner ones by the watermark delay —
    state stays bounded exactly as in the inner case."""
    p = purchases.select(
        F.col(key_col).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = views.select(
        F.col(key_col).alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"interval {horizon}"))
    )
    return p.join(v, cond, "left_outer").select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "p_ts", "purchase_value", "view_id", "v_ts",
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    streaming: bool = True,
) -> DataFrame:
    """Drop duplicate events by ``keys``: in streaming mode uses
    ``dropDuplicatesWithinWatermark`` (state evicted past the
    watermark — the only unbounded-safe form); in batch mode plain
    ``dropDuplicates`` for the oracle-comparable twin."""
    if streaming:
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
