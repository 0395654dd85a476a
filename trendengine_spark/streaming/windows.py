"""Windowed streaming aggregations.

Each builder takes *any* events-shaped DataFrame — batch or streaming
— and applies the identical plan; that is the point: the batch twins
in ``queries/streaming_batch.py`` are oracle-checked, and the
streaming path reuses the same expressions, so a green CORRECTNESS
row validates the window math and the streaming tests only need to
cover trigger/watermark mechanics.

Scale notes: streaming state is keyed by (group, window); the
watermark bounds state size (windows older than the horizon are
evicted and finalized). Use ``outputMode('append')`` + watermark in
production sinks so state cannot grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_parquet_source(
    spark: SparkSession,
    path: str,
    schema,
    watermark_col: str = "ts",
    watermark_delay: str = "6 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source (parquet directory) with a
    watermark. Schema must be explicit (streaming reads don't infer).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).withWatermark(watermark_col, watermark_delay)


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count + decimal-exact sum per key (identical
    expression to the oracle-checked ``stream_tumbling_window``)."""
    return (
        events.groupBy(key_col, F.window(ts_col, window))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,10)")), 4)
            .cast("double")
            .alias("total"),
        )
        .select(key_col, F.col("window.start").alias("ws"), "n_events", "total")
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window mean per key (streaming twin of
    ``stream_sliding_window``)."""
    return (
        events.groupBy(key_col, F.window(ts_col, window, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,10)")).cast("double")
                / F.count(value_col),
                6,
            ).alias("avg_value"),
        )
        .select(key_col, F.col("window.start").alias("ws"), "n_events", "avg_value")
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session windows with an inactivity gap (streaming twin of
    ``stream_session_window``). ``gap`` may be a fixed duration
    string OR a Column expression for DATA-DEPENDENT gaps (e.g.
    ``F.when(col('event_type') == 'purchase', '30 minutes')
    .otherwise('10 minutes')`` — the dynamic form the oracle-checked
    ``stream_session_dynamic_gap`` twin validates)."""
    return (
        events.groupBy(key_col, F.session_window(ts_col, gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,10)")), 4)
            .cast("double")
            .alias("total"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "total",
        )
    )
