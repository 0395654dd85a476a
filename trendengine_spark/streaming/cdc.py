"""Streaming CDC apply: change stream → MERGE into a parquet table.

The composition Structured Streaming doesn't ship for plain parquet:
a change-event stream (key, payload, optional delete flag) applied to
a target table with upsert semantics, one transaction per microbatch.
``foreachBatch`` hands each microbatch to
:func:`~trendengine_spark.sinks.merge_upsert` — the same one-anti-
join + union + crash-safe-swap primitive the batch API exposes, so
batch backfills and the live stream share MERGE semantics exactly.

Per-batch the stream side is deduplicated to the LAST change per key
(by a caller-named ordering column): a microbatch carrying several
updates for one key must apply only the newest, and a delete followed
by a re-insert inside one batch resolves to the re-insert.

At 100 TB the same shape runs against a transaction-log table format
(Delta/Iceberg ``MERGE``) for file-level pruning; state here is
bounded because each batch rewrites only via one join keyed on the
merge key (partition the target and merge per partition to avoid
rewriting cold data — see ``sinks.merge_upsert``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trendengine_spark.sinks import merge_upsert


def apply_cdc_stream(
    changes: DataFrame,
    target_path: str,
    key_cols: list[str],
    order_col: str,
    deleted_col: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "cdc_apply",
):
    """Start a streaming query applying ``changes`` to the parquet
    table at ``target_path``. Returns the StreamingQuery.

    ``order_col`` defines "newest" within a batch (event time or a
    log sequence number); ties broken by preferring the delete so a
    same-timestamp delete+update pair resolves deterministically.
    """
    spark = changes.sparkSession

    def apply_batch(batch: DataFrame, _epoch: int) -> None:
        if not batch.take(1):
            return
        order = [F.col(order_col).desc()]
        if deleted_col is not None:
            order.append(F.col(deleted_col).desc())
        w = Window.partitionBy(*key_cols).orderBy(*order)
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", order_col)
        )
        merge_upsert(
            spark,
            target_path,
            latest,
            key_cols,
            deleted_col=deleted_col,
            collect_stats=False,
        )

    writer = (
        changes.writeStream.foreachBatch(apply_batch)
        .outputMode("update")
        .queryName(query_name)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
