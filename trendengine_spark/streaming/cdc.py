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


def fold_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    target_path: str,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
) -> bool:
    """The marker-guarded microbatch fold behind
    :func:`maintain_rollup_stream` (module-level so the retry/no-op
    contract is directly testable). Returns True when the batch was
    folded, False when skipped as an already-applied retry.

    Atomic commit (r7, ADVICE fix): the applied batch id travels
    INSIDE the rollup directory — :func:`~trendengine_spark.sinks.
    maintain_rollup` writes ``_applied_batch`` into the staged dir
    before the swap, so one rename publishes data + marker together.
    The previous sidecar marker (written after the swap) left a crash
    window between swap and marker write in which a retry re-folded
    the batch and double-counted; now state and marker are never out
    of sync. An empty batch folds nothing and leaves the marker
    untouched (re-folding nothing is idempotent)."""
    import os

    from trendengine_spark.sinks import maintain_rollup

    # in-dir marker, else a pre-r7 sidecar on an upgraded table
    # (maintain_rollup migrates the sidecar into the dir on next fold)
    for marker in (
        os.path.join(target_path, "_applied_batch"),
        target_path.rstrip("/") + "._applied_batch",
    ):
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip() or -1):
                    return False  # retry of an already-folded batch
            break
    if batch_df.isEmpty():
        return True
    maintain_rollup(
        batch_df.sparkSession,
        target_path,
        batch_df,
        keys,
        agg_spec,
        applied_batch_id=batch_id,
    )
    return True


def maintain_rollup_stream(
    events: DataFrame,
    target_path: str,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    checkpoint: str | None = None,
    query_name: str = "rollup_maintain",
):
    """Streaming materialized rollup: every microbatch folds into the
    stored partial-aggregate state via
    :func:`~trendengine_spark.sinks.maintain_rollup` — the
    ``foreachBatch`` twin of the batch maintainer, so a live stream
    and a batch backfill produce the identical table (algebraic
    state merges are order-insensitive across batches).

    Unlike a streaming ``groupBy().agg()`` in complete mode, state
    lives in the TABLE, not the state store: restarts resume from the
    checkpoint without replaying history, and the rollup is readable
    by any engine mid-stream. Per-batch cost scales with
    |batch| + |rollup|.

    Exactly-once: an algebraic fold is NOT idempotent — a retried
    microbatch would double-count — so the applied batch id is
    recorded in an ``_applied_batch`` file INSIDE the rollup
    directory, staged with the new state and published by the SAME
    rename (see :func:`fold_rollup_batch`); any batch ≤ the marker
    is skipped. Crash windows resolve safely in both directions:
    crash before the swap → nothing applied (old state + old
    marker), retry re-folds; crash after the swap → new state + new
    marker are already both visible, retry no-ops.
    """
    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        fold_rollup_batch(
            batch_df, batch_id, target_path, keys, agg_spec
        )

    writer = (
        events.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
