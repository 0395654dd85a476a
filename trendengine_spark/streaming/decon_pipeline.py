"""Streaming semantic decontamination: "clean as it lands".

The streaming twin of :func:`~trendengine_spark.operators.similarity.
semantic_decontaminate`, composed the same way the streaming dedup
pipeline composes the MinHash index with the versioned-table layer:
each microbatch of incoming training vectors is LSH-probed against
the (static, broadcastable) eval set, contaminated rows are dropped,
and the survivors are published to a manifest-versioned table with
the streaming ``batch_id`` recorded at commit — so a replayed
microbatch (crash between commit and checkpoint) is a per-table
no-op and the admitted corpus is exactly-once.

The eval set is tiny next to the stream (benchmark suites are
thousands of items, corpora are billions), so re-signaturing it per
batch costs one broadcast-sized pass — no index maintenance, no
state beyond the versioned table markers. The batch side is
signatured fresh each trigger (its rows are new by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from trendengine_spark.operators.similarity import semantic_decontaminate
from trendengine_spark.tablelog import publish_versioned_batch


def decon_stream(
    stream: DataFrame,
    eval_df: DataFrame,
    corpus_path: str,
    threshold: float = 0.95,
    checkpoint: str | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> StreamingQuery:
    """Admit only eval-clean vectors from ``stream`` into the
    versioned corpus at ``corpus_path``. ``availableNow`` trigger
    (drain-and-stop; pass a checkpoint for restartable production
    use). Replays are idempotent via the batch-id marker."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _m, survivors = semantic_decontaminate(
            batch_df.select(id_col, vec_col),
            eval_df,
            threshold=threshold,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            **lsh_kwargs,
        )
        publish_versioned_batch(survivors, batch_id, corpus_path)

    w = stream.writeStream.foreachBatch(_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()
