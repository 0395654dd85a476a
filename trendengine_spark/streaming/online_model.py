"""Online linear-model maintenance over a stream — model training as
a streaming aggregation.

The exact-Gram formulation (:mod:`..operators.linmodel`) makes the
sufficient statistics of a least-squares fit ALGEBRAIC aggregates
(sums of products), and algebraic aggregates are exactly what
Structured Streaming maintains incrementally. So an always-fresh
quality model costs nothing beyond a streaming group-by:

- state per group = the (d+2)·(d+1)/2 running moment sums — bounded,
  mergeable, exact for integer features (no drift, no approximation;
  the streaming totals are bit-equal to a batch pass over the same
  rows, asserted in tests);
- each microbatch ends with a bounded driver-side (d+1)×(d+1) solve
  over the updated groups — historical data is NEVER re-read;
- the learned weights-per-group stream out through a callback (or any
  sink), versioned per batch id.

This is the streaming twin of ``fit_linear``: same moments, same
solver, same answer — the only difference is WHO folds the sums
(Spark's streaming state store instead of one batch shuffle).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from trendengine_spark.operators.linmodel import gram_moments, solve_normal


def online_fit(
    stream: DataFrame,
    features: Sequence[str],
    target: str,
    group_cols: Sequence[str] = (),
    ridge: float = 0.0,
    on_update: Callable[[int, dict], None] | None = None,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Maintain per-group linear models over ``stream``.

    Runs the :func:`gram_moments` aggregation in complete output mode
    (group cardinality is the model count — bounded by construction)
    and, per microbatch, solves the normal equations for every group
    and hands ``{group_tuple: solve_normal(...)}`` to ``on_update``
    with the batch id. Uses ``availableNow`` so callers drain a
    backlog and stop; pass a checkpoint for restartable production
    use. After a crash/restart, foreachBatch may re-fire with an
    already-seen batch id — make the sink idempotent keyed by batch
    id (the discipline every versioned writer here follows).
    """
    cols = [*features, target]
    g = gram_moments(stream, cols, group_cols)

    def _batch(df: DataFrame, batch_id: int) -> None:
        models = {}
        for r in df.collect():  # bounded: one row per group
            m = r.asDict()
            key = tuple(m[c] for c in group_cols)
            models[key] = solve_normal(m, features, target, ridge)
        if on_update is not None:
            on_update(batch_id, models)

    w = g.writeStream.outputMode("complete").foreachBatch(_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def online_pca(
    stream: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    on_update: Callable[[int, dict], None] | None = None,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Always-fresh PCA over an embedding stream — same principle as
    :func:`online_fit`: the second-moment sums are algebraic, so the
    streaming group-by maintains them exactly (state = d² numbers
    TOTAL), and each microbatch ends with the driver-side eigh over
    the current snapshot. ``on_update(batch_id, fit_dict)`` receives
    the same structure :func:`~..operators.pca.pca_fit` returns; the
    stream total is bit-equal to a batch fit over the same rows
    (integer-exact for the counts, float-sum associativity noise only
    where a batch shuffle would have it too — asserted in tests at
    1e-12)."""
    from trendengine_spark.operators.pca import (
        embedding_moments,
        fit_from_moment_rows,
    )

    g = embedding_moments(stream, dim, vec_col)

    def _batch(df: DataFrame, batch_id: int) -> None:
        rows = df.collect()  # bounded: d(d+1)/2 + d + 1 rows
        if on_update is not None and rows:
            on_update(batch_id, fit_from_moment_rows(rows, dim))

    w = g.writeStream.outputMode("complete").foreachBatch(_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()
