"""Streaming KMV distinct-count sketches — the streaming twin of the
batch `approx_distinct_kmv` query (no reference analog; SURVEY §2.6
streaming family).

A per-group distinct-count estimate over an unbounded stream with
BOUNDED state: the KMV sketch (the k smallest hash values seen) is a
commutative, idempotent merge — folding each microbatch's hashes into
the state and re-truncating to k is EXACTLY the batch sketch of the
union, so the streaming estimate is bit-equal to a batch pass over
the same rows (tested), duplicates and replays are absorbed for free
(min-union is idempotent), and state is k longs per group regardless
of stream length or key cardinality.

Same engine-portable hash family as the batch query (md5 → first 15
hex chars → 60-bit int), so a streaming estimate can be checked
against any engine's batch computation over the landed data — the
cross-engine discipline carried into the streaming layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

#: 2^60 as an exact double, matching the batch estimator constant.
_M = float(1 << 60)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("n_sketch", T.IntegerType(), True),
        T.StructField("kth_hash", T.LongType(), True),
        T.StructField("est_distinct", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("hashes", T.ArrayType(T.LongType()), True),
    ]
)


def kmv_estimate(hashes: np.ndarray, k: int) -> tuple[int, int | None, float]:
    """(n_sketch, kth_hash, estimate) from a sorted unique hash array
    — the shared math of the batch query and the streaming state:
    |D| < k ⇒ the sketch IS the set (exact); else (k−1)·2⁶⁰/h₍ₖ₎."""
    n = len(hashes)
    if n < k:
        return n, None, float(n)
    kth = int(hashes[k - 1])
    return k, kth, (k - 1) * _M / float(kth)


def streaming_kmv_distinct(
    events: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    k: int = 64,
) -> DataFrame:
    """Attach the per-group KMV summarizer to a (streaming or
    batch-test) frame. Each microbatch every touched group re-emits
    (group, seq, n_sketch, kth_hash, est_distinct) with a monotone
    per-group ``seq``; the reader keeps max-seq per group
    (:func:`latest_estimates`)."""

    def fn(key, batches, state):
        if state.exists:
            seq, hashes = state.get
            acc = np.asarray(hashes, dtype="int64")
        else:
            seq, acc = 0, np.empty(0, dtype="int64")
        for pdf in batches:
            acc = np.union1d(acc, pdf["h"].to_numpy(dtype="int64"))
            if len(acc) > k:
                acc = acc[:k]  # union1d returns sorted unique
        seq += 1
        state.update((int(seq), acc.tolist()))
        n, kth, est = kmv_estimate(acc, k)
        yield pd.DataFrame(
            {
                "group": pd.Series([key[0]], dtype="object"),
                "seq": pd.Series([seq], dtype="int64"),
                "n_sketch": pd.Series([n], dtype="int32"),
                "kth_hash": pd.Series(
                    [kth], dtype="int64" if kth is not None else "float64"
                )
                if kth is not None
                else pd.Series([pd.NA], dtype="Int64"),
                "est_distinct": pd.Series([est], dtype="float64"),
            }
        )

    keyed = events.select(
        F.col(group_col).cast("string").alias("group"),
        F.expr(
            f"CAST(conv(substr(md5(CAST(`{key_col}` AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    return keyed.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_estimates(emitted: DataFrame) -> DataFrame:
    """Reduce an update-mode sink's accumulated emissions to the
    newest estimate per group (max ``seq``)."""
    e = emitted.alias("e")
    mx = (
        emitted.groupBy("group")
        .agg(F.max("seq").alias("max_seq"))
        .select(F.col("group").alias("mx_group"), "max_seq")
    )
    return e.join(
        mx,
        (F.col("e.group") == F.col("mx_group"))
        & (F.col("e.seq") == F.col("max_seq")),
    ).select("e.group", "e.n_sketch", "e.kth_hash", "e.est_distinct")
