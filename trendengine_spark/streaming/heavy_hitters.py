"""Sharded streaming Misra-Gries heavy hitters — the streaming twin of
:func:`trendengine_spark.operators.profile.heavy_hitters_mg` (no
reference analog; SURVEY §2.6 streaming family).

A global frequent-keys summary over an unbounded stream with BOUNDED
state: keys are hashed (``xxhash64``) and sharded by ``hash % shards``;
each shard's ``applyInPandasWithState`` instance folds its microbatch
rows into a Misra-Gries summary of at most ``counters`` weighted keys
(the same vectorized value_counts + mergeable-summaries compression as
the batch operator). Every microbatch each touched shard re-emits its
current summary with a monotone ``seq`` number; the reader keeps the
max-``seq`` row set per shard and unions the summaries.

Guarantees: a key's rows all land in ONE shard, so its undercount is
bounded by N_shard/(counters+1) <= N/(counters+1) — sharding only
tightens the classical bound. Any key with global count >
N/(counters+1) is therefore present in the emitted union; an exact
verification pass over those candidates (as in the batch operator)
yields the exact heavy-hitter set.

Scale: state is O(shards * counters) rows TOTAL regardless of stream
length or key cardinality — the property that makes frequent-key
monitoring viable on an unbounded 100 TB/day stream where any exact
per-key aggregation state grows without bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("mg_key", T.LongType(), True),
        T.StructField("mg_w", T.LongType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("keys", T.ArrayType(T.LongType()), True),
        T.StructField("weights", T.ArrayType(T.LongType()), True),
    ]
)


def _compress(acc: "pd.Series", k: int) -> "pd.Series":
    if len(acc) <= k:
        return acc
    vals = acc.to_numpy()
    cut = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
    acc = acc - cut
    return acc[acc > 0]


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    counters: int = 1024,
    shards: int = 32,
) -> DataFrame:
    """Attach the sharded MG summarizer to a (streaming or batch-test)
    frame. Output: each microbatch, one row per (shard, surviving key)
    with the shard's current summary weight and a per-shard monotone
    ``seq`` — reader keeps max-seq rows per shard."""

    def fn(key, batches, state):
        if state.exists:
            seq, keys, weights = state.get
            acc = pd.Series(
                np.asarray(weights, dtype="int64"),
                index=np.asarray(keys, dtype="int64"),
            )
        else:
            seq, acc = 0, pd.Series(dtype="int64")
        for pdf in batches:
            acc = acc.add(pdf["mg_key"].value_counts(), fill_value=0)
            acc = _compress(acc, counters)
        seq += 1
        acc = acc.astype("int64")
        state.update((int(seq), acc.index.tolist(), acc.tolist()))
        yield pd.DataFrame(
            {
                "shard": np.full(len(acc), key[0], dtype="int32"),
                "seq": np.full(len(acc), seq, dtype="int64"),
                "mg_key": acc.index.to_numpy(),
                "mg_w": acc.to_numpy(),
            }
        )

    keyed = events.select(
        F.xxhash64(F.col(key_col).cast("string")).alias("mg_key")
    ).withColumn("shard", F.pmod(F.col("mg_key"), F.lit(shards)).cast("int"))
    return keyed.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_summaries(emitted: DataFrame) -> DataFrame:
    """Reduce an update-mode sink's accumulated emissions to the
    newest summary per shard (max ``seq``), i.e. the stream's current
    global MG summary as (mg_key, mg_w) rows."""
    e = emitted.alias("e")
    mx = (
        emitted.groupBy("shard")
        .agg(F.max("seq").alias("max_seq"))
        .select(F.col("shard").alias("mx_shard"), "max_seq")
    )
    return e.join(
        mx,
        (F.col("e.shard") == F.col("mx_shard")) & (F.col("e.seq") == F.col("max_seq")),
    ).select("e.mg_key", "e.mg_w")
