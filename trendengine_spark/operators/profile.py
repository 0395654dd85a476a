"""Data-profiling operators (pipeline ops tooling).

At 100 TB the two questions a pipeline operator asks before tuning are
"is this join key skewed?" (→ :func:`key_skew_profile`, the diagnosis
that motivates :func:`~trendengine_spark.operators.relational.salted_join`
or AQE skew split) and "how dirty is this table?" (→
:func:`null_profile`). Both are single-aggregation plans: the skew
profile is one groupBy + one tiny top-k collect-free roll-up, the null
profile one full-scan aggregate with no shuffle wider than a single
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Key-distribution profile for a prospective join/groupBy key:
    one row with total rows, distinct keys, the max and mean per-key
    counts, the skew ratio (max/mean — the straggler multiplier a
    shuffle on this key would suffer), and the ``top_k`` hottest keys
    with counts. All exact; the only shuffle is the groupBy on the
    key itself."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_cnt"))
    # hottest keys via orderBy().limit() → TakeOrderedAndProject:
    # per-partition top-k + driver merge of top_k·partitions rows —
    # scale-safe at any key cardinality (a global row_number window
    # here would funnel every key into one task).
    # hot keys flatten to "key:cnt" strings — engine-portable (struct
    # arrays stringify differently per client) and driver-hashable
    top = (
        counts.orderBy(F.desc("_cnt"), F.col(key_col).asc())
        .limit(top_k)
        .select(
            (-F.col("_cnt")).alias("_neg"),
            F.col(key_col).alias("_k"),
            F.concat_ws(
                ":", F.col(key_col).cast("string"), F.col("_cnt").cast("string")
            ).alias("hot"),
        )
    )
    agg = counts.agg(
        F.sum("_cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_cnt").alias("max_per_key"),
        (F.sum("_cnt") / F.count(F.lit(1))).alias("mean_per_key"),
    ).withColumn(
        "skew_ratio", F.round(F.col("max_per_key") / F.col("mean_per_key"), 6)
    )
    # collect_list order is not contractual — sort by (count desc,
    # key asc) inside the aggregate (array_sort on typed structs) for
    # determinism
    hot = top.agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_neg", "_k", "hot"))),
                lambda s: s["hot"],
            ),
        ).alias("hot_keys")
    )
    return agg.join(hot).select(
        "n_rows",
        "n_keys",
        "max_per_key",
        F.round("mean_per_key", 6).alias("mean_per_key"),
        "skew_ratio",
        "hot_keys",
    )


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column completeness: one output row per profiled column with
    row count, null count and null fraction. One full-scan aggregate
    (all counters partial-combined map-side), then a stack to long
    form — no shuffle wider than one row."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
    one = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `_null_{c}`" for c in cols)
    return one.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack_expr}) AS (column_name, n_null)",
    ).select(
        "column_name",
        "n_rows",
        "n_null",
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_frac"),
    )


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, buckets: int
) -> DataFrame:
    """Equi-width histogram of a numeric column: one ``width_bucket``
    projection + one hash aggregate — a single full-scan pass whose
    shuffle carries ≤ ``buckets + 2`` rows (underflow bucket 0 and
    overflow bucket ``buckets + 1`` included, so the histogram always
    accounts for every row). Bucket edges are reconstructed
    arithmetically from the bucket id, so the output is
    self-describing. The at-scale histogram tool when an approximate
    quantile sketch (``approx_percentile``) is not enough to see
    multi-modality or out-of-range mass.

    The bucket id is explicit SQL-standard ``width_bucket``
    arithmetic (floor of the scaled offset, clamped) rather than the
    builtin — DuckDB lacks the function, and spelling the IEEE ops
    out guarantees both engines bucket identically at the edges."""
    w = (hi - lo) / buckets
    v = F.col(col)
    b = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(buckets + 1))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(w)) + 1)
    )
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            (F.lit(lo) + (F.col("bucket") - 1) * F.lit(w)).alias("lo_edge"),
            (F.lit(lo) + F.col("bucket") * F.lit(w)).alias("hi_edge"),
            "n_rows",
        )
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    denom: int = 128,
    counters: int | None = None,
    max_exact_distinct: int = 100_000_000,
) -> DataFrame:
    """Cardinality-gated frequent-key detection (r12, VERDICT r11
    task 5): the exact ``GROUP BY key HAVING count(*)·denom > N``
    plan and the bounded-state Misra-Gries plan
    (:func:`heavy_hitters_mg`) return PROVABLY EQUAL answers — the
    choice between them is pure cost, and the measured cost model
    (tools/stress_heavy_hitters.py, SCALE.md r8) says the exact JVM
    hash aggregate wins until DISTINCT-KEY CARDINALITY makes its
    shuffle the bottleneck (O(distinct) rows of network + a
    skew-prone reduce vs MG's O(partitions·counters) KBs; on one box
    exact still won at 1.8·10⁷ keys, 2.36 s vs 4.42 s). This wrapper
    measures the deciding quantity and dispatches:

    1. One O(1)-state sketch aggregate estimates the key cardinality
       (``approx_count_distinct`` — native HLL, one partial+final
       pass, deterministic; the same mergeable-sketch estimate the
       oracle-backed KMV operator computes, chosen here in its
       JVM-native form because the gate affects ONLY plan choice:
       both branches produce the identical result set, so sketch
       error can never change an answer, only a plan).
    2. ``estimate ≤ max_exact_distinct`` → the exact aggregate (the
       verify phase of the MG plan, applied to the whole table).
    3. Otherwise → the Misra-Gries summary plan.

    The default gate (10⁸) is deliberately far above any single-box
    point and well below the 10⁹+ regime where the exact plan's
    shuffle measurably degrades; equality across the boundary is
    pinned by tests driving both branches on the same data."""
    est = df.agg(
        F.approx_count_distinct(key_col).alias("d")
    ).collect()[0]["d"]  # bounded: one row
    if est > max_exact_distinct:
        return heavy_hitters_mg(df, key_col, denom, counters)
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * denom > F.col("n_total"))
        .select(key_col, "cnt")
        .orderBy(key_col)
    )


def heavy_hitters_mg(
    df: DataFrame,
    key_col: str,
    denom: int = 128,
    counters: int | None = None,
) -> DataFrame:
    """Frequent-key detection with BOUNDED state: Misra-Gries candidate
    generation + an exact verification pass. Returns exactly the keys
    whose count satisfies ``count * denom > N`` (N = total rows), i.e.
    frequency strictly above ``1/denom`` — identical to the exact
    ``GROUP BY key HAVING count(*)*denom > N`` answer, but without ever
    shuffling the full key cardinality.

    Plan (three phases, all distributed):

    1. **Per-partition summaries** (``mapInPandas``): each partition
       folds its rows into a Misra-Gries summary of at most
       ``counters`` weighted keys. Per Arrow batch the update is
       vectorized pandas (``value_counts`` + mergeable-summaries
       compression: subtract the (k+1)-th largest weight, keep
       strictly positive) — no per-row Python.
    2. **Summary merge**: the <= P*counters summary rows (a few KB per
       partition regardless of input size) shuffle into ONE group and
       merge under the same rule -> <= counters candidate keys.
    3. **Exact verify**: a broadcast semi-join prunes the table to
       candidate keys, an exact count plus a 1-row total broadcast
       keep precisely the keys with ``cnt * denom > n_total``.

    Exactness: merged Misra-Gries undercounts any key by at most
    N/(counters+1) (mergeable-summaries bound, preserved under
    arbitrary merge trees). With ``counters >= denom`` (default
    ``8*denom``), every key with true count > N/denom therefore keeps
    a positive merged weight and reaches the verify pass, so the
    verified output EQUALS the exact answer — which is what the DuckDB
    oracle checks. The summaries run over ``xxhash64`` of the key (8
    bytes/row through Arrow, vectorized int64 counts) — a hash
    collision can only MERGE keys, so a true heavy hitter's hash
    always clears the summary threshold too; collisions at worst add
    candidates, and the verify pass is exact on the original keys.

    Cost model (measured, tools/stress_heavy_hitters.py): on one box
    the JVM hash aggregate wins — partial agg + local shuffle is
    memcpy-cheap. The MG pass exists for the 1000-executor regime the
    exact plan degrades in: its shuffle volume is O(partitions *
    counters) rows (a few KB each) versus O(distinct keys) for the
    exact plan — at 10^9+ distinct keys that is GBs of network and a
    skew-prone reduce; MG's verify pass shuffles only the <= counters
    candidates. Use the exact plan until key cardinality or reduce
    skew becomes the bottleneck; the two answers are provably equal.
    """
    import numpy as np
    import pandas as pd

    if counters is None:
        counters = 8 * denom
    if counters < denom:  # pragma: no cover - authoring guard
        raise ValueError("counters must be >= denom for the exactness bound")
    k = counters

    def _compress(acc: "pd.Series") -> "pd.Series":
        if len(acc) <= k:
            return acc
        vals = acc.to_numpy()
        # (k+1)-th largest weight; subtracting it keeps <= k positive
        cut = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
        acc = acc - cut
        return acc[acc > 0]

    def mg_partition(batches):
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            acc = acc.add(pdf["mg_key"].value_counts(), fill_value=0)
            acc = _compress(acc)
        if len(acc):
            yield pd.DataFrame(
                {"mg_key": acc.index.to_numpy(), "mg_w": acc.to_numpy().astype("int64")}
            )

    def mg_merge(pdf):
        acc = _compress(pdf.groupby("mg_key")["mg_w"].sum())
        return pd.DataFrame(
            {"mg_key": acc.index.to_numpy(), "mg_w": acc.to_numpy().astype("int64")}
        )

    key_hash = F.xxhash64(F.col(key_col).cast("string"))
    slim = df.select(key_hash.alias("mg_key"))
    summaries = slim.mapInPandas(mg_partition, "mg_key long, mg_w long")

    def mg_merge_all(batches):
        parts = list(batches)
        if parts:
            yield mg_merge(pd.concat(parts, ignore_index=True))

    # <= P*counters rows funnel into one task for the final merge —
    # bounded by construction, not by data volume
    merged = summaries.repartition(1).mapInPandas(
        mg_merge_all, "mg_key long, mg_w long"
    )
    candidates = merged.select("mg_key")
    pruned = df.join(
        F.broadcast(candidates),
        key_hash == F.col("mg_key"),
        "leftsemi",
    )
    counts = pruned.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * denom > F.col("n_total"))
        .select(key_col, "cnt")
        .orderBy(key_col)
    )
