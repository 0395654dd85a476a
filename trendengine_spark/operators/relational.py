"""Relational helper operators the built-in API lacks as one-liners.

SURVEY.md §2.6 declares the standard closure (joins, windows, top-k,
…) as engine surface; most of it is a direct pass-through to
``pyspark.sql``. The two compositions below are the ones that need a
deliberate plan choice, written for 100 TB:

- :func:`asof_join` — the union + last(ignorenulls) window plan: ONE
  shuffle on the join key and a per-key sort, instead of a skew-prone
  range join or a per-row subquery. This is the standard scalable
  as-of strategy (same shape Flink/kdb temporal joins lower to).
- :func:`topk_per_group` — ``row_number`` over a partitioned window +
  filter: one shuffle on the group key, no global sort; AQE handles
  group-count skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trendengine_spark.operators.util import local_rows_df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join (kdb/pandas ``merge_asof`` semantics): for each left
    row, attach the right row with the greatest ``right_ts`` ≤
    ``left_ts`` (``direction='backward'``), the smallest ``right_ts``
    ≥ ``left_ts`` (``'forward'``), or whichever of the two is closer
    in time (``'nearest'``, ties → backward — the pandas convention),
    within the same key. ``tolerance`` (seconds) nulls the match when
    |left_ts − matched right_ts| exceeds it.

    Implementation: tag both sides, union by name, sort each key
    partition by (ts, side) with right rows first on ties, and carry
    the latest non-null right payload with ``last(ignorenulls=True)``
    over a running frame — ascending for backward, descending for
    forward; ``nearest`` evaluates both windows over the SAME
    partitioning (two in-partition sorts, still one hash exchange)
    and picks per row. Cost at any scale: one shuffle on ``on`` plus
    per-key sorts — no range join, no per-row subquery, and the plan
    co-partitions with any downstream groupBy on the same key.

    ``how='left'`` keeps unmatched left rows (right payload null);
    ``how='inner'`` drops them.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys]
    if right_ts not in payload:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key right column")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    clash = sorted(set(payload) & set(left.columns))
    if clash:
        # the null-cast loop below would silently overwrite the left
        # column and the final select would emit duplicate names —
        # require the caller to rename (e.g. views.ts → v_ts) up front
        raise ValueError(
            f"right payload columns collide with left columns: {clash}; "
            "rename the right-side columns before the as-of join"
        )
    reserved = {"_side", "_t", "_oot"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"columns {sorted(reserved)} are reserved by asof_join")

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(left_ts))
    for c in payload:
        lhs = lhs.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    rhs = right.withColumn("_side", F.lit(0)).withColumn("_t", F.col(right_ts))

    u = lhs.unionByName(rhs, allowMissingColumns=True)
    w_bwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "nearest":
        for c in payload:
            u = u.withColumn(f"{c}__b", F.last(c, ignorenulls=True).over(w_bwd))
            u = u.withColumn(f"{c}__f", F.last(c, ignorenulls=True).over(w_fwd))
        lt = F.col("_t")
        bwd_d = lt.cast("double") - F.col(f"{right_ts}__b").cast("double")
        fwd_d = F.col(f"{right_ts}__f").cast("double") - lt.cast("double")
        take_bwd = F.col(f"{right_ts}__b").isNotNull() & (
            F.col(f"{right_ts}__f").isNull() | (bwd_d <= fwd_d)
        )
        for c in payload:
            u = u.withColumn(
                c, F.when(take_bwd, F.col(f"{c}__b")).otherwise(F.col(f"{c}__f"))
            )
        u = u.drop(*[f"{c}__b" for c in payload], *[f"{c}__f" for c in payload])
    else:
        w = w_bwd if direction == "backward" else w_fwd
        for c in payload:
            u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if tolerance is not None:
        diff = F.abs(
            F.col("_t").cast("double") - F.col(right_ts).cast("double")
        )
        # materialize the verdict BEFORE masking: the loop nulls
        # right_ts itself, and a lazily re-resolved predicate would
        # then see the masked value for the remaining columns
        u = u.withColumn(
            "_oot", F.col(right_ts).isNotNull() & (diff > F.lit(tolerance))
        )
        for c in payload:
            u = u.withColumn(
                c, F.when(F.col("_oot"), F.lit(None)).otherwise(F.col(c))
            )
        u = u.drop("_oot")
    out = u.filter(F.col("_side") == 1).drop("_side", "_t")
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out.select(*left.columns, *payload)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the small/right side into
    ``salt_buckets`` replicas keyed (key, salt) and salt the left side
    randomly-but-deterministically (hash of the full row modulo
    buckets), so one hot key's rows spread across ``salt_buckets``
    tasks instead of one straggler.

    Use when a key's frequency is pathological (power-law fact keys)
    and AQE's skew-join splitting isn't available/enough; cost is a
    ``salt_buckets``× replication of the right side, so keep that side
    small(ish). Deterministic: the salt is a hash, not a random draw.

    Only ``inner`` and ``left`` are correct under right-side
    replication: a right/full-outer join would emit each unmatched
    right row once per salt replica, and semi/anti semantics change.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in {{'inner', 'left'}}; got {how!r} "
            "(right-side replication duplicates unmatched right rows under "
            "right/full-outer and changes semi/anti semantics)"
        )
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in left.columns])) % salt_buckets).alias(
        "_salt"
    )
    lhs = left.withColumn("_salt", salt)
    rhs = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = lhs.join(rhs, [on, "_salt"], how)
    return out.drop("_salt")


def _ranked_partitions(df: DataFrame, cap: int = 20_000) -> int:
    """Range-partition count for :func:`ranked_global`, derived from the
    optimizer's size estimate rather than ``defaultParallelism``.

    ``defaultParallelism`` tracks the *driver's* core count, not the
    data: on a 2-core driver in front of a 1000-executor cluster it
    would put a 100× fact table into 2 range partitions — two giant
    straggler tasks. Sizing by estimated plan bytes over
    ``maxPartitionBytes`` (the same heuristic file scans use) keeps
    partitions memory-bounded at any scale; ``defaultParallelism``
    remains only the floor so small inputs still use every core.
    """
    spark = df.sparkSession
    floor = spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return floor
    try:
        max_bytes = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
            .lower()
            .removesuffix("b")
        )
    except ValueError:
        max_bytes = 128 * 1024 * 1024
    # Catalyst reports Long.MaxValue when it has no estimate — treat as
    # unknown, not as 70k petabytes
    if size <= 0 or size >= (1 << 62):
        return floor
    return max(floor, min(cap, -(-size // max_bytes)))


def _range_bucket_bounds(
    df: DataFrame, order_cols: list[str], n_parts: int, seed: int = 42
) -> list[tuple]:
    """Driver-computed range-bucket boundaries for the order-column
    tuple: a seeded sample (~20 rows per target bucket, the same
    density RangePartitioner uses), sorted driver-side, evenly-spaced
    cut points, consecutive duplicates dropped. Null-containing sample
    tuples are excluded — null keys land in bucket 0, matching the
    default ascending nulls-first order."""
    cnt = df.count()
    if cnt == 0 or n_parts <= 1:
        return []
    fraction = min(1.0, (n_parts * 20) / cnt)
    sampled = [
        tuple(r)
        for r in df.select(*order_cols).sample(fraction, seed=seed).collect()
        if all(v is not None for v in r)
    ]
    if not sampled:
        return []
    sampled.sort()
    bounds: list[tuple] = []
    for i in range(1, n_parts):
        b = sampled[(i * len(sampled)) // n_parts]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def ranked_global(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Scale-safe global ranking: ``rank`` / ``percent_rank`` /
    ``cume_dist`` over a TOTAL order without the single-partition
    WindowExec a bare ``Window.orderBy(...)`` plans (all rows to one
    task — fine on a dimension table, fatal on a 100× fact table).

    Two-pass range-bucketed strategy (VERDICT r2 item 6, hardened in
    r5): bucket boundaries are sampled ONCE on the driver
    (:func:`_range_bucket_bounds`) and baked into the plan as literal
    comparisons, so the bucket id is a DETERMINISTIC function of the
    key tuple. That kills both prior hazards at the root:

    - the offsets job and the ranking job agree on every row's bucket
      by construction — no materialization needed (the r2-r4 versions
      pinned RangePartitioner's nondeterministic sampled bounds with
      ``localCheckpoint``, whose truncated lineage turns any executor
      loss into a job failure on a long-running cluster);
    - equal keys share a bucket BY DEFINITION (same tuple → same
      bucket id), so ties never straddle a boundary.

    1. ``_pid`` = number of boundaries ≤ the key tuple — a chain of
       struct comparisons against literals, whole-stage codegen'd.
    2. Rank locally per bucket (WindowExec partitioned by ``_pid`` —
       one hash exchange, parallel), count rows per bucket (tiny
       aggregate), add each bucket's cumulative offset back via a
       broadcast join.

    Emits ``_rank`` (SQL rank: ties share the minimum position),
    ``_pct_rank`` ((rank−1)/(N−1), 0.0 for N=1) and ``_cume_dist``
    (rows ≤ current key / N, tie-inclusive) alongside the input
    columns. Requires a deterministic input plan (scans/joins/aggs —
    anything but ``rand()``-family exprs), which every relational
    source satisfies; lineage stays intact, so the 100 TB failure
    story is recompute, not abort.
    """
    reserved = {
        "_pid", "_lrank", "_lcume", "_rank", "_pct_rank", "_cume_dist",
        "_n_total",
    }
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"columns {sorted(clash)} are reserved by ranked_global")
    spark = df.sparkSession
    n_parts = num_partitions or _ranked_partitions(df)
    bounds = _range_bucket_bounds(df, order_cols, n_parts)
    rkey = F.struct(*[F.col(c) for c in order_cols])
    key_types = [df.schema[c].dataType for c in order_cols]
    pid = F.lit(0)
    for b in bounds:
        # literals must match the key struct's field types exactly
        # (a Python int samples as INT against a BIGINT column)
        blit = F.struct(
            *[
                F.lit(v).cast(t).alias(c)
                for c, t, v in zip(order_cols, key_types, b)
            ]
        )
        # null-keyed rows compare null → coalesce to 0 → bucket 0
        # (ascending nulls-first)
        pid = pid + F.coalesce((rkey >= blit).cast("int"), F.lit(0))
    ranged = df.withColumn("_pid", pid)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    # default RANGE frame (unbounded preceding → current row) is
    # tie-inclusive — exactly cume_dist's numerator, counted locally
    local = ranged.withColumn("_lrank", F.rank().over(w)).withColumn(
        "_lcume", F.count(F.lit(1)).over(w)
    )
    # per-bucket sizes: a tiny #buckets-row aggregate; recomputing the
    # scan is safe because _pid is a pure function of the key tuple
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    total = sum(c for _, c in counts)
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = F.broadcast(
        local_rows_df(spark, offsets, "_pid int, _offset long")
    )
    out = local.join(off_df, "_pid")
    return (
        out.withColumn("_rank", F.col("_offset") + F.col("_lrank"))
        .withColumn(
            "_pct_rank",
            F.when(F.lit(total) > 1, (F.col("_rank") - 1) / F.lit(total - 1))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("_cume_dist", (F.col("_offset") + F.col("_lcume")) / F.lit(total))
        .withColumn("_n_total", F.lit(total))
        .drop("_pid", "_lrank", "_lcume", "_offset")
    )


def ntile_global(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    out_col: str = "_ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scale-safe global ``ntile(n)``: SQL ntile over a TOTAL order
    without the single-partition WindowExec of a bare
    ``Window.orderBy`` (fatal on a fact-sized input).

    Built on :func:`ranked_global`; ``order_cols`` MUST be a unique
    ascending order (include a key tiebreak — for a descending
    criterion pre-compute a negated column), so ``_rank`` is the
    global row number. The SQL ntile contract is then pure
    arithmetic on (row number, N): the first ``N % n`` buckets carry
    ``ceil(N/n)`` rows, the rest ``floor(N/n)`` — reproduced exactly,
    whole-stage codegen'd, no extra shuffle beyond ranked_global's.
    """
    r = ranked_global(df, order_cols, num_partitions=num_partitions)
    i = F.col("_rank")
    big = F.floor(F.col("_n_total") / n) + 1  # size of the first rem buckets
    rem = F.col("_n_total") % n
    cut = rem * big  # rows living in the bigger buckets
    bucket = (
        F.when(i <= cut, F.floor((i - 1) / big) + 1)
        .otherwise(rem + F.floor((i - cut - 1) / (big - 1)) + 1)
        .cast("int")
    )
    return r.withColumn(out_col, bucket).drop(
        "_rank", "_pct_rank", "_cume_dist", "_n_total"
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rn_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` (SURVEY §2.6 sort/top-k).

    Pass a deterministic ``order_by`` (include a unique tiebreak
    column) so results are stable under re-partitioning.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rn_col, F.row_number().over(w)).filter(F.col(rn_col) <= k)


def trailing_range_aggs(
    df: DataFrame,
    order_col: str,
    aggs: dict[str, Column],
    lookback: int,
    bucket_width: int = 512,
) -> DataFrame:
    """Trailing RANGE-frame window aggregates over a GLOBAL value
    order, computed scale-safe with overlap ("halo") partitioning.

    A plain ``Window.orderBy(v).rangeBetween(-lookback, 0)`` funnels
    every row into ONE task (Spark's unpartitioned-window warning) —
    correct only while the input is driver-bounded. This operator
    keeps the exact semantics at any size: rows are bucketed by
    ``floor(v / bucket_width)``; rows within ``lookback`` of a
    bucket's upper boundary are DUPLICATED into the next bucket as
    non-emitting halo rows, so every row's full ``[v-lookback, v]``
    frame is present inside its own bucket; the window then runs
    partitioned by bucket and halo rows are dropped after. Overhead
    is the halo fraction (~lookback/bucket_width duplicated rows);
    parallelism is #buckets, which grows with the value domain.

    ``aggs``: output column name → aggregate expression (e.g.
    ``{"n": F.count(F.lit(1))}``), each applied ``.over`` the frame.
    ``lookback``/``bucket_width`` are in ``order_col`` units
    (``bucket_width > lookback`` required).
    """
    if bucket_width <= lookback:  # pragma: no cover - authoring guard
        raise ValueError("bucket_width must exceed lookback")
    v = F.col(order_col)
    bucket = F.floor(v / bucket_width)
    own = df.withColumn("_bkt", bucket).withColumn("_halo", F.lit(0))
    halo = (
        # pmod, not %: Spark's % keeps the dividend's sign, so for
        # negative order values the halo test would never fire and
        # frames straddling a bucket edge would silently come up short
        df.filter(F.pmod(v, bucket_width) >= bucket_width - lookback)
        .withColumn("_bkt", bucket + 1)
        .withColumn("_halo", F.lit(1))
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rangeBetween(-lookback, 0)
    )
    out = own.unionByName(halo)
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out.filter(F.col("_halo") == 0).drop("_bkt", "_halo")
