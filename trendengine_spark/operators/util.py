"""Shared operator plumbing."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Undo degenerate input parallelism before CPU-heavy per-row work.

    A single-row-group parquet file scans as ONE partition, so an
    expression-heavy stage (shingling, hashing, vector math, Arrow
    UDFs) downstream would run on one core no matter how many the
    cluster has. When the plan's estimated scan parallelism is below
    the session default, repartition up to it; the shuffle moves only
    the small degenerate input. On a real multi-file lake (the 100 TB
    case) scans already produce thousands of splits and this is a
    no-op — the branch exists for pathological inputs, not as a
    general repartition (which would add a full shuffle of healthy
    inputs).

    Parallelism is estimated driver-side from the plan's input files
    (count and total size vs ``maxPartitionBytes``) — NOT via
    ``df.rdd.getNumPartitions()``, which would force a Python-RDD
    conversion of the analyzed plan on every call (this helper sits on
    the hot path of every dedup/similarity query).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-file source (rare) — assume healthy
        return df
    if not files:
        return df
    if len(files) >= target:
        return df
    # one file can still scan as many splits if it exceeds
    # maxPartitionBytes — estimate before paying a repartition
    try:
        max_bytes = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
            .lower()
            .removesuffix("b")
        )
    except ValueError:
        max_bytes = 128 * 1024 * 1024
    total = 0
    for uri in files:
        p = uri.removeprefix("file:")
        if os.path.exists(p):
            total += os.path.getsize(p)
    est_splits = max(len(files), -(-total // max_bytes) if total else 0)
    if est_splits < target:
        return df.repartition(target)
    return df
