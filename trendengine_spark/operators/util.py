"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Undo degenerate input parallelism before CPU-heavy per-row work.

    A single-row-group parquet file scans as ONE partition, so an
    expression-heavy stage (shingling, hashing, vector math, Arrow
    UDFs) downstream would run on one core no matter how many the
    cluster has. When the plan's parallelism is below the session
    default, repartition up to it; the shuffle moves only the small
    degenerate input. On a real multi-file lake (the 100 TB case)
    scans already produce thousands of splits and this is a no-op —
    the branch exists for pathological inputs, not as a general
    repartition (which would add a full shuffle of healthy inputs).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
