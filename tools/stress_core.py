"""Analytical-core throughput stress (not part of the driver bench).

Synthesizes N series × M monthly points (seasonal + noise, an
injected 0.2 level shift at month 120 on every third series) and
measures the two applyInPandas fitting stages end-to-end. This is
the scale-out evidence for SURVEY §4.3: per-series work is bounded,
so throughput is linear in cores and series count.

Observed on local[32] (round 2): 2.4M rows → DBEST ~1.5k series/s,
PolyTrend ~3.2k series/s.

Usage: python tools/stress_core.py [n_series] [n_months]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_months = int(sys.argv[2]) if len(sys.argv) > 2 else 240

    from trendengine_spark.functions.dbest import dbest_changes
    from trendengine_spark.functions.polytrend import polytrend_groups
    from trendengine_spark.session import get_spark

    spark = get_spark(app_name="stress_core")
    base = spark.range(n_series).withColumnRenamed("id", "sid")
    months = spark.range(n_months).withColumnRenamed("id", "m")
    obs = (
        base.crossJoin(months)
        .withColumn(
            "period_start",
            F.expr("timestampadd(MONTH, CAST(m AS INT), timestamp'1990-01-15')"),
        )
        .withColumn(
            "value",
            0.45
            + 0.05 * F.sin(2 * 3.14159265 * F.col("m") / 12)
            + F.when((F.col("sid") % 3 == 0) & (F.col("m") >= 120), 0.2).otherwise(0.0)
            + (F.rand(seed=1) - 0.5) * 0.02,
        )
        .select("sid", "period_start", "value")
        .repartition(64)
        .cache()
    )
    rows = obs.count()

    t0 = time.perf_counter()
    n = dbest_changes(obs, ["sid"], largest_only=True).count()
    dt = time.perf_counter() - t0
    print(f"dbest: {n} series / {rows} rows in {dt:.1f}s -> {n / dt:.0f} series/s")

    t0 = time.perf_counter()
    npt = polytrend_groups(obs, ["sid"], time_col="period_start").count()
    dt = time.perf_counter() - t0
    print(f"polytrend: {npt} series in {dt:.1f}s -> {npt / dt:.0f} series/s")


if __name__ == "__main__":
    main()
