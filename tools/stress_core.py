"""Analytical-core throughput stress (not part of the driver bench).

Synthesizes N series × M monthly points (seasonal + noise, an
injected 0.2 level shift at month 120 on every third series) and
measures the two applyInPandas fitting stages end-to-end. This is
the scale-out evidence for SURVEY §4.3: per-series work is bounded,
so throughput is linear in cores and series count.

Observed on local[32], 2.4M rows (10k series × 240 months):

    r2: DBEST ~1.5k series/s, PolyTrend ~3.2k series/s
    r7 (pre-fix): DBEST had regressed to ~212 series/s — two causes
        found and fixed this round: (a) the STL LOESS smoother ran a
        per-evaluation-point Python loop (~98% of the fit; now
        vectorized across evaluation points, bit-identical — 87 →
        27 ms/series), and (b) AQE's BYTE-based partition coalescing
        starved the CPU-dense fitting shuffle down to 8 tasks on 32
        cores (now pinned via util.fit_partitioned on every
        applyInPandas fitting wrapper).
    r7 (post-fix): DBEST 537 series/s, PolyTrend 2.7k, Mann-Kendall
        3.1k, seasonal MK 2.5k, BFAST-monitor 4.0k series/s.
        (BFAST alarms ≈ 0 here BY DESIGN: the planted shift at month
        120 falls inside the 144-month history window, so the 4
        alarms measure the λ=4 false-positive rate — 0.04%.)

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

    # r7 additions: MK (O(n²) pairwise triangle per series), seasonal
    # MK (12 within-month triangles), BFAST-monitor (OLS + MOSUM)
    from trendengine_spark.functions.bfast import bfast_monitor_groups
    from trendengine_spark.functions.mannkendall import (
        mann_kendall_groups,
        seasonal_mann_kendall_groups,
    )

    t0 = time.perf_counter()
    nmk = mann_kendall_groups(
        obs, ["sid"], time_col="period_start", value_col="value"
    ).count()
    dt = time.perf_counter() - t0
    print(f"mann_kendall: {nmk} series in {dt:.1f}s -> {nmk / dt:.0f} series/s")

    smk_in = obs.withColumn("season", F.month("period_start")).withColumn(
        "yy", F.year("period_start")
    )
    t0 = time.perf_counter()
    nsmk = seasonal_mann_kendall_groups(
        smk_in, ["sid"], time_col="yy", season_col="season",
        value_col="value",
    ).count()
    dt = time.perf_counter() - t0
    print(
        f"seasonal_mk: {nsmk} series in {dt:.1f}s -> {nsmk / dt:.0f} series/s"
    )

    t0 = time.perf_counter()
    bf = bfast_monitor_groups(
        obs, ["sid"], time_col="period_start", value_col="value"
    )
    n_alarm = bf.filter("break_detected").count()
    dt = time.perf_counter() - t0
    print(
        f"bfast_monitor: {n_series} series in {dt:.1f}s -> "
        f"{n_series / dt:.0f} series/s; {n_alarm} alarms "
        f"(the planted month-120 shift sits INSIDE the history "
        f"window, so alarms here measure the false-positive rate)"
    )


if __name__ == "__main__":
    main()
