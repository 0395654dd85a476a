"""Per-series quality gate (reference F4).

The reference drops an entire pixel series if ANY value is at or
below a dataset threshold (``all(val > threshold for val in Y)``,
``TrendEngine/calculations/polytrend.py:284,335``,
``dbest.py:110,180``; thresholds: GIMMS 0.1, MODIS 1000 for
PolyTrend / 100 for DBEST — the two flows disagree, SURVEY.md §4.4.3,
so the threshold is a parameter here).

Spark-first expression: "every value > t" ⇔ "min(value) > t", so the
gate is a per-series min-aggregate + semi-join back. Both sides hash
on the series key, so AQE turns this into one co-partitioned
exchange; at scale the qualifying-keys side is small (#series rows)
and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_gate(
    obs: DataFrame,
    series_cols: list[str],
    threshold: float,
    value_col: str = "value",
) -> DataFrame:
    """Keep only series whose minimum value exceeds ``threshold``."""
    qualified = (
        obs.groupBy(*series_cols)
        .agg(F.min(value_col).alias("_mn"))
        .filter(F.col("_mn") > threshold)
        .select(*series_cols)
    )
    return obs.join(qualified, series_cols, "left_semi")


def qualified_series(
    obs: DataFrame,
    series_cols: list[str],
    threshold: float,
    value_col: str = "value",
) -> DataFrame:
    """The qualifying series keys only (one row per series)."""
    return (
        obs.groupBy(*series_cols)
        .agg(F.min(value_col).alias("min_value"))
        .filter(F.col("min_value") > threshold)
    )
