"""Categorical roll-up statistics (reference A4/A5/A7).

The reference computes seven per-category counts by re-filtering the
result frame once per category plus percentage-of-total
(``TrendEngine/calculations/utils.py:37-64``). Spark-first this is a
single-pass conditional aggregation (one job, map-side partial agg)
— or, in long form, a groupBy + window over the grand total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# trend_type code → label, reference polytrend.py:204-210
TREND_TYPE_LABELS = {
    -1: "concealed",
    0: "no trend",
    1: "linear",
    2: "cuadratic",  # sic — reference spelling, polytrend.py:208
    3: "cubic",
}
# direction code → label, reference polytrend.py:211
DIRECTION_LABELS = {-1: "negative", 1: "positive"}


def decode_trend_type(df: DataFrame, col: str = "trend_type") -> DataFrame:
    """Code→label decode (reference F8) as a when/otherwise chain —
    stays inside whole-stage codegen (no join, no UDF)."""
    expr = F.lit(None).cast("string")
    for code, label in TREND_TYPE_LABELS.items():
        expr = F.when(F.col(col) == code, F.lit(label)).otherwise(expr)
    return df.withColumn(f"{col}_label", expr)


def category_counts(
    df: DataFrame, category_col: str, pct_decimals: int = 1
) -> DataFrame:
    """Long-form roll-up: count + share-of-total per category
    (reference A4 + A5). The percentage uses an empty-frame window
    (grand total) — a single extra exchange over the tiny aggregated
    frame, never over the input."""
    counts = df.groupBy(category_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = Window.partitionBy()
    return counts.withColumn(
        "pct",
        F.round(F.col("cnt") / F.sum("cnt").over(total) * 100.0, pct_decimals),
    )


def polytrend_summary(result: DataFrame) -> DataFrame:
    """Wide-form one-row summary matching the reference's statistics
    dict (``utils.py:37-64``): per-class and per-direction counts and
    percentages in one conditional-aggregation pass. Rows with a
    non-'ok' status are excluded first — the reference's stats only
    see qualified pixels (its polygon loop skips the rest)."""
    if "status" in result.columns:
        result = result.filter(F.col("status") == "ok")

    def cnt(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    t = F.col("trend_type")
    d = F.col("direction")
    aggs = [
        F.count(F.lit(1)).alias("count_total"),
        cnt(t == 1).alias("count_linear"),
        cnt(t == 0).alias("count_no_trend"),
        cnt(t == -1).alias("count_concealed"),
        cnt(t == 2).alias("count_quadratic"),
        cnt(t == 3).alias("count_cubic"),
        cnt(d == -1).alias("count_negative"),
        cnt(d == 1).alias("count_positive"),
    ]
    out = result.agg(*aggs)
    for name in (
        "linear",
        "no_trend",
        "concealed",
        "quadratic",
        "cubic",
        "negative",
        "positive",
    ):
        out = out.withColumn(
            f"proc_{name}",
            F.round(F.col(f"count_{name}") / F.col("count_total") * 100.0, 1),
        )
    return out
