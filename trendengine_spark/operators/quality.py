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

from functools import reduce

from pyspark.sql import Column, DataFrame
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


def expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Data-quality expectations (the Delta-Live/Great-Expectations
    primitive, engine-native): ``rules`` maps a rule name to a
    boolean Column that each GOOD row satisfies. Returns
    ``(report, quarantine)``:

    - ``report``: one row per rule — rows checked, passed, failed,
      pass fraction (one full-scan aggregate, all counters
      partial-combined map-side; null predicate results count as
      failures, the conservative read);
    - ``quarantine``: the failing rows with a ``_failed_rules``
      column naming every violated rule (filter + projection — no
      shuffle; write it next to the clean table and the pipeline
      never silently drops data).

    Both outputs derive from the same single-pass expressions, so
    report counts and quarantine row counts cannot disagree.

    Rule names must match ``[A-Za-z0-9_.-]+`` — they are interpolated
    into a ``stack(...)`` SQL literal for the report, so a quote or
    backtick in a name would break (or worse, rewrite) the expression;
    an empty ``rules`` dict is rejected up front (``stack(0)`` and the
    quarantine's empty reduce both fail obscurely otherwise).
    """
    import re

    if not rules:
        raise ValueError("expectations() requires at least one rule")
    bad = [n for n in rules if not re.fullmatch(r"[A-Za-z0-9_.\-]+", n)]
    if bad:
        raise ValueError(
            f"rule names must match [A-Za-z0-9_.-]+ (they are embedded in "
            f"SQL literals and column names): {bad!r}"
        )
    checks = [
        F.coalesce(cond.cast("boolean"), F.lit(False)).alias(f"_ok_{name}")
        for name, cond in rules.items()
    ]
    checked = df.select("*", *checks)
    agg = checked.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.col(f"_ok_{name}").cast("long")).alias(f"_pass_{name}")
            for name in rules
        ],
    )
    stack = ", ".join(f"'{name}', `_pass_{name}`" for name in rules)
    report = agg.selectExpr(
        "_n AS n_rows", f"stack({len(rules)}, {stack}) AS (rule, n_pass)"
    ).select(
        "rule",
        "n_rows",
        "n_pass",
        (F.col("n_rows") - F.col("n_pass")).alias("n_fail"),
        F.round(F.col("n_pass") / F.col("n_rows"), 6).alias("pass_frac"),
    )
    failed_any = ~reduce(
        lambda a, b: a & b, [F.col(f"_ok_{n}") for n in rules]
    )
    names_arr = F.filter(
        F.array(
            *[
                F.when(~F.col(f"_ok_{n}"), F.lit(n))
                for n in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    quarantine = (
        checked.filter(failed_any)
        .withColumn("_failed_rules", F.concat_ws(",", names_arr))
        .drop(*[f"_ok_{n}" for n in rules])
    )
    return report, quarantine
