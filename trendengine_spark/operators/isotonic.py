"""Isotonic regression (monotone calibration) — model-in-the-loop
curation surface (r9).

The production use: a learned quality/relevance score must be
CALIBRATED against observed outcomes before it gates documents —
isotonic regression fits the best monotone non-decreasing step
function (no functional form assumed), the standard calibration tool
(Zadrozny & Elkan 2002; public method, own implementation).

Distributed shape: the raw table aggregates to (group, x, n, Σy)
buckets in one partial+final pass — the ONLY thing that scales with
rows — then PAVA (pool adjacent violators) runs per group inside
``applyInPandas`` over the bounded bucket table, O(B) per group.
Nothing row-level ever reaches Python.

Exactness discipline (the oracle-twin playbook): PAVA blocks carry
INTEGER ``(Σy, n)`` state and compare adjacent block means by
cross-multiplication — no float until the final one-division-per-
block ``Σy/n``. Because a PAVA block is exactly the argmin/argmax
segment of the textbook minimax identity
``fit(k) = max_{i≤k} min_{j≥k} mean(y[i..j])``, that division
produces the bit-identical double a relational engine computes from
the same identity — which is how `quality_isotonic_calibration`
gets a DuckDB oracle despite PAVA being an inherently sequential
algorithm: the oracle runs the O(B²)-pair minimax SQL, Spark runs
the real O(B) pooling pass, and the hashes must agree.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trendengine_spark.operators.util import fit_partitioned


def pava_blocks(buckets: list[tuple[int, int]]) -> list[float]:
    """Textbook PAVA over (n, Σy) buckets ordered by x: pool adjacent
    violators of non-decreasing mean. Integer block state; cross-
    multiplied comparisons; one float division per final block.
    Returns the fitted value per input bucket."""
    # stack of [n, sum_y, n_buckets]
    stack: list[list[int]] = []
    for n, sy in buckets:
        stack.append([int(n), int(sy), 1])
        # merge while the previous block's mean exceeds the last's:
        # sy_prev / n_prev > sy_last / n_last  <=>  cross products
        while (
            len(stack) > 1
            and stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]
        ):
            n2, s2, c2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += s2
            stack[-1][2] += c2
    out: list[float] = []
    for n, sy, c in stack:
        v = float(sy) / float(n)
        out.extend([v] * c)
    return out


def fit_isotonic(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "fitted",
) -> DataFrame:
    """Monotone non-decreasing calibration of ``y`` against ``x`` per
    group. Returns one row per (group, distinct x):
    (group_cols..., x, n, sum_y, fitted).

    One shuffle: the bucket aggregate (rows → B bucket rows,
    partial+final, the only row-scaled stage); PAVA then runs per
    group executor-side via ``applyInPandas`` with the parallelism
    pinned (``fit_partitioned`` — CPU-per-group work, byte-light
    input, the DBEST-stage AQE hazard). ``y`` must be integral
    (cast upstream) so block state is exact; the fitted value is one
    correctly-rounded division per block."""
    buckets = df.groupBy(*group_cols, x_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(y_col).cast("long")).cast("long").alias("sum_y"),
    )
    gcols = list(group_cols)
    schema_parts = [
        f"`{c}` {buckets.schema[c].dataType.simpleString()}"
        for c in (*gcols, x_col)
    ]
    schema = (
        ", ".join(schema_parts) + ", n long, sum_y long, fitted double"
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        fitted = pava_blocks(
            list(zip(pdf["n"].astype(int), pdf["sum_y"].astype(int)))
        )
        pdf["fitted"] = pd.Series(fitted, dtype="float64")
        return pdf

    if gcols:
        grouped = fit_partitioned(buckets, gcols).groupBy(*gcols)
    else:
        grouped = buckets.coalesce(1).groupBy()
    return grouped.applyInPandas(solve, schema)
