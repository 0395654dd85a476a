"""Golden/property tests for the Mann-Kendall + Sen's slope core
(functions/mannkendall.py). The integer-exact pieces are ALSO
oracle-checked relationally (trend_mann_kendall_stats); these pin the
normal-approximation z/p and the small hand-computed cases."""

from __future__ import annotations

import math

import numpy as np

from trendengine_spark.functions.mannkendall import (
    _erfc,
    mann_kendall,
    sens_slope,
)


def test_mk_hand_computed_tie_case():
    # y = [1,2,2,3]: S = 5; ties: one group of 2 -> 2*1*9 = 18;
    # n(n-1)(2n+5) = 4*3*13 = 156; var_s18 = 138
    r = mann_kendall(np.array([1.0, 2.0, 2.0, 3.0]))
    assert r["s"] == 5
    assert r["var_s18"] == 138
    assert abs(r["var_s"] - 138 / 18) < 1e-12
    # z = (S-1)/sqrt(var_s)
    assert abs(r["z"] - 4 / math.sqrt(138 / 18)) < 1e-12


def test_mk_monotone_constant_reversed():
    up = np.arange(30, dtype=float)
    r = mann_kendall(up)
    assert r["s"] == 30 * 29 // 2
    assert r["p_value"] < 1e-6 and r["trend"] == 1
    assert sens_slope(up) == 1.0

    r0 = mann_kendall(np.ones(20))
    assert r0["s"] == 0 and r0["trend"] == 0
    assert abs(r0["p_value"] - 1.0) < 1e-7  # A&S erfc(0) ~ 1 - 1e-9
    # all-tied series: variance numerator is exactly zero
    assert r0["var_s18"] == 0

    down = up[::-1].copy()
    rd = mann_kendall(down)
    assert rd["s"] == -(30 * 29 // 2) and rd["trend"] == -1
    assert sens_slope(down) == -1.0


def test_mk_outlier_robustness_of_sen():
    y = np.arange(50, dtype=float) * 2.0
    y[25] = 1e6  # one wild outlier
    assert abs(sens_slope(y) - 2.0) < 1e-9  # median slope unmoved


def test_erfc_reference_values():
    assert abs(_erfc(0.0) - 1.0) < 1e-7
    # erfc(1) = 0.15729920705...
    assert abs(_erfc(1.0) - 0.1572992) < 2e-6
    # symmetry erfc(-x) = 2 - erfc(x)
    assert abs(_erfc(-1.0) - (2 - _erfc(1.0))) < 1e-12
    # two-sided p at z=1.96 is ~0.05
    assert abs(_erfc(1.96 / math.sqrt(2)) - 0.05) < 5e-4


def test_mk_groups_matches_direct(spark):
    import pandas as pd

    from trendengine_spark.functions.mannkendall import mann_kendall_groups

    rows = []
    for g, series in (
        ("a", [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]),
        ("b", list(range(12))),
    ):
        for i, v in enumerate(series):
            rows.append((g, i, float(v)))
    df = spark.createDataFrame(rows, "g string, tix long, value double")
    out = {
        r["g"]: r
        for r in mann_kendall_groups(
            df, ["g"], time_col="tix", value_col="value"
        ).collect()
    }
    for g, series in (
        ("a", [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]),
        ("b", [float(x) for x in range(12)]),
    ):
        want = mann_kendall(np.array(series))
        assert out[g]["s_stat"] == want["s"]
        assert out[g]["var_s18"] == want["var_s18"]
        assert abs(out[g]["p_value"] - want["p_value"]) < 1e-12
        assert abs(out[g]["sens_slope"] - sens_slope(np.array(series))) < 1e-12


def test_seasonal_mk_removes_cycle_finds_trend():
    """A pure annual cycle must test as NO trend seasonally; cycle +
    monotone drift must test positive with Sen ~ the drift per year."""
    import numpy as np

    from trendengine_spark.functions.mannkendall import (
        seasonal_mann_kendall,
    )

    months = np.tile(np.arange(12), 10)  # 10 years monthly
    cycle = np.sin(2 * np.pi * months / 12) * 5.0
    r0 = seasonal_mann_kendall(cycle, months)
    assert r0["s_total"] == 0 and r0["trend"] == 0
    # build series ordered (month, year) as the groups wrapper sorts:
    # each month's across-year series gains +1/year drift on the cycle
    y = np.concatenate(
        [cycle[months == m][:10] + np.arange(10) * 1.0 for m in range(12)]
    )
    s = np.concatenate([[m] * 10 for m in range(12)])
    r1 = seasonal_mann_kendall(y, s)
    assert r1["trend"] == 1 and r1["p_value"] < 1e-6
    assert abs(r1["seasonal_sen"] - 1.0) < 1e-9
    # combined variance equals sum of per-month variances: 12 months
    # of an n=10 untied series
    assert r1["var_s18_total"] == 12 * (10 * 9 * 25)
