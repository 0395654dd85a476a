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


def test_mk_nan_inputs_dropped_not_crash():
    """Nulls arriving through a DataFrame become NaN; MK/Sen must drop
    them (a missing observation contributes no pairs) instead of
    raising 'cannot convert float NaN to integer' inside the worker
    (ADVICE r7 fix). Results must equal the NaN-free series."""
    clean = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    dirty = np.array([1.0, np.nan, 2.0, 3.0, np.nan, 4.0, 5.0])
    rc, rd = mann_kendall(clean), mann_kendall(dirty)
    assert rd["s"] == rc["s"] and rd["var_s18"] == rc["var_s18"]
    assert rd["n"] == 5
    # Sen drops the same points and keeps the ORIGINAL x positions of
    # the survivors (default index), so slopes use real spacing
    assert sens_slope(dirty) == sens_slope(
        clean, np.array([0.0, 2.0, 3.0, 5.0, 6.0])
    )
    # all-NaN and single-survivor series degrade to the n<2 result
    assert mann_kendall(np.array([np.nan, np.nan]))["s"] == 0
    assert sens_slope(np.array([np.nan, 7.0])) == 0.0
    # seasonal wrapper: NaN in one season must not poison S or Sen
    from trendengine_spark.functions.mannkendall import seasonal_mann_kendall

    y = np.array([1.0, 2.0, 3.0, np.nan, 2.0, 4.0, 6.0, 8.0])
    s = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    r = seasonal_mann_kendall(y, s)
    assert r["s_total"] == 3 + 6  # month0 n=3 full-S, month1 n=4
    assert not math.isnan(r["seasonal_sen"])
