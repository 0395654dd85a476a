"""FIXTURES.md §2 golden tests for the PolyTrend classifier (U1) +
§5.2.3 property invariants."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import RECIPES, make_series
from trendengine_spark.functions.polytrend import polytrend_classify


@pytest.mark.parametrize("name", sorted(RECIPES))
def test_recipe_classification(name):
    """Each FIXTURES recipe classifies to its constructed-in truth in
    the vast majority of noise draws (recipes calibrated per
    FIXTURES.md §2 monte-carlo notes)."""
    f, expected = RECIPES[name]
    hits = 0
    trials = 30
    for seed in range(trials):
        y = make_series(f, seed=seed)
        r = polytrend_classify(y, alpha=0.05)
        hits += int(r["trend_type"] == expected)
    assert hits >= int(0.8 * trials), f"{name}: {hits}/{trials} correct"


def test_direction_equals_sign_of_slope():
    for seed in range(10):
        for f, _ in RECIPES.values():
            y = make_series(f, seed=seed)
            r = polytrend_classify(y)
            assert r["direction"] == (1 if r["slope"] >= 0 else -1)


def test_time_translation_invariance():
    """Classification depends only on the series values, not the
    epoch of the x axis (x is always 0..n-1 in-classifier)."""
    f, expected = RECIPES["quadratic"]
    y = make_series(f, seed=3)
    r1 = polytrend_classify(y)
    r2 = polytrend_classify(y.copy())
    assert r1 == r2


def test_noiseless_recipes_classify_exactly():
    for name, (f, expected) in RECIPES.items():
        y = f(np.arange(20.0))
        if name == "no_trend":
            # perfectly constant series has zero variance; slope p=1
            r = polytrend_classify(y)
            assert r["trend_type"] == 0
            continue
        r = polytrend_classify(y)
        assert r["trend_type"] == expected, (name, r)


def test_short_series_is_no_trend():
    r = polytrend_classify(np.array([1.0, 2.0, 3.0]))
    assert r["trend_type"] == 0 and r["degree"] == 0


def test_slope_recovers_generating_coefficient():
    f, _ = RECIPES["linear_up"]
    slopes = [polytrend_classify(make_series(f, seed=s))["slope"] for s in range(20)]
    assert abs(float(np.mean(slopes)) - 0.008) < 0.002


def test_polyfit_relational_twin_matches_ols_poly(spark):
    """trend_polyfit_coeffs (exact-integer Cramer, oracle-checked)
    must agree with stattools.ols_poly — the production U1/U4 numpy
    fitting path — to float precision on the same daily series: the
    oracle hash therefore transitively checks the UDF math (VERDICT
    r7 task 2)."""
    import duckdb
    import numpy as np

    from trendengine_spark.functions.stattools import ols_poly
    from trendengine_spark.queries.base import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r
        for r in REGISTRY["trend_polyfit_coeffs"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    series = con.sql(
        f"""SELECT event_type, list(y ORDER BY d) FROM (
              SELECT event_type, CAST(ts AS DATE) d, count(*) y
              FROM '{sf}/events.parquet' GROUP BY 1, 2) GROUP BY 1"""
    ).fetchall()
    assert len(series) == len(got) > 0
    for etype, ys in series:
        y = np.asarray(ys, dtype=np.float64)
        c2, *_ = ols_poly(y, 2)
        c1, *_ = ols_poly(y, 1)
        r = got[etype]
        assert abs(r["b0"] - c2[0]) < 1e-8 * max(1, abs(c2[0]))
        assert abs(r["b1"] - c2[1]) < 1e-8 * max(1, abs(c2[1]))
        assert abs(r["b2"] - c2[2]) < 1e-8 * max(1, abs(c2[2]))
        assert abs(r["slope_lin"] - c1[1]) < 1e-8 * max(1, abs(c1[1]))
        assert abs(r["intercept_lin"] - c1[0]) < 1e-8 * max(1, abs(c1[0]))
        assert r["n"] == len(y)
