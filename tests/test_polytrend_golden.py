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
