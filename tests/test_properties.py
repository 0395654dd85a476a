"""Hypothesis property tests over the pure-numpy analytical core
(SURVEY §5.2.3) — no Spark session needed, so these are fast and run
many random cases."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from trendengine_spark.functions.dbest import (
    dbest_change_detection,
    interpolate_gaps,
)
from trendengine_spark.functions.polytrend import polytrend_classify
from trendengine_spark.functions.stattools import classical_decompose

finite_series = arrays(
    np.float64,
    st.integers(min_value=6, max_value=60),
    elements=st.floats(
        min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
    ),
)


@settings(max_examples=50, deadline=None)
@given(finite_series)
def test_direction_always_sign_of_slope(y):
    r = polytrend_classify(y)
    assert r["direction"] == (1 if r["slope"] >= 0 else -1)
    assert r["trend_type"] in (-1, 0, 1, 2, 3)
    assert 0.0 <= r["p_value"] <= 1.0


@settings(max_examples=50, deadline=None)
@given(finite_series, st.floats(min_value=-5, max_value=5))
def test_classification_invariant_under_value_shift_of_constant(y, c):
    """Adding a constant offset never changes the classification
    (polynomial coefficients above degree 0 are shift-invariant)."""
    r1 = polytrend_classify(y)
    r2 = polytrend_classify(y + c)
    assert r1["trend_type"] == r2["trend_type"]
    assert abs(r1["slope"] - r2["slope"]) < 1e-6


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        np.float64,
        st.integers(min_value=24, max_value=120),
        elements=st.floats(
            min_value=-5, max_value=5, allow_nan=False, allow_infinity=False
        ),
    )
)
def test_decomposition_always_reconstructs(y):
    trend, seasonal, remainder = classical_decompose(y, period=12)
    assert np.allclose(trend + seasonal + remainder, y, atol=1e-8)
    # seasonal component is zero-mean by construction over full periods
    if y.size >= 24:
        assert abs(seasonal[:12].sum()) < 1e-8


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        np.float64,
        st.integers(min_value=24, max_value=80),
        elements=st.floats(
            min_value=0, max_value=2, allow_nan=False, allow_infinity=False
        ),
    )
)
def test_dbest_segments_tile_the_series(y):
    res = dbest_change_detection(y, seasonality=12)
    # reported rows are a top-k subset; totals must be consistent
    assert res["segment_no"] >= 1
    assert res["breakpoint_no"] <= 3
    for s, e in zip(res["start"], res["end"]):
        assert 1 <= s < e <= y.size
    assert all(ct in (0, 1) for ct in res["change_type"])
    assert all(sig in (0, 1) for sig in res["significance"])


@settings(max_examples=50, deadline=None)
@given(finite_series, st.data())
def test_interpolate_gaps_preserves_known_points(y, data):
    idx = data.draw(
        st.sets(
            st.integers(min_value=1, max_value=y.size - 2), min_size=0, max_size=3
        )
    )
    y2 = y.copy()
    for i in idx:
        y2[i] = np.nan
    filled = interpolate_gaps(y2)
    keep = np.ones(y.size, dtype=bool)
    for i in idx:
        keep[i] = False
    assert np.allclose(filled[keep], y[keep])
    assert not np.isnan(filled).any()
