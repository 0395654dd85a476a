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


# ----------------------------------------------------------------- codecs
@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    data=st.data(),
)
def test_png_roundtrip_lossless_any_dims(h, w, data):
    from trendengine_spark.operators.codecs import png_decode, png_encode

    img = data.draw(
        arrays(np.uint8, (h, w), elements=st.integers(0, 255)), label="img"
    )
    dec = png_decode(png_encode(img))
    assert dec.shape == (h, w, 1)
    assert np.array_equal(dec[:, :, 0], img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    data=st.data(),
)
def test_jpeg_gray_roundtrip_error_bounded_any_dims(h, w, data):
    """Baseline JPEG at quant 1: any dims (incl. non-multiples of 8 —
    padded partial blocks cropped on decode), error ≤ IDCT rounding."""
    from trendengine_spark.operators.codecs import jpeg_decode, jpeg_encode

    img = data.draw(
        arrays(np.uint8, (h, w), elements=st.integers(0, 255)), label="img"
    )
    dec = jpeg_decode(jpeg_encode(img, dc_quant=1, ac_quant=1))
    assert dec.shape == (h, w, 1)
    assert int(np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()) <= 2


@settings(max_examples=25, deadline=None)
@given(g=st.integers(0, 255), h=st.integers(1, 40), w=st.integers(1, 40))
def test_jpeg_constant_fill_exact_any_dims(g, h, w):
    from trendengine_spark.operators.codecs import jpeg_decode, jpeg_encode

    dec = jpeg_decode(jpeg_encode(np.full((h, w), g, dtype=np.uint8)))
    assert (dec == g).all()


# --------------------------------------------------------- packing layout
@settings(max_examples=30, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=1500), min_size=1, max_size=60),
    seq_len=st.integers(min_value=1, max_value=700),
)
def test_pack_layout_invariants(toks, seq_len):
    """Pure-python twin of pack_concat_chunks' arithmetic: offsets tile
    the stream with no gaps, spans are monotone, and every non-empty
    document's span covers exactly its offset range."""
    off = 0
    for n in toks:
        start_off = off
        end_off = off + n
        start_seq = start_off // seq_len
        end_seq = (end_off - 1) // seq_len if n > 0 else start_seq
        assert end_seq >= start_seq
        if n > 0:
            assert start_seq == start_off // seq_len
            assert end_seq == (end_off - 1) // seq_len
            # span size matches the token interval's sequence count
            assert end_seq - start_seq == ((end_off - 1) // seq_len) - (start_off // seq_len)
        off = end_off
