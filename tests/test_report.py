"""S6 HTML report sink: structure, escaping, chart geometry."""

from __future__ import annotations

import math
import re

from trendengine_spark.report import _pie_svg, _series_svg, write_html_report


def test_pie_svg_angles_sum():
    svg = _pie_svg(["a", "b", "c"], [50, 30, 20])
    assert svg.count("<path") == 3
    assert "(50.0%)" in svg and "(30.0%)" in svg and "(20.0%)" in svg


def test_pie_svg_full_circle_and_zero():
    svg = _pie_svg(["all", "none"], [10, 0])
    assert "<circle" in svg  # 100% slice degenerates to a circle
    assert svg.count("<path") == 0


def test_series_svg_bounds():
    xs = list(range(10))
    ys = [math.sin(x) for x in xs]
    svg = _series_svg(xs, ys, fit=[0.0] * 10)
    assert svg.count("<polyline") == 2
    # every plotted point stays inside the viewport
    for px, py in re.findall(r"(\d+\.\d),(\d+\.\d)", svg):
        assert 0 <= float(px) <= 640 and 0 <= float(py) <= 240


def test_write_html_report_end_to_end(spark, tmp_path):
    stats = spark.createDataFrame(
        [("linear", 3, 60.0), ("no trend <x>", 2, 40.0)],
        ["trend_type", "n", "pct"],
    )
    out = write_html_report(
        str(tmp_path / "report.html"),
        title="PolyTrend run & <summary>",
        stats=stats,
        pie=("trend_type", "n", stats),
        series=([1990, 1991, 1992], [0.3, 0.35, 0.4], [0.31, 0.34, 0.39]),
        result_table=stats,
    )
    doc = open(out, encoding="utf-8").read()
    assert doc.startswith("<!DOCTYPE html>")
    # user data is escaped, not interpolated as markup
    assert "no trend &lt;x&gt;" in doc and "&lt;summary&gt;" in doc
    assert doc.count("<svg") == 2
    assert "<table>" in doc
