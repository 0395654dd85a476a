"""HTML report sink (reference S6 — the Bokeh presentation stage).

The reference renders result tables into HTML with Bokeh pie charts,
pixel maps, and series plots served by Flask
(``TrendEngine/calculations/polytrend.py:38-178`` polygon pies+maps,
``polytrend.py:181-249`` point series plot,
``dbest.py:203-289,292-440``). The engine keeps presentation a THIN
CLIENT over bounded result tables: these helpers collect a small
result DataFrame (the per-class stats table, a single pixel's series —
both bounded by contract, never a fact table) and emit a
self-contained static HTML file with inline SVG — no Bokeh, no web
framework, no JS dependency, nothing to install.

Scale note: rendering is a driver-side post-processing step over
ALREADY-AGGREGATED rows (≤ thousands); the 100 TB path ends at the
CSV/parquet sinks, and this stage consumes their small outputs.
"""

from __future__ import annotations

import html
from typing import Sequence

from pyspark.sql import DataFrame

#: categorical palette for pie/series marks (brand-neutral).
_COLORS = [
    "#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
    "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0",
]

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #222; }}
h1 {{ font-size: 1.3rem; }} h2 {{ font-size: 1.05rem; margin-top: 2rem; }}
table {{ border-collapse: collapse; margin: 1rem 0; }}
th, td {{ border: 1px solid #ccc; padding: .35rem .6rem; font-size: .85rem; }}
th {{ background: #f5f5f5; text-align: left; }}
figure {{ margin: 1rem 0; }}
figcaption {{ font-size: .8rem; color: #555; }}
</style></head><body>
<h1>{title}</h1>
{body}
</body></html>
"""


def _table_html(df: DataFrame, max_rows: int) -> str:
    rows = df.limit(max_rows + 1).collect()
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows[:max_rows]
    )
    note = (
        f"<p><em>first {max_rows} rows shown</em></p>" if len(rows) > max_rows else ""
    )
    return f"<table><tr>{head}</tr>{body}</table>{note}"


def _pie_svg(labels: Sequence[str], values: Sequence[float], size: int = 220) -> str:
    """Pie chart as inline SVG (reference's Bokeh wedge plot,
    ``polytrend.py:57-73``: value/total·2π per class)."""
    import math

    total = float(sum(values)) or 1.0
    cx = cy = size / 2
    r = size / 2 - 4
    parts, legend = [], []
    angle = -math.pi / 2
    for i, (lab, v) in enumerate(zip(labels, values)):
        frac = float(v) / total
        a2 = angle + frac * 2 * math.pi
        large = 1 if frac > 0.5 else 0
        x1, y1 = cx + r * math.cos(angle), cy + r * math.sin(angle)
        x2, y2 = cx + r * math.cos(a2), cy + r * math.sin(a2)
        color = _COLORS[i % len(_COLORS)]
        if frac >= 0.999:  # full circle: arc endpoints coincide
            parts.append(
                f'<circle cx="{cx}" cy="{cy}" r="{r}" fill="{color}"/>'
            )
        elif frac > 0:
            parts.append(
                f'<path d="M{cx},{cy} L{x1:.2f},{y1:.2f} '
                f'A{r},{r} 0 {large} 1 {x2:.2f},{y2:.2f} Z" fill="{color}"/>'
            )
        legend.append(
            f'<tspan x="{size + 12}" dy="1.2em">'
            f'<tspan fill="{color}">■</tspan> {html.escape(str(lab))}: '
            f"{v} ({100 * frac:.1f}%)</tspan>"
        )
        angle = a2
    legend_svg = f'<text y="10" font-size="12">{"".join(legend)}</text>'
    return (
        f'<svg width="{size + 240}" height="{size}" '
        f'xmlns="http://www.w3.org/2000/svg">{"".join(parts)}{legend_svg}</svg>'
    )


def _series_svg(
    xs: Sequence[float], ys: Sequence[float], fit: Sequence[float] | None = None,
    width: int = 640, height: int = 240,
) -> str:
    """Time-series line plot with optional fitted curve (reference's
    point-AOI series plot, ``polytrend.py:213-239``)."""
    if not xs:
        return "<svg/>"
    pad = 30
    x0, x1 = min(xs), max(xs)
    all_y = list(ys) + (list(fit) if fit else [])
    y0, y1 = min(all_y), max(all_y)
    xr = (x1 - x0) or 1.0
    yr = (y1 - y0) or 1.0

    def pt(x, y):
        px = pad + (x - x0) / xr * (width - 2 * pad)
        py = height - pad - (y - y0) / yr * (height - 2 * pad)
        return f"{px:.1f},{py:.1f}"

    line = " ".join(pt(x, y) for x, y in zip(xs, ys))
    fit_line = (
        f'<polyline points="{" ".join(pt(x, y) for x, y in zip(xs, fit))}" '
        f'fill="none" stroke="{_COLORS[2]}" stroke-width="2"/>'
        if fit
        else ""
    )
    return (
        f'<svg width="{width}" height="{height}" '
        f'xmlns="http://www.w3.org/2000/svg">'
        f'<rect width="{width}" height="{height}" fill="#fafafa"/>'
        f'<polyline points="{line}" fill="none" stroke="{_COLORS[0]}" '
        f'stroke-width="1.5"/>{fit_line}'
        f'<text x="{pad}" y="{height - 8}" font-size="11">{x0:g}</text>'
        f'<text x="{width - pad}" y="{height - 8}" font-size="11" '
        f'text-anchor="end">{x1:g}</text>'
        f'<text x="4" y="{pad}" font-size="11">{y1:g}</text>'
        f'<text x="4" y="{height - pad}" font-size="11">{y0:g}</text>'
        f"</svg>"
    )


def write_html_report(
    path: str,
    title: str,
    stats: DataFrame | None = None,
    pie: tuple[str, str, DataFrame] | None = None,
    series: tuple[Sequence[float], Sequence[float], Sequence[float] | None] | None = None,
    result_table: DataFrame | None = None,
    max_rows: int = 200,
) -> str:
    """Render a self-contained HTML report (reference S6).

    ``pie`` = (label_col, value_col, small DataFrame) — the per-class
    roll-up pies of the polygon flow (``polytrend.py:38-126``);
    ``series`` = (xs, ys, fit or None) — the point-flow series plot;
    ``stats``/``result_table`` render as tables. Returns the path.
    """
    sections = []
    if stats is not None:
        sections.append("<h2>Summary statistics</h2>" + _table_html(stats, max_rows))
    if pie is not None:
        label_col, value_col, pdf = pie
        rows = pdf.select(label_col, value_col).collect()
        sections.append(
            "<h2>Class distribution</h2><figure>"
            + _pie_svg([r[0] for r in rows], [r[1] for r in rows])
            + "<figcaption>per-class share (reference wedge plot)</figcaption></figure>"
        )
    if series is not None:
        xs, ys, fit = series
        sections.append(
            "<h2>Time series</h2><figure>"
            + _series_svg(list(xs), list(ys), list(fit) if fit is not None else None)
            + "<figcaption>observed (blue) vs fitted (red)</figcaption></figure>"
        )
    if result_table is not None:
        sections.append("<h2>Result table</h2>" + _table_html(result_table, max_rows))
    doc = _PAGE.format(title=html.escape(title), body="\n".join(sections))
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(doc)
    return path
