"""Runnable render layer: the reference's Streamlit+Plotly dashboard
(/root/reference/interactive_dashboard.py:30-120) re-expressed as a static,
dependency-free HTML report over the engine's pushdown widget queries
(analytics/dashboard.py).

The reference ships whole tables to the browser and lets plotly aggregate;
here every figure is computed by Spark (histogram_numeric / histogram_time /
top_k / scatter_sample / quality_report return render-sized results) and the
driver only assembles inline SVG — the shape that still works when the
tables are 100 TB. No Streamlit/plotly in the container, so the output is a
self-contained .html anyone can open; the widget inventory matches the
reference tab-for-tab (preview, numeric histogram, scatter, records over
time, categorical top-N, data-quality tab for logs).
"""

from __future__ import annotations

import html
from collections.abc import Sequence

from pyspark.sql import DataFrame

from assignment_etl_spark.analytics.dashboard import (
    classify_columns,
    numeric_histogram,
    quality_report,
    records_over_time,
    scatter_sample,
    top_categories,
)

_W, _H, _PAD = 640, 220, 40
_PALETTE = ["#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#76b7b2", "#edc948"]


def _esc(v: object) -> str:
    return html.escape(str(v))


def _svg_bars(labels: Sequence[object], values: Sequence[float], title: str) -> str:
    """Minimal inline-SVG bar chart (the px.histogram / px.bar stand-in)."""
    if not values:
        return f"<p>(no data for {_esc(title)})</p>"
    vmax = max(values) or 1.0
    n = len(values)
    bw = (_W - 2 * _PAD) / n
    bars, ticks = [], []
    for i, (lab, val) in enumerate(zip(labels, values)):
        h = (val / vmax) * (_H - 2 * _PAD)
        x = _PAD + i * bw
        bars.append(
            f'<rect x="{x:.1f}" y="{_H - _PAD - h:.1f}" width="{max(bw - 2, 1):.1f}" '
            f'height="{h:.1f}" fill="{_PALETTE[0]}"><title>{_esc(lab)}: {val}</title></rect>'
        )
        if n <= 12 or i % max(1, n // 12) == 0:
            ticks.append(
                f'<text x="{x + bw / 2:.1f}" y="{_H - _PAD + 14}" font-size="9" '
                f'text-anchor="middle">{_esc(str(lab)[:12])}</text>'
            )
    return (
        f'<svg viewBox="0 0 {_W} {_H}" role="img" aria-label="{_esc(title)}">'
        f'<text x="{_W / 2}" y="16" text-anchor="middle" font-size="13">{_esc(title)}</text>'
        f'<line x1="{_PAD}" y1="{_H - _PAD}" x2="{_W - _PAD}" y2="{_H - _PAD}" stroke="#888"/>'
        + "".join(bars)
        + "".join(ticks)
        + "</svg>"
    )


def _svg_scatter(
    xs: Sequence[float], ys: Sequence[float], cats: Sequence[object], title: str
) -> str:
    """px.scatter stand-in; categorical color wheel like the reference's
    optional color-by widget."""
    pts = [(x, y, c) for x, y, c in zip(xs, ys, cats) if x is not None and y is not None]
    if not pts:
        return f"<p>(no data for {_esc(title)})</p>"
    xlo, xhi = min(p[0] for p in pts), max(p[0] for p in pts)
    ylo, yhi = min(p[1] for p in pts), max(p[1] for p in pts)
    xspan, yspan = (xhi - xlo) or 1.0, (yhi - ylo) or 1.0
    color_of: dict[object, str] = {}
    dots = []
    for x, y, c in pts:
        col = color_of.setdefault(c, _PALETTE[len(color_of) % len(_PALETTE)])
        px_ = _PAD + (x - xlo) / xspan * (_W - 2 * _PAD)
        py_ = _H - _PAD - (y - ylo) / yspan * (_H - 2 * _PAD)
        dots.append(f'<circle cx="{px_:.1f}" cy="{py_:.1f}" r="2.4" fill="{col}" fill-opacity="0.7"/>')
    legend = "".join(
        f'<text x="{_W - _PAD + 2}" y="{30 + 14 * i}" font-size="10" fill="{col}">{_esc(str(c)[:14])}</text>'
        for i, (c, col) in enumerate(list(color_of.items())[:8])
    )
    return (
        f'<svg viewBox="0 0 {_W + 110} {_H}" role="img" aria-label="{_esc(title)}">'
        f'<text x="{_W / 2}" y="16" text-anchor="middle" font-size="13">{_esc(title)}</text>'
        f'<line x1="{_PAD}" y1="{_H - _PAD}" x2="{_W - _PAD}" y2="{_H - _PAD}" stroke="#888"/>'
        f'<line x1="{_PAD}" y1="{_PAD}" x2="{_PAD}" y2="{_H - _PAD}" stroke="#888"/>'
        + "".join(dots) + legend + "</svg>"
    )


def _html_table(rows: list[dict], max_rows: int = 25) -> str:
    if not rows:
        return "<p>(empty)</p>"
    cols = list(rows[0].keys())
    head = "".join(f"<th>{_esc(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_esc(r.get(c))}</td>" for c in cols) + "</tr>"
        for r in rows[:max_rows]
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def render_table_section(df: DataFrame, name: str, *, id_col: str | None = None) -> str:
    """One table's tab set: preview + numeric/datetime/categorical widgets
    (reference tabs at interactive_dashboard.py:52-121)."""
    kinds = classify_columns(df)
    parts = [f"<h2>{_esc(name)}</h2>", "<h3>Preview</h3>",
             _html_table([r.asDict() for r in df.limit(5).collect()])]

    for c in kinds["numeric"][:3]:
        hist = numeric_histogram(df, c, nbins=30).collect()
        parts.append(_svg_bars([r["bucket"] for r in hist],
                               [r["count"] for r in hist], f"Distribution of {c}"))
    if len(kinds["numeric"]) >= 2:
        x, y = kinds["numeric"][0], kinds["numeric"][1]
        color = kinds["categorical"][0] if kinds["categorical"] else None
        pts = scatter_sample(df, x, y, color, max_points=1000, id_col=id_col).collect()
        parts.append(_svg_scatter(
            [r[x] for r in pts], [r[y] for r in pts],
            [r[color] if color else "all" for r in pts],
            f"{y} vs {x}" + (f" colored by {color}" if color else "")))
    for c in kinds["datetime"][:2]:
        hist = records_over_time(df, c, nbins=50).collect()
        parts.append(_svg_bars([r["bucket"] for r in hist],
                               [r["count"] for r in hist], f"Records over time by {c}"))
    for c in kinds["categorical"][:2]:
        top = top_categories(df, c, k=10).collect()
        parts.append(_svg_bars([r[c] for r in top], [r["count"] for r in top],
                               f"Top 10 values of {c}"))
    return "\n".join(parts)


def render_quality_section(logs_df: DataFrame) -> str:
    """The Data Quality tab (reference interactive_dashboard.py:134-186)."""
    rep = quality_report(logs_df)
    reasons = rep["reason_counts"].collect()
    parts = ["<h2>Data Quality</h2>",
             _svg_bars([r["reason"] for r in reasons], [r["count"] for r in reasons],
                       "Log entries per reason"),
             "<h3>File × reason</h3>",
             _html_table([r.asDict() for r in rep["file_reason_counts"].collect()]),
             "<h3>Affected entities</h3>",
             _html_table([r.asDict() for r in rep["affected_entities"].collect()])]
    return "\n".join(parts)


def render_dashboard(
    tables: dict[str, DataFrame],
    out_path: str,
    *,
    logs_table: str = "logs",
    id_cols: dict[str, str] | None = None,
) -> str:
    """Write the full static dashboard; returns out_path. ``id_cols`` maps
    table → integral key enabling the deterministic scatter sample."""
    id_cols = id_cols or {}
    sections = []
    for name, df in tables.items():
        if name == logs_table:
            sections.append(render_quality_section(df))
        else:
            sections.append(render_table_section(df, name, id_col=id_cols.get(name)))
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>ETL Data Distribution Dashboard</title>"
        "<style>body{font-family:sans-serif;max-width:820px;margin:auto}"
        "table{border-collapse:collapse;font-size:12px}"
        "td,th{border:1px solid #ccc;padding:2px 6px}svg{display:block;margin:12px 0}"
        "</style></head><body><h1>ETL Data Distribution Dashboard</h1>"
        + "\n".join(sections)
        + "</body></html>"
    )
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(doc)
    return out_path
