"""S9 dashboard sink (reference create_dashboard_visualizations,
main.py:693-725, and the write_html calls at main.py:777-787).

The reference renders three plotly figures to standalone HTML files.
What matters engine-side is the DATA PATH, and that is where this
module is designed for scale: each figure consumes a pre-aggregated
catalog query result (monthly_sales ~dozens of rows, segment_rollup
~5, top_products 10), so the only driver-side collect is a tiny
final aggregate. At 100 TB the heavy lifting stays distributed and
the dashboard cost is constant in corpus size.

Rendering: plotly is not in this container, so the default renderer
is a dependency-free static inline-SVG page (line + bar forms, one
validated hue, hover titles, and a data table under each chart for
accessibility). If plotly IS importable it is used instead, matching
the reference's interactive output byte-for-spirit.

Deliberate deviation: the reference's segment PIE becomes a BAR —
ranked magnitude comparison reads off a shared baseline; the data
and filenames are unchanged.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame, SparkSession

# Single-series charts: one categorical slot + surface/ink tokens
# (validated palette; text never wears the series color).
_SERIES = "#2a78d6"
_SURFACE = "#fcfcfb"
_INK = "#333333"
_MUTED = "#757570"
_GRID = "#e8e8e4"

_W, _H = 720, 300
_PAD_L, _PAD_R, _PAD_T, _PAD_B = 60, 16, 40, 70


def dashboard_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The three pre-aggregated inputs (reference analytics_data)."""
    from simpleetlpipeline_spark.plans.analytics import (
        monthly_sales,
        segment_rollup,
        top_products,
    )

    return {
        "sales_trend": monthly_sales(spark, sf_dir),
        "customer_segments": segment_rollup(spark, sf_dir),
        "top_products": top_products(spark, sf_dir),
    }


def write_dashboard(spark: SparkSession, sf_dir: str,
                    out_dir: str) -> list[str]:
    """Render the three dashboard HTML files (reference filenames,
    main.py:780-782). Returns the written paths."""
    frames = dashboard_frames(spark, sf_dir)
    spec = {
        "sales_trend": ("Monthly Sales Trend", "month", "total_revenue",
                        "line"),
        "customer_segments": ("Account Balance by Customer Segment",
                              "customer_segment", "total_acctbal", "bar"),
        "top_products": ("Top 10 Products by Revenue", "p_name",
                         "total_revenue", "bar"),
    }
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, (title, x, y, form) in spec.items():
        rows = [(r[x], float(r[y])) for r in frames[name].collect()]
        path = os.path.join(out_dir, f"{name}_dashboard.html")
        with open(path, "w") as f:
            f.write(_render_page(title, x, y, rows, form))
        paths.append(path)
    return paths


def _render_page(title: str, x_name: str, y_name: str,
                 rows: list[tuple], form: str) -> str:
    try:  # pragma: no cover - plotly absent in this container
        import plotly.express as px

        import pandas as pd
        df = pd.DataFrame(rows, columns=[x_name, y_name])
        fig = (px.line if form == "line" else px.bar)(
            df, x=x_name, y=y_name, title=title)
        fig.update_traces(marker_color=_SERIES) if form == "bar" else None
        return fig.to_html(full_html=True)
    except ImportError:
        pass
    svg = _svg_chart(rows, form)
    table = "".join(
        f"<tr><td>{html.escape(str(k))}</td><td>{v:,.2f}</td></tr>"
        for k, v in rows)
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title><style>
body{{background:{_SURFACE};color:{_INK};font:14px system-ui,sans-serif;
     max-width:760px;margin:2em auto}}
h1{{font-size:18px}} table{{border-collapse:collapse;margin-top:1em}}
td,th{{border:1px solid {_GRID};padding:4px 10px;text-align:left}}
caption{{color:{_MUTED};text-align:left;padding:4px 0}}
</style></head><body>
<h1>{html.escape(title)}</h1>
{svg}
<table><caption>Data table: {html.escape(x_name)} vs
{html.escape(y_name)}</caption>
<tr><th>{html.escape(x_name)}</th><th>{html.escape(y_name)}</th></tr>
{table}</table>
</body></html>
"""


def _scale(rows: list[tuple]):
    top = max((v for _, v in rows), default=1.0) or 1.0
    plot_w = _W - _PAD_L - _PAD_R
    plot_h = _H - _PAD_T - _PAD_B
    return top, plot_w, plot_h


def _svg_chart(rows: list[tuple], form: str) -> str:
    top, plot_w, plot_h = _scale(rows)
    n = max(len(rows), 1)
    parts = [f'<svg viewBox="0 0 {_W} {_H}" role="img" '
             f'font-family="system-ui" font-size="11">']
    # recessive horizontal grid + y labels (muted ink, not series color)
    for i in range(5):
        gy = _PAD_T + plot_h * i / 4
        val = top * (1 - i / 4)
        parts.append(f'<line x1="{_PAD_L}" y1="{gy:.1f}" x2="{_W - _PAD_R}" '
                     f'y2="{gy:.1f}" stroke="{_GRID}" stroke-width="1"/>')
        parts.append(f'<text x="{_PAD_L - 6}" y="{gy + 4:.1f}" '
                     f'text-anchor="end" fill="{_MUTED}">{val:,.0f}</text>')
    if form == "line":
        pts = []
        for i, (_, v) in enumerate(rows):
            px_ = _PAD_L + plot_w * (i / max(n - 1, 1))
            py = _PAD_T + plot_h * (1 - v / top)
            pts.append(f"{px_:.1f},{py:.1f}")
        parts.append(f'<polyline points="{" ".join(pts)}" fill="none" '
                     f'stroke="{_SERIES}" stroke-width="2"/>')
        for i, (k, v) in enumerate(rows):
            px_ = _PAD_L + plot_w * (i / max(n - 1, 1))
            py = _PAD_T + plot_h * (1 - v / top)
            parts.append(
                f'<circle cx="{px_:.1f}" cy="{py:.1f}" r="3" '
                f'fill="{_SERIES}"><title>{html.escape(str(k))}: '
                f'{v:,.2f}</title></circle>')
    else:
        bw = plot_w / n
        for i, (k, v) in enumerate(rows):
            bh = plot_h * v / top
            bx = _PAD_L + bw * i + 2  # 2px surface gap between bars
            by = _PAD_T + plot_h - bh
            parts.append(
                f'<rect x="{bx:.1f}" y="{by:.1f}" width="{bw - 4:.1f}" '
                f'height="{bh:.1f}" rx="2" fill="{_SERIES}">'
                f'<title>{html.escape(str(k))}: {v:,.2f}</title></rect>')
    # x labels, rotated when crowded (reference tickangle=45)
    step = max(1, n // 12)
    for i, (k, _) in enumerate(rows):
        if i % step:
            continue
        lx = (_PAD_L + plot_w * (i / max(n - 1, 1)) if form == "line"
              else _PAD_L + plot_w / n * (i + 0.5))
        label = html.escape(str(k)[:18])
        parts.append(
            f'<text x="{lx:.1f}" y="{_H - _PAD_B + 16}" fill="{_MUTED}" '
            f'text-anchor="end" transform="rotate(-40 {lx:.1f} '
            f'{_H - _PAD_B + 16})">{label}</text>')
    parts.append("</svg>")
    return "".join(parts)
