"""Dependency-free SVG chart renderers — the presentation layer for the
reference's matplotlib/seaborn figures (``/root/reference/amazon1.py:
66-110``: 30-bin histograms, KDE-overlaid histogram, two scatter plots
(one log-x), annotated correlation heatmap, wordcloud; mirrored in the
R twin ``big datarr.R:72-118``).

Contract (same as ``sources/html.py``): every chart renders a BOUNDED,
already-aggregated result on the driver. The distributed work — binning,
kernel evaluation, corr(), token counting, sampling — happens upstream
in the registered queries (``orders_price_histogram``, ``discount_kde``,
``lineitem_correlations``, ``word_frequency``, the scatter projections);
what arrives here is a handful of rows. Nothing in this module touches
an RDD/DataFrame except the explicit ``limit``-capped collectors, so at
100 TB the figures cost exactly what the aggregates cost.

Charts are pure-string SVG (no matplotlib/seaborn/wordcloud in this
environment, and a rendering dependency would be the only one in the
engine). Deterministic output: same input rows -> byte-identical SVG.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

# One shared palette/geometry so a report reads as one system.
_W, _H = 640, 360
_ML, _MR, _MT, _MB = 55, 15, 30, 45  # margins: left right top bottom
_FG = "#1a3550"
_ACCENT = "#2a7f8f"
_GRID = "#d8dee4"


def _header(title: str, w: int = _W, h: int = _H) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'viewBox="0 0 {w} {h}" font-family="sans-serif">',
        f'<text x="{w / 2:.0f}" y="18" text-anchor="middle" font-size="14" '
        f'fill="{_FG}">{escape(title)}</text>',
    ]


def _axes(x_label: str, y_label: str, w: int = _W, h: int = _H) -> list[str]:
    return [
        f'<line x1="{_ML}" y1="{h - _MB}" x2="{w - _MR}" y2="{h - _MB}" '
        f'stroke="{_FG}" stroke-width="1"/>',
        f'<line x1="{_ML}" y1="{_MT}" x2="{_ML}" y2="{h - _MB}" '
        f'stroke="{_FG}" stroke-width="1"/>',
        f'<text x="{(_ML + w - _MR) / 2:.0f}" y="{h - 8}" text-anchor="middle" '
        f'font-size="11" fill="{_FG}">{escape(x_label)}</text>',
        f'<text x="14" y="{(h - _MB + _MT) / 2:.0f}" text-anchor="middle" '
        f'font-size="11" fill="{_FG}" '
        f'transform="rotate(-90 14 {(h - _MB + _MT) / 2:.0f})">{escape(y_label)}</text>',
    ]


def _fmt(v: float) -> str:
    if v == 0:
        return "0"
    if abs(v) >= 10000 or abs(v) < 0.01:
        return f"{v:.2g}"
    return f"{v:g}" if float(v).is_integer() else f"{v:.2f}"


def _yticks(vmax: float, h: int = _H) -> list[str]:
    out = []
    for i in range(5):
        frac = i / 4
        y = h - _MB - frac * (h - _MB - _MT)
        out.append(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" '
            f'stroke="{_GRID}" stroke-width="0.5"/>'
        )
        out.append(
            f'<text x="{_ML - 5}" y="{y + 3:.1f}" text-anchor="end" '
            f'font-size="9" fill="{_FG}">{_fmt(frac * vmax)}</text>'
        )
    return out


def svg_histogram(
    bins: list[tuple[float, float, int]], *, title: str = "Histogram",
    x_label: str = "value", y_label: str = "count",
) -> str:
    """Bar chart of pre-computed equi-width bins [(lo, hi, count)] —
    the render half of ``amazon1.py:68`` (``df.hist(bins=30)``) whose
    compute half is ``relational.histogram``."""
    if not bins:
        raise ValueError("svg_histogram: empty bins")
    bins = sorted(bins)
    vmax = max(c for _, _, c in bins) or 1
    lo0, hi_n = bins[0][0], bins[-1][1]
    span = (hi_n - lo0) or 1.0
    pw = _W - _ML - _MR
    ph = _H - _MT - _MB
    parts = _header(title) + _yticks(vmax)
    for lo, hi, c in bins:
        x = _ML + (lo - lo0) / span * pw
        w = max((hi - lo) / span * pw - 1, 1)
        bh = c / vmax * ph
        parts.append(
            f'<rect x="{x:.1f}" y="{_H - _MB - bh:.1f}" width="{w:.1f}" '
            f'height="{bh:.1f}" fill="{_ACCENT}" stroke="#ffffff" stroke-width="0.5">'
            f"<title>[{_fmt(lo)}, {_fmt(hi)}): {c}</title></rect>"
        )
    for frac in (0, 0.5, 1.0):
        xv = lo0 + frac * span
        x = _ML + frac * pw
        parts.append(
            f'<text x="{x:.0f}" y="{_H - _MB + 14}" text-anchor="middle" '
            f'font-size="9" fill="{_FG}">{_fmt(xv)}</text>'
        )
    parts += _axes(x_label, y_label)
    parts.append("</svg>")
    return "\n".join(parts)


def svg_line(
    points: list[tuple[float, float]], *, title: str = "Line",
    x_label: str = "x", y_label: str = "y",
) -> str:
    """Polyline through pre-computed (x, y) grid points — the KDE curve
    of ``amazon1.py:92`` (``histplot(..., kde=True)``) whose compute
    half is the ``discount_kde`` grouped aggregate."""
    if not points:
        raise ValueError("svg_line: empty points")
    pts = sorted(points)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    x0, x1 = min(xs), max(xs)
    ymax = max(ys) or 1.0
    xspan = (x1 - x0) or 1.0
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    coords = " ".join(
        f"{_ML + (x - x0) / xspan * pw:.1f},{_H - _MB - y / ymax * ph:.1f}"
        for x, y in pts
    )
    parts = _header(title) + _yticks(ymax)
    parts.append(
        f'<polyline points="{coords}" fill="none" stroke="{_ACCENT}" stroke-width="2"/>'
    )
    for x, y in pts:
        parts.append(
            f'<circle cx="{_ML + (x - x0) / xspan * pw:.1f}" '
            f'cy="{_H - _MB - y / ymax * ph:.1f}" r="2.5" fill="{_ACCENT}">'
            f"<title>({_fmt(x)}, {_fmt(y)})</title></circle>"
        )
    for frac in (0, 0.5, 1.0):
        parts.append(
            f'<text x="{_ML + frac * pw:.0f}" y="{_H - _MB + 14}" '
            f'text-anchor="middle" font-size="9" fill="{_FG}">'
            f"{_fmt(x0 + frac * xspan)}</text>"
        )
    parts += _axes(x_label, y_label)
    parts.append("</svg>")
    return "\n".join(parts)


def svg_scatter(
    points: list[tuple[float, float]], *, title: str = "Scatter",
    x_label: str = "x", y_label: str = "y", log_x: bool = False,
) -> str:
    """Scatter of a BOUNDED pre-sampled projection — ``amazon1.py:73-85``
    (price-vs-ratings and the log-x ratings-count scatter). The sample
    cap is the caller's job (``scatter_sample`` collects ≤ a fixed N);
    an uncapped scatter is just a slower histogram."""
    if log_x:
        points = [(x, y) for x, y in points if x > 0]
        tx = math.log10
    else:
        tx = float
    if not points:
        raise ValueError(
            "svg_scatter: no plottable points"
            + (" (log_x drops x <= 0)" if log_x else "")
        )
    xs = [tx(x) for x, _ in points]
    ys = [y for _, y in points]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    xspan, yspan = (x1 - x0) or 1.0, (y1 - y0) or 1.0
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    parts = _header(title)
    for (x, y), txv in zip(points, xs):
        px = _ML + (txv - x0) / xspan * pw
        py = _H - _MB - (y - y0) / yspan * ph
        parts.append(
            f'<circle cx="{px:.1f}" cy="{py:.1f}" r="2.5" fill="{_ACCENT}" '
            f'fill-opacity="0.55"><title>({_fmt(x)}, {_fmt(y)})</title></circle>'
        )
    for frac in (0, 0.5, 1.0):
        xv = x0 + frac * xspan
        label = _fmt(10 ** xv) if log_x else _fmt(xv)
        parts.append(
            f'<text x="{_ML + frac * pw:.0f}" y="{_H - _MB + 14}" '
            f'text-anchor="middle" font-size="9" fill="{_FG}">{label}</text>'
        )
        yv = y0 + frac * yspan
        parts.append(
            f'<text x="{_ML - 5}" y="{_H - _MB - frac * ph + 3:.0f}" '
            f'text-anchor="end" font-size="9" fill="{_FG}">{_fmt(yv)}</text>'
        )
    parts += _axes(x_label + (" (log scale)" if log_x else ""), y_label)
    parts.append("</svg>")
    return "\n".join(parts)


def svg_heatmap(
    labels: list[str], values: dict[tuple[str, str], float], *,
    title: str = "Correlation Heatmap", annot: bool = True,
) -> str:
    """Annotated square heatmap over (row, col) -> value in [-1, 1] —
    ``amazon1.py:97-101`` (``sns.heatmap(corr_matrix, annot=True)``).
    Missing cells render blank; the diagonal defaults to 1. Color maps
    -1 -> blue, 0 -> white, +1 -> red (diverging, symmetric)."""
    if not labels:
        raise ValueError("svg_heatmap: no labels")
    n = len(labels)
    side = min((_W - _ML - _MR) / n, (_H - _MT - _MB) / n)
    parts = _header(title)

    def color(v: float) -> str:
        v = max(-1.0, min(1.0, v))
        if v >= 0:
            r, g, b = 255, int(255 * (1 - v)), int(255 * (1 - v))
        else:
            r, g, b = int(255 * (1 + v)), int(255 * (1 + v)), 255
        return f"rgb({r},{g},{b})"

    for i, ri in enumerate(labels):
        for j, cj in enumerate(labels):
            v = values.get((ri, cj), values.get((cj, ri)))
            if v is None and i == j:
                v = 1.0
            x = _ML + j * side
            y = _MT + i * side
            if v is None:
                parts.append(
                    f'<rect x="{x:.1f}" y="{y:.1f}" width="{side:.1f}" '
                    f'height="{side:.1f}" fill="none" stroke="{_GRID}"/>'
                )
                continue
            parts.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{side:.1f}" '
                f'height="{side:.1f}" fill="{color(v)}" stroke="#ffffff">'
                f"<title>{escape(ri)} / {escape(cj)}: {v:.2f}</title></rect>"
            )
            if annot:
                parts.append(
                    f'<text x="{x + side / 2:.1f}" y="{y + side / 2 + 3:.1f}" '
                    f'text-anchor="middle" font-size="10" fill="{_FG}">{v:.2f}</text>'
                )
    for i, lab in enumerate(labels):
        parts.append(
            f'<text x="{_ML + i * side + side / 2:.1f}" '
            f'y="{_MT + n * side + 12:.1f}" text-anchor="middle" font-size="9" '
            f'fill="{_FG}">{escape(lab)}</text>'
        )
        parts.append(
            f'<text x="{_ML - 4}" y="{_MT + i * side + side / 2 + 3:.1f}" '
            f'text-anchor="end" font-size="9" fill="{_FG}">{escape(lab)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_wordcloud(
    word_counts: list[tuple[str, int]], *, title: str = "Word Frequency",
    max_words: int = 60,
) -> str:
    """Frequency-sized word layout — ``amazon1.py:104-110``'s WordCloud,
    re-expressed deterministically: top-``max_words`` by count, font
    size ∝ sqrt(count) (area ∝ count, the wordcloud convention), flowed
    left-to-right in descending order with width-aware wrapping. No
    randomized spiral packing — same input, same SVG, so the figure is
    testable; the data half is the distributed ``word_frequency`` agg,
    never a driver-side corpus concat."""
    if not word_counts:
        raise ValueError("svg_wordcloud: empty input")
    top = sorted(word_counts, key=lambda wc: (-wc[1], wc[0]))[:max_words]
    cmax = top[0][1] or 1
    parts = _header(title)
    x, y, line_h = 12.0, 60.0, 0.0
    palette = [_ACCENT, "#8f5a2a", "#2a8f55", "#5a2a8f", _FG]
    for i, (w, c) in enumerate(top):
        size = 10 + 26 * math.sqrt(c / cmax)
        est_w = 0.62 * size * len(w) + 10
        if x + est_w > _W - 12 and x > 12:
            x, y = 12.0, y + line_h + 6
            line_h = 0.0
        if y > _H - 20:
            break
        parts.append(
            f'<text x="{x:.1f}" y="{y:.1f}" font-size="{size:.1f}" '
            f'fill="{palette[i % len(palette)]}">{escape(w)}'
            f"<title>{escape(w)}: {c}</title></text>"
        )
        x += est_w
        line_h = max(line_h, size)
    parts.append("</svg>")
    return "\n".join(parts)
