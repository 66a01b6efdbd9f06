"""Benchmark plot sinks — the engine-side replacement for the reference's
matplotlib-cpp figures (lsh_benchmark.h:167-192), closing the one
previously-unported operator row.

The sandbox has no matplotlib, so the sink renders standalone SVG with no
dependencies: line charts with a fixed-order categorical palette
(validated for CVD separation and surface contrast), 2 px lines, 8 px
point markers, a legend for multi-series panels plus direct end-of-line
labels, recessive grid/axes, and text in ink tokens (never the series
color).  Benchmark series are tiny (one point per n_sample grid value),
so collecting them driver-side is the correct sink behavior — the same
boundedness argument as the reference, which accumulates them in vectors
before plotting.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from xml.sax.saxutils import escape

# validated palette (light surface #fcfcfb): slots assigned in fixed order
SERIES_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e7e6e2"


@dataclass
class Series:
    name: str
    xs: list
    ys: list


@dataclass
class Panel:
    title: str
    series: list  # list[Series]
    xlabel: str = ""
    ylabel: str = ""
    margin: tuple = (54, 40, 46, 64)  # top, right, bottom, left


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n 1/2/5-stepped ticks covering [lo, hi]."""
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(n - 1, 1)
    mag = 10.0 ** math.floor(math.log10(raw))
    step = next(s * mag for s in (1, 2, 5, 10) if s * mag >= raw)
    t0 = math.floor(lo / step) * step
    ticks = []
    t = t0
    while t <= hi + step * 1e-9:
        if t >= lo - step * 1e-9:
            ticks.append(round(t, 10))
        t += step
    return ticks or [lo, hi]


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return f"{v:.4g}"


def _render_panel(p: Panel, x0: int, y0: int, w: int, h: int) -> list[str]:
    mt, mr, mb, ml = p.margin
    px, py = x0 + ml, y0 + mt
    pw, ph = w - ml - mr, h - mt - mb
    all_x = [x for s in p.series for x in s.xs]
    all_y = [y for s in p.series for y in s.ys]
    if not all_x:
        # empty panel (failed/empty benchmark): a labeled placeholder,
        # not a crash at the plotting step
        return [f'<text x="{x0 + w / 2:.0f}" y="{y0 + h / 2:.0f}" '
                f'text-anchor="middle" fill="{INK_2}" font-size="12">'
                f'{escape(p.title)}: no data</text>']
    xt = _nice_ticks(min(all_x), max(all_x))
    yt = _nice_ticks(min(min(all_y), 0.0) if min(all_y) > 0 else min(all_y),
                     max(all_y))
    xlo, xhi = min(xt[0], min(all_x)), max(xt[-1], max(all_x))
    ylo, yhi = min(yt[0], min(all_y)), max(yt[-1], max(all_y))

    def sx(v):
        return px + (v - xlo) / (xhi - xlo or 1) * pw

    def sy(v):
        return py + ph - (v - ylo) / (yhi - ylo or 1) * ph

    out = [f'<text x="{x0 + w / 2:.0f}" y="{y0 + 22}" text-anchor="middle" '
           f'fill="{INK}" font-size="14" font-weight="600">{escape(p.title)}</text>']
    # recessive grid + tick labels (ink tokens, not series color)
    for t in yt:
        y = sy(t)
        out.append(f'<line x1="{px}" y1="{y:.1f}" x2="{px + pw}" y2="{y:.1f}" '
                   f'stroke="{GRID}" stroke-width="1"/>')
        out.append(f'<text x="{px - 8}" y="{y + 4:.1f}" text-anchor="end" '
                   f'fill="{INK_2}" font-size="11">{_fmt(t)}</text>')
    for t in xt:
        x = sx(t)
        out.append(f'<text x="{x:.1f}" y="{py + ph + 18}" text-anchor="middle" '
                   f'fill="{INK_2}" font-size="11">{_fmt(t)}</text>')
    out.append(f'<line x1="{px}" y1="{py + ph}" x2="{px + pw}" y2="{py + ph}" '
               f'stroke="{INK_2}" stroke-width="1"/>')
    if p.xlabel:
        out.append(f'<text x="{px + pw / 2:.0f}" y="{py + ph + 38}" '
                   f'text-anchor="middle" fill="{INK_2}" font-size="12">'
                   f'{escape(p.xlabel)}</text>')
    if p.ylabel:
        out.append(f'<text x="{x0 + 16}" y="{py + ph / 2:.0f}" '
                   f'text-anchor="middle" fill="{INK_2}" font-size="12" '
                   f'transform="rotate(-90 {x0 + 16} {py + ph / 2:.0f})">'
                   f'{escape(p.ylabel)}</text>')
    # series: 2px lines, 8px (r=4) markers, fixed-order colors
    for si, s in enumerate(p.series):
        color = SERIES_COLORS[si % len(SERIES_COLORS)]
        pts = sorted(zip(s.xs, s.ys))
        path = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in pts)
        out.append(f'<polyline points="{path}" fill="none" stroke="{color}" '
                   f'stroke-width="2"/>')
        for x, y in pts:
            out.append(f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="4" '
                       f'fill="{color}" stroke="{SURFACE}" stroke-width="2"/>')
        # direct end-of-line label (selective: only when it fits the
        # figure width — the legend still names every series)
        ex, ey = pts[-1]
        est_w = 6.2 * len(s.name)
        if sx(ex) + 10 + est_w <= x0 + w - 4:
            out.append(f'<text x="{sx(ex) + 10:.1f}" y="{sy(ey) + 4:.1f}" '
                       f'fill="{INK}" font-size="11">{escape(s.name)}</text>')
    # legend for >= 2 series (inside the plot, top-left, where long
    # benchmark names cannot overflow the figure)
    if len(p.series) >= 2:
        for si, s in enumerate(p.series):
            ly = py + 10 + si * 18
            color = SERIES_COLORS[si % len(SERIES_COLORS)]
            out.append(f'<line x1="{px + 10}" y1="{ly}" '
                       f'x2="{px + 30}" y2="{ly}" stroke="{color}" '
                       f'stroke-width="2"/>')
            out.append(f'<circle cx="{px + 20}" cy="{ly}" r="4" '
                       f'fill="{color}" stroke="{SURFACE}" stroke-width="2"/>')
            out.append(f'<text x="{px + 38}" y="{ly + 4}" fill="{INK}" '
                       f'font-size="11">{escape(s.name)}</text>')
    return out


def svg_figure(panels: list, width: int = 800, height: int = 600) -> str:
    """Render stacked panels (the reference's plt::subplot layout) to one
    standalone SVG string — deterministic, dependency-free."""
    if not panels:
        raise ValueError("svg_figure: at least one panel required")
    ph = height // len(panels)
    body = []
    for i, p in enumerate(panels):
        body.extend(_render_panel(p, 0, i * ph, width, ph))
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="system-ui, sans-serif">\n'
        f'<rect width="{width}" height="{height}" fill="{SURFACE}"/>\n'
        + "\n".join(body)
        + "\n</svg>\n"
    )


def save_figure(panels: list, path: str, width: int = 800, height: int = 600) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    svg = svg_figure(panels, width, height)
    with open(path, "w") as f:
        f.write(svg)
    return path


def lsh_benchmark_plots(rows: list, out_dir: str) -> dict:
    """The reference's two benchmark figures (lsh_benchmark.h:167-192):

      * lsh_performance.svg — subplot 1: pairwise-scan vs LSH time over
        the n_sample grid; subplot 2: the LSH curve alone (the reference
        repeats it so its scale is readable);
      * lsh_f_score.svg — mean F-score of both paths over the same grid.

    ``rows``: dicts with n_sample, linear_scan_ms, lsh_ms,
    linear_scan_f_score, lsh_f_score (the accumulated vectors of
    lsh_benchmark.h:131-166; tiny — one row per grid value).
    """
    rows = sorted(rows, key=lambda r: r["n_sample"])
    xs = [r["n_sample"] for r in rows]
    scan_t = Series("minhash pairwise comparison time", xs,
                    [r["linear_scan_ms"] for r in rows])
    lsh_t = Series("minhash lsh optimization time", xs,
                   [r["lsh_ms"] for r in rows])
    perf = save_figure(
        [
            Panel("performance comparison", [scan_t, lsh_t],
                  xlabel="n_sample", ylabel="time (ms)"),
            Panel("lsh optimization time", [lsh_t],
                  xlabel="n_sample", ylabel="time (ms)"),
        ],
        os.path.join(out_dir, "lsh_performance.svg"),
    )
    fsc = save_figure(
        [
            Panel(
                "f-score comparison",
                [
                    Series("minhash pairwise comparison", xs,
                           [r["linear_scan_f_score"] for r in rows]),
                    Series("minhash lsh optimization", xs,
                           [r["lsh_f_score"] for r in rows]),
                ],
                xlabel="n_sample", ylabel="f score",
            )
        ],
        os.path.join(out_dir, "lsh_f_score.svg"),
    )
    return {"performance": perf, "f_score": fsc}


def wminhash_benchmark_plot(rows: list, out_dir: str) -> str:
    """The reference's weight-minhash benchmark figure
    (weight_minhash_benchmark.h:89-113): subplot 1 = mean update time per
    n_sample, subplot 2 = mean |estimated − exact| generalized-Jaccard
    error per n_sample (the data tests/test_wminhash.py's error benchmark
    computes).  ``rows``: dicts with n_sample, update_ms, mean_abs_error.
    """
    rows = sorted(rows, key=lambda r: r["n_sample"])
    xs = [r["n_sample"] for r in rows]
    return save_figure(
        [
            Panel("weight minhash performance benchmark",
                  [Series("mean update time", xs,
                          [r["update_ms"] for r in rows])],
                  xlabel="n_sample", ylabel="time (ms)"),
            Panel("weight minhash accurate benchmark",
                  [Series("abs mean error", xs,
                          [r["mean_abs_error"] for r in rows])],
                  xlabel="n_sample", ylabel="abs mean error"),
        ],
        os.path.join(out_dir, "weight_minhash_benchmark.svg"),
    )
