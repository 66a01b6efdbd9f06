"""SVG benchmark plot sinks (lsh_benchmark.h:167-192 replacement)."""

import xml.etree.ElementTree as ET

from lshdedup.plots import Panel, Series, lsh_benchmark_plots, svg_figure

ROWS = [
    {"n_sample": 64, "linear_scan_ms": 120.0, "lsh_ms": 30.0,
     "linear_scan_f_score": 0.96, "lsh_f_score": 0.93},
    {"n_sample": 128, "linear_scan_ms": 240.0, "lsh_ms": 41.0,
     "linear_scan_f_score": 0.98, "lsh_f_score": 0.97},
    {"n_sample": 256, "linear_scan_ms": 470.0, "lsh_ms": 60.0,
     "linear_scan_f_score": 0.99, "lsh_f_score": 0.98},
]

SVGNS = "{http://www.w3.org/2000/svg}"


def test_svg_figure_structure():
    svg = svg_figure(
        [Panel("t", [Series("a", [1, 2, 3], [1.0, 2.0, 1.5]),
                     Series("b", [1, 2, 3], [2.0, 1.0, 2.5])],
               xlabel="x", ylabel="y")]
    )
    root = ET.fromstring(svg)  # well-formed XML
    polys = root.findall(f"{SVGNS}polyline")
    assert len(polys) == 2
    assert all(p.get("stroke-width") == "2" for p in polys)
    # markers: 3 points x 2 series + 2 legend swatches
    assert len(root.findall(f"{SVGNS}circle")) == 8
    texts = [t.text for t in root.findall(f"{SVGNS}text")]
    # legend + direct labels name both series; axis labels present
    assert texts.count("a") == 2 and texts.count("b") == 2
    assert "x" in texts and "y" in texts
    # series colors never paint text
    for t in root.findall(f"{SVGNS}text"):
        assert t.get("fill") in ("#0b0b0b", "#52514e")


def test_single_series_panel_has_no_legend():
    svg = svg_figure([Panel("t", [Series("only", [1, 2], [1.0, 2.0])])])
    root = ET.fromstring(svg)
    # 2 markers, no legend swatch; one direct label names the series
    assert len(root.findall(f"{SVGNS}circle")) == 2
    assert [t.text for t in root.findall(f"{SVGNS}text")].count("only") == 1


def test_lsh_benchmark_plots_writes_both_figures(tmp_path):
    out = lsh_benchmark_plots(ROWS, str(tmp_path))
    for key, path in out.items():
        root = ET.fromstring(open(path).read())
        assert root.tag == f"{SVGNS}svg", key
    perf = open(out["performance"]).read()
    assert perf.count("<polyline") == 3  # comparison panel (2) + lsh-only (1)
    assert "time (ms)" in perf and "n_sample" in perf
    fsc = open(out["f_score"]).read()
    assert fsc.count("<polyline") == 2
    assert "f score" in fsc


def test_deterministic_output(tmp_path):
    a = lsh_benchmark_plots(ROWS, str(tmp_path / "a"))
    b = lsh_benchmark_plots(ROWS, str(tmp_path / "b"))
    assert open(a["performance"]).read() == open(b["performance"]).read()
    assert open(a["f_score"]).read() == open(b["f_score"]).read()


def test_wminhash_benchmark_plot(tmp_path):
    from lshdedup.plots import wminhash_benchmark_plot

    rows = [
        {"n_sample": 64, "update_ms": 0.9, "mean_abs_error": 0.051},
        {"n_sample": 128, "update_ms": 1.7, "mean_abs_error": 0.036},
        {"n_sample": 256, "update_ms": 3.2, "mean_abs_error": 0.027},
    ]
    path = wminhash_benchmark_plot(rows, str(tmp_path))
    svg = open(path).read()
    ET.fromstring(svg)
    assert svg.count("<polyline") == 2  # one per subplot
    assert "abs mean error" in svg and "n_sample" in svg
