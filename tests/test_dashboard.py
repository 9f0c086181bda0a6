"""S9 dashboard sink: reference-named HTML files from pre-aggregated
catalog queries (reference main.py:693-725, 777-787)."""

import os


def test_dashboard_writes_reference_named_files(spark, sf_dir, tmp_path):
    from simpleetlpipeline_spark.dashboard import write_dashboard

    paths = write_dashboard(spark, sf_dir, str(tmp_path))
    assert sorted(os.path.basename(p) for p in paths) == [
        "customer_segments_dashboard.html",
        "sales_trend_dashboard.html",
        "top_products_dashboard.html",
    ]
    for p in paths:
        content = open(p).read()
        # rendered chart (svg fallback or plotly) AND a data table view
        assert "<svg" in content or "plotly" in content
        assert "<table>" in content
        assert "Data table" in content
    trend = open(os.path.join(
        tmp_path, "sales_trend_dashboard.html")).read()
    assert "Monthly Sales Trend" in trend
    assert "polyline" in trend, "trend renders as a line form"
    prods = open(os.path.join(
        tmp_path, "top_products_dashboard.html")).read()
    assert prods.count("<rect") == 10, "top-k bar per product"


def test_dashboard_frames_are_tiny_aggregates(spark, sf_dir):
    """The collect boundary: every dashboard input is pre-aggregated,
    bounded rows — never a raw-table pull to the driver."""
    from simpleetlpipeline_spark.dashboard import dashboard_frames

    frames = dashboard_frames(spark, sf_dir)
    assert set(frames) == {"sales_trend", "customer_segments",
                           "top_products"}
    for name, df in frames.items():
        assert df.count() <= 200, f"{name} must be a small aggregate"
