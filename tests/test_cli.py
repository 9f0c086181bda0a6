"""In-process tests for the CLI entry point (__main__.py). The CLI's
get_spark() resolves to the session fixture via getOrCreate, so the
commands run without a second JVM."""

from __future__ import annotations

import json
import os

from simpleetlpipeline_spark.__main__ import main

REF_YAML = "/root/reference/etl_config.yaml"


def test_cli_run_then_monitor(tmp_path, spark, capsys):
    wd = str(tmp_path / "etl")
    rc = main(["run", "--workdir", wd, "--scale", "0.2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "failed tables:     0" in out
    assert "records processed:" in out
    assert os.path.isdir(os.path.join(wd, "warehouse", "etl_metadata"))

    rc = main(["monitor", "--workdir", wd])
    status = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert status["health"] in ("healthy", "degraded")
    assert status["loads_24h"] >= 4


def test_cli_run_with_reference_yaml(tmp_path, spark, capsys):
    if not os.path.exists(REF_YAML):
        import pytest

        pytest.skip("reference yaml not present")
    rc = main(["run", "--workdir", str(tmp_path / "y"),
               "--config", REF_YAML, "--scale", "0.2"])
    assert rc == 0
    assert "failed tables:     0" in capsys.readouterr().out


def test_cli_report(tmp_path, spark, capsys):
    html = str(tmp_path / "dash")
    rc = main(["report", "--sf-dir", "/root/testdata/sf0.001",
               "--html", html])
    out = capsys.readouterr().out
    assert rc == 0
    assert "== monthly_sales" in out and "== top_products" in out
    assert any(f.endswith(".html") for f in os.listdir(html))


def test_cli_curate_report_and_manifest(tmp_path, spark, capsys):
    out_dir = str(tmp_path / "curated")
    rc = main(["curate", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out_dir])
    printed = capsys.readouterr().out
    assert rc == 0
    report = json.loads(printed.split("curated manifest:")[0])
    assert report["n_input"] > 0
    assert 0 < report["n_dedup"] <= report["n_input"]
    manifest = spark.read.parquet(out_dir)
    assert manifest.count() == report["n_dedup"]
    assert set(manifest.columns) == {
        "doc_id", "detected_lang", "n_tokens", "quality_score"}
