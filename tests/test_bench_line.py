"""The driver parses bench.py's final stdout line from a ~2000-byte
tail window; these tests pin the line-budget contract so catalog
growth can never silently push the JSON back out of the window."""

from __future__ import annotations

import json

from bench import LINE_BUDGET, bounded_line


def _result(queries: dict) -> dict:
    return {
        "metric": "catalog_total_runtime",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "etl_records_per_sec": 123456.7,
    }


def test_current_catalog_fits_budget():
    """Worst-case line for the REAL registered query names (every
    timing a 6-char float) must fit the driver's tail window."""
    from simpleetlpipeline_spark.plans import catalog

    timings = {name: 123.45 for name in catalog.QUERIES}
    line = bounded_line(_result(timings))
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "catalog_total_runtime"
    # everything dropped from the line is accounted for
    assert (len(parsed["queries"]) + parsed.get("queries_omitted", 0)
            == len(timings))


def test_oversized_catalog_drops_cheapest_first():
    timings = {f"query_with_a_rather_long_name_{i:03d}": float(i)
               for i in range(200)}
    line = bounded_line(_result(timings))
    assert len(line) <= LINE_BUDGET
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert parsed["queries_omitted"] == 200 - len(kept)
    # the most expensive queries survive; the dropped ones are cheapest
    assert min(kept.values()) >= parsed["queries_omitted"] - 1


def test_small_catalog_unchanged():
    timings = {"a": 1.234, "b": 2.345}
    parsed = json.loads(bounded_line(_result(timings)))
    assert parsed["queries"] == {"a": 1.23, "b": 2.35}
    assert "queries_omitted" not in parsed
