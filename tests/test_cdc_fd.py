"""Semantic tests for the CDC latest-state compaction and the
functional-dependency audit (beyond the DuckDB oracle, which checks
engine agreement but not the intended tombstone/FD semantics)."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from simpleetlpipeline_spark.plans.relational import cdc_latest_state, fd_audit

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def _t(minute: int) -> datetime:
    return datetime(2024, 1, 1, 12, minute, 0)


def test_cdc_tombstone_and_resurrection(spark, tmp_path):
    # user 1: purchase then a LATER error -> tombstoned out entirely.
    # user 2: error then a LATER purchase -> resurrected, latest row wins.
    # user 3: two clicks -> survives with the LATEST click's cents.
    # user 4: same-ts tie -> event_id breaks it (higher id wins).
    rows = [
        (1, _t(1), 1, "purchase", 10.00, "{}"),
        (2, _t(2), 1, "error", 0.0, "{}"),
        (3, _t(1), 2, "error", 0.0, "{}"),
        (4, _t(2), 2, "purchase", 20.50, "{}"),
        (5, _t(1), 3, "click", 1.25, "{}"),
        (6, _t(2), 3, "click", 2.75, "{}"),
        (7, _t(1), 4, "view", 3.00, "{}"),
        (8, _t(1), 4, "view", 4.00, "{}"),
    ]
    sf_dir = str(tmp_path)
    (spark.createDataFrame(rows, EVENTS_SCHEMA)
     .coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet")))
    got = {r["event_type"]: (r["n_live_keys"], r["value_cents"])
           for r in cdc_latest_state(spark, sf_dir).collect()}
    assert got == {
        "purchase": (1, 2050),   # user 2 resurrected at 20.50
        "click": (1, 275),       # user 3's LATEST click, not the sum
        "view": (1, 400),        # user 4: event_id 8 wins the ts tie
    }                            # user 1 tombstoned; no 'error' rows


def test_fd_audit_held_and_violated(spark, sf_dir):
    got = {r["fd"]: (r["n_keys"], r["n_violating_keys"])
           for r in fd_audit(spark, sf_dir).collect()}
    assert set(got) == {"nation->region", "orderkey->custkey",
                        "partkey->suppkey", "user->event_type"}
    # dimension hierarchy and primary key hold exactly
    assert got["nation->region"] == (25, 0)
    assert got["orderkey->custkey"][1] == 0
    assert got["orderkey->custkey"][0] > 0
    # multi-supplier parts and multi-type users violate on purpose
    assert got["partkey->suppkey"][1] == got["partkey->suppkey"][0] > 0
    assert got["user->event_type"][1] > 0
