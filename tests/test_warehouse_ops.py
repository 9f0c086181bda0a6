"""Tests for the warehouse-facing round-3 additions: the foreachBatch
streaming sink, lineage retention pruning, and CSV reject capture."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from simpleetlpipeline_spark.io import read_csv_with_rejects
from simpleetlpipeline_spark.pipeline import ETLConfig, prune_metadata
from simpleetlpipeline_spark.streaming.sinks import streaming_totals_to_table


def test_streaming_totals_sink_matches_batch(spark, sf_dir, tmp_path):
    out = streaming_totals_to_table(spark, sf_dir, str(tmp_path / "t"))
    batch = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in out.collect()}
    want = {r["user_id"]: (r["n_events"], r["total_value"])
            for r in batch.collect()}
    assert got == want
    # the sink committed through the versioned-table protocol
    assert os.path.exists(str(tmp_path / "t" / "_CURRENT"))


def test_prune_metadata_drops_only_expired(spark, tmp_path):
    from simpleetlpipeline_spark.pipeline import _append_metadata_row

    cfg = ETLConfig(warehouse_dir=str(tmp_path), retention_days=30)
    meta_dir = os.path.join(cfg.warehouse_dir, "etl_metadata")
    for i in range(3):
        _append_metadata_row(
            meta_dir, (f"t{i}", "src", 1, 1, 0, 0, 0.1, 100.0, "x"))
    # age two of the rows past the horizon by rewriting their ts
    meta = spark.read.parquet(meta_dir)
    old = datetime.now(timezone.utc) - timedelta(days=40)
    aged = meta.withColumn(
        "etl_timestamp",
        F.when(F.col("table_name") != "t0", F.lit(old))
        .otherwise(F.col("etl_timestamp")))
    aged.write.mode("overwrite").parquet(meta_dir + ".tmp")
    import shutil
    shutil.rmtree(meta_dir)
    os.rename(meta_dir + ".tmp", meta_dir)

    assert prune_metadata(spark, cfg) == 2
    left = spark.read.parquet(meta_dir)
    assert [r["table_name"] for r in left.collect()] == ["t0"]
    # idempotent: nothing left to prune
    assert prune_metadata(spark, cfg) == 0


def test_read_csv_with_rejects_quarantines_bad_rows(spark, tmp_path):
    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
    ])
    p = str(tmp_path / "in.csv")
    with open(p, "w") as fh:
        fh.write("id,name,amount\n")
        fh.write("1,alpha,10.5\n")
        fh.write("2,beta,not-a-number\n")   # malformed double
        fh.write("3,gamma,7.25\n")
    good, rejects = read_csv_with_rejects(spark, p, schema)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    bad = rejects.collect()
    assert len(bad) == 1
    assert "not-a-number" in bad[0]["raw_line"]
    assert bad[0]["source_file"] == p


def test_compact_table_consolidates_small_files(spark, tmp_path):
    import glob

    from simpleetlpipeline_spark.io import compact_table, read_table_version

    src = str(tmp_path / "many")
    # 12 tiny appends -> 12+ part files
    for i in range(12):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(src)
    before = len(glob.glob(src + "/*.parquet"))
    assert before >= 12
    n_before, n_out = compact_table(spark, src, target_mb=128)
    assert n_before == before and n_out == 1
    out = read_table_version(spark, src + "_compacted")
    assert out.count() == 120
    files_after = glob.glob(src + "_compacted/v=1/*.parquet")
    assert len(files_after) == 1


def test_streaming_sink_batch_retry_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running an already-committed batch (foreachBatch's
    at-least-once retry after a crash between snapshot commit and
    checkpoint write) must not double-apply the increments."""
    from simpleetlpipeline_spark.io import read_version_meta

    root = str(tmp_path / "t")
    out1 = streaming_totals_to_table(spark, sf_dir, root).collect()
    assert read_version_meta(root) is not None
    # simulate the retry: replay the same stream with a FRESH
    # checkpoint (so the batch re-fires with the same batch_id 0)
    # against the already-committed table
    import shutil
    shutil.rmtree(root + "/_chk")
    out2 = streaming_totals_to_table(spark, sf_dir, root).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


# --- SCD2 merge (operators/scd.py) ---------------------------------

def _scd_base(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, bal double, valid_from int, valid_to int")


def _scd_upd(spark, rows):
    return spark.createDataFrame(rows, "k int, attr string, bal double")


def test_scd2_change_new_nochange_and_passthrough(spark):
    from simpleetlpipeline_spark.operators.scd import scd2_apply

    base = _scd_base(spark, [
        (1, "a", 10.0, 1, None),    # will change
        (2, "b", 20.0, 1, None),    # update identical -> no churn
        (3, "c", 30.0, 1, None),    # no update -> untouched
        (1, "old", 5.0, 0, 1),      # closed history -> passthrough
    ])
    upd = _scd_upd(spark, [
        (1, "a2", 11.0),
        (2, "b", 20.0),
        (9, "new", 90.0),
    ])
    out = scd2_apply(base, upd, ["k"], ["attr", "bal"], version=2)
    rows = {(r.k, r.valid_from): r for r in out.collect()}
    assert len(rows) == 6
    assert rows[(1, 1)].valid_to == 2 and rows[(1, 1)].attr == "a"
    assert rows[(1, 2)].valid_to is None and rows[(1, 2)].attr == "a2"
    assert rows[(2, 1)].valid_to is None          # idempotent re-send
    assert rows[(3, 1)].valid_to is None
    assert rows[(9, 2)].attr == "new" and rows[(9, 2)].valid_to is None
    assert rows[(1, 0)].valid_to == 1             # history untouched


def test_scd2_chained_versions(spark):
    """Applying two batches in sequence builds a 3-version chain with
    exactly one current row per key."""
    from simpleetlpipeline_spark.operators.scd import scd2_apply

    base = _scd_base(spark, [(1, "v1", 1.0, 1, None)])
    v2 = scd2_apply(base, _scd_upd(spark, [(1, "v2", 2.0)]),
                    ["k"], ["attr", "bal"], version=2)
    v3 = scd2_apply(v2, _scd_upd(spark, [(1, "v3", 3.0)]),
                    ["k"], ["attr", "bal"], version=3)
    rows = sorted(v3.collect(), key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_from, r.valid_to) for r in rows] == [
        ("v1", 1, 2), ("v2", 2, 3), ("v3", 3, None)]


def test_scd2_null_attr_transitions(spark):
    """eqNullSafe comparison: null->value and value->null are real
    changes; null->null is not."""
    from simpleetlpipeline_spark.operators.scd import scd2_apply

    base = _scd_base(spark, [
        (1, None, 1.0, 1, None), (2, None, 2.0, 1, None)])
    upd = _scd_upd(spark, [(1, "x", 1.0), (2, None, 2.0)])
    out = scd2_apply(base, upd, ["k"], ["attr", "bal"], version=2)
    rows = {(r.k, r.valid_from): r for r in out.collect()}
    assert len(rows) == 3
    assert rows[(1, 1)].valid_to == 2 and rows[(1, 2)].attr == "x"
    assert rows[(2, 1)].valid_to is None   # null == null: no churn


def test_scd2_single_join_plan(spark):
    """The merge must be ONE join (full outer on the key) — no
    second join sneaking in via the two output branches."""
    from simpleetlpipeline_spark.operators.scd import scd2_apply

    base = _scd_base(spark, [(1, "a", 1.0, 1, None)])
    out = scd2_apply(base, _scd_upd(spark, [(1, "b", 2.0)]),
                     ["k"], ["attr", "bal"], version=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1


def test_scd2_duplicate_update_batch_raises(spark):
    """The one-row-per-business-key contract on the update batch is
    enforced in-plan: a duplicate-key batch must raise at execution
    instead of fanning out the full-outer join into multiple current
    rows per key."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from simpleetlpipeline_spark.operators.scd import scd2_apply

    base = _scd_base(spark, [(1, "a", 10.0, 1, None)])
    upd = _scd_upd(spark, [(1, "x", 1.0), (1, "y", 2.0)])
    out = scd2_apply(base, upd, ["k"], ["attr", "bal"], version=2)
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as e:
        out.collect()
    assert "duplicate update rows" in str(e.value)


def test_compaction_invariant_lifecycle(spark, sf_dir):
    """The gate entry's full merge→compact→time-travel cycle: three
    snapshot rows, compaction never grows the file count, and the
    compacted snapshot carries byte-identical content aggregates to
    the merged one (compaction moves bytes, never rows)."""
    from simpleetlpipeline_spark.plans.relational import (
        compaction_invariant,
    )

    rows = {r["snapshot"]: r
            for r in compaction_invariant(spark, sf_dir).collect()}
    assert set(rows) == {"v1_seed", "v2_merged", "v2_compacted"}
    assert all(r["files_ok"] for r in rows.values())
    v2, v2c = rows["v2_merged"], rows["v2_compacted"]
    for col in ("n_rows", "n_keys", "sum_bal_cents",
                "min_key", "max_key"):
        assert v2[col] == v2c[col], col
    # the merge really did both paths: inserts grew the table and the
    # negated insert keys moved min_key below zero
    assert v2["n_rows"] > rows["v1_seed"]["n_rows"]
    assert v2["min_key"] < 0 <= rows["v1_seed"]["min_key"]
