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
