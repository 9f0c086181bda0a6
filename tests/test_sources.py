"""End-to-end tests for the pluggable JSONL event-log source
(sources.py): schema contract, per-file partition planning, row-level
event_type pushdown, and file-level day pruning."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from simpleetlpipeline_spark.sources import register_jsonl_events

ROWS = [
    # (file_day, event_id, user_id, event_type, value)
    ("2026-01-01", 1, 10, "view", 1.0),
    ("2026-01-01", 2, 10, "click", 2.0),
    ("2026-01-01", 3, 11, "purchase", 30.0),
    ("2026-01-02", 4, 11, "view", 1.5),
    ("2026-01-02", 5, 12, "view", 2.5),
    ("2026-01-02", 6, 12, "error", 0.0),
]


def _write_logs(root) -> str:
    d = str(root / "logs")
    os.makedirs(d, exist_ok=True)
    by_day: dict[str, list] = {}
    for day, eid, uid, etype, val in ROWS:
        by_day.setdefault(day, []).append(
            {"event_id": eid, "ts": f"{day}T00:00:0{eid}",
             "user_id": uid, "event_type": etype, "value": val})
    for day, recs in by_day.items():
        with open(os.path.join(d, f"app-{day}.jsonl"), "w") as fh:
            for r in recs:
                fh.write(json.dumps(r) + "\n")
    return d


def test_jsonl_source_reads_all(spark, tmp_path):
    d = _write_logs(tmp_path)
    register_jsonl_events(spark)
    df = spark.read.format("jsonl_events").option("path", d).load()
    rows = sorted(df.collect(), key=lambda r: r.event_id)
    assert len(rows) == len(ROWS)
    assert rows[0].event_type == "view" and rows[0].day == "2026-01-01"
    assert rows[5].value == 0.0 and rows[5].day == "2026-01-02"
    # one planned partition per file
    assert df.rdd.getNumPartitions() == 2


def test_jsonl_source_type_pushdown(spark, tmp_path):
    d = _write_logs(tmp_path)
    register_jsonl_events(spark)
    df = (spark.read.format("jsonl_events").option("path", d).load()
          .filter(F.col("event_type") == "view"))
    assert sorted(r.event_id for r in df.collect()) == [1, 4, 5]
    # the equality predicate was absorbed by the source: the only
    # Filter left above the scan is the residual isnotnull guard
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "= view" not in plan and "EqualTo" not in plan, plan
    assert "isnotnull" in plan, "residual non-pushed guard stays with Spark"


def test_jsonl_source_day_prunes_files(spark, tmp_path):
    d = _write_logs(tmp_path)
    register_jsonl_events(spark)
    df = (spark.read.format("jsonl_events").option("path", d).load()
          .filter(F.col("day") == "2026-01-02"))
    assert sorted(r.event_id for r in df.collect()) == [4, 5, 6]
    # file-level pruning: only the matching file is planned
    assert df.rdd.getNumPartitions() == 1


def test_jsonl_source_matches_native_json_reader(spark, tmp_path):
    d = _write_logs(tmp_path)
    register_jsonl_events(spark)
    custom = (spark.read.format("jsonl_events").option("path", d).load()
              .select("event_id", "user_id", "event_type", "value"))
    native = (spark.read.json(os.path.join(d, "*.jsonl"))
              .select("event_id", "user_id", "event_type", "value"))
    assert sorted(map(tuple, custom.collect())) \
        == sorted(map(tuple, native.collect()))


def test_jsonl_source_empty_dir(spark, tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    register_jsonl_events(spark)
    df = spark.read.format("jsonl_events").option("path", d).load()
    assert df.count() == 0


def test_jsonl_source_streaming_incremental(spark, tmp_path):
    """Streaming form: each run consumes exactly the files not
    covered by the checkpointed offset — new log files become the
    next micro-batch, already-consumed ones never replay."""
    d = _write_logs(tmp_path)
    register_jsonl_events(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_stream():
        # parquet sink (the memory sink cannot recover from a
        # checkpoint) and the default trigger (Python streaming
        # sources reject Trigger.AvailableNow RESTART with "does not
        # support recovering from checkpoint"); drain with
        # processAllAvailable then stop — the same consume-all-then-
        # quiesce semantics.
        q = (spark.readStream.format("jsonl_events").option("path", d)
             .load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_stream()
    first = spark.read.parquet(out).collect()
    assert sorted(r.event_id for r in first) == [1, 2, 3, 4, 5, 6]

    with open(os.path.join(d, "app-2026-01-03.jsonl"), "w") as fh:
        fh.write(json.dumps({"event_id": 7, "ts": "2026-01-03T00:00:07",
                             "user_id": 13, "event_type": "view",
                             "value": 9.0}) + "\n")
    run_stream()
    both = spark.read.parquet(out).collect()
    assert sorted(r.event_id for r in both) == [1, 2, 3, 4, 5, 6, 7], \
        "resume must consume ONLY the new file (no replay, no loss)"
    assert {r.day for r in both if r.event_id == 7} == {"2026-01-03"}


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """Write side: staged files + driver commit + manifest. After a
    successful save there are no staging orphans, the manifest counts
    match, and the source reads back exactly what was written."""
    d = str(tmp_path / "sink")
    register_jsonl_events(spark)
    df = spark.createDataFrame(
        [(1, "2026-01-01T00:00:01", 10, "view", 1.0),
         (2, "2026-01-01T00:00:02", 11, "click", 2.0),
         (3, "2026-01-01T00:00:03", 12, "purchase", 3.0)],
        "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double").repartition(2)
    df.write.format("jsonl_events").option("path", d).mode("append").save()

    names = os.listdir(d)
    assert not any(n.startswith(".staging") for n in names), \
        "staged files must be renamed away by commit()"
    manifest = json.load(open(os.path.join(d, "_MANIFEST.json")))
    assert manifest["rows"] == 3
    assert all(f in names for f in manifest["files"])

    back = (spark.read.format("jsonl_events").option("path", d).load()
            .select("event_id", "ts", "user_id", "event_type", "value"))
    assert sorted(map(tuple, back.collect())) \
        == sorted(map(tuple, df.collect()))


def test_jsonl_sink_overwrite(spark, tmp_path):
    d = str(tmp_path / "sink2")
    register_jsonl_events(spark)
    schema = ("event_id bigint, ts string, user_id bigint, "
              "event_type string, value double")
    spark.createDataFrame(
        [(1, "t", 1, "view", 1.0)], schema).write \
        .format("jsonl_events").option("path", d).mode("append").save()
    spark.createDataFrame(
        [(9, "t", 9, "error", 9.0)], schema).write \
        .format("jsonl_events").option("path", d).mode("overwrite").save()
    back = spark.read.format("jsonl_events").option("path", d).load()
    assert [r.event_id for r in back.collect()] == [9], \
        "overwrite must replace previously committed files"


def test_readers_skip_orphan_staging_files(spark, tmp_path):
    """A task killed mid-write leaves a '.staging-*' file that neither
    commit() nor abort() ever sees (no commit message was produced).
    Batch and stream readers must treat it as hidden, or a retried
    job's success would surface the dead attempt's partial rows."""
    d = _write_logs(tmp_path)
    # simulate the orphan: a dot-prefixed partial file with rows that
    # would be duplicates/garbage if read
    with open(os.path.join(d, ".staging-99-part-0.jsonl"), "w") as fh:
        fh.write(json.dumps({"event_id": 999, "ts": "x",
                             "user_id": 1, "event_type": "view",
                             "value": 1.0}) + "\n")
    # and writer metadata, which is '_'-prefixed but .json (guard the
    # filter against a hypothetical '_foo.jsonl' too)
    with open(os.path.join(d, "_sidecar.jsonl"), "w") as fh:
        fh.write(json.dumps({"event_id": 998, "ts": "x",
                             "user_id": 1, "event_type": "view",
                             "value": 1.0}) + "\n")
    register_jsonl_events(spark)
    df = spark.read.format("jsonl_events").option("path", d).load()
    ids = {r.event_id for r in df.collect()}
    assert 999 not in ids and 998 not in ids
    assert len(ids) == len(ROWS)


def test_commit_sweeps_orphan_staging(spark, tmp_path):
    """commit() removes staging leftovers from dead attempts so the
    directory converges to committed-files-plus-manifest only."""
    d = str(tmp_path / "sink3")
    os.makedirs(d)
    with open(os.path.join(d, ".staging-dead-part-7.jsonl"), "w") as fh:
        fh.write("{\"event_id\": 1}\n")
    register_jsonl_events(spark)
    schema = ("event_id bigint, ts string, user_id bigint, "
              "event_type string, value double")
    spark.createDataFrame(
        [(1, "t", 1, "view", 1.0)], schema).write \
        .format("jsonl_events").option("path", d).mode("append").save()
    assert not any(n.startswith(".staging") for n in os.listdir(d))
