"""Custom stateful streaming operators.

Two state-store-backed operators beyond windowed aggregation:

- streaming_event_dedup: built-in watermarked stream dedup
  (dropDuplicatesWithinWatermark) — the streaming form of exact
  dedup: state holds one fingerprint per key inside the watermark
  horizon, so memory is bounded on an infinite stream.
- streaming_user_totals_stateful: applyInPandasWithState — the
  arbitrary-stateful-processing API (the escape hatch for operators
  Spark lacks): per-user running (count, sum) state updated from
  Arrow batches of that user's events.

Both replay the finite events table through the real streaming
engine (single parquet file → one micro-batch under availableNow),
which makes their end-of-stream output equal to the batch
aggregate/distinct — hence oracle-checkable. On a live multi-batch
stream the totals operator emits one updated row per key per batch,
as an update stream should.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from simpleetlpipeline_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_df,
)


def streaming_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on (user_id, event_type): the
    state store keeps first-seen keys for the watermark horizon and
    drops repeats. Emitting only the key columns keeps the result
    order-insensitive (which repeat survives depends on partition
    arrival order)."""
    deduped = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_stream_to_df(deduped, output_mode="append")


def streaming_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via applyInPandasWithState.

    State = (n_events, total_value) per user_id; each micro-batch
    folds its Arrow batches into the state and emits the updated
    row. Demonstrates the custom-stateful API surface: grouped
    Arrow iteration, GroupState get/update, timeout plumbing.
    """
    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            # round (not floor): sums of 2-decimal money land ~1e-12
            # AROUND exact hundredths, where floor flips per float-sum
            # order but nearest-rounding is stable on both engines
            "total_value": [round(total, 2)],
        })

    totals = (
        read_events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = run_stream_to_df(totals, output_mode="update")
    # On a multi-batch replay each key emits once per batch; the final
    # state is the row with the largest n_events (monotone).
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )


QUERIES = {
    "streaming_event_dedup": streaming_event_dedup,
    "streaming_user_totals_stateful": streaming_user_totals_stateful,
}

ORACLE_SQL = {
    "streaming_event_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "streaming_user_totals_stateful": """
        SELECT user_id,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1
    """,
}
