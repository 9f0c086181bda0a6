"""SparkSession construction and session-level tuning.

The reference tunes its engine with SQLite pragmas (WAL,
cache_size, temp_store — reference main.py:87-97); the Spark analog
is SparkConf. Settings here are chosen for correctness-critical
determinism (UTC session timezone so timestamp semantics match a
UTC-naive oracle) and for scale (AQE on, skew-join handling on,
shuffle partitions sized to the actual parallelism instead of the
200 default, which is wrong in both directions — too many for local
runs, too few at 100 TB where AQE coalescing takes over).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to every session we build, and re-asserted (for the
#: runtime-settable subset) on sessions handed to us by a driver.
_RUNTIME_CONF = {
    # Deterministic timestamp semantics: parquet stores UTC instants;
    # render/bucket them in UTC so results match a UTC-naive oracle.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime re-plan (coalesce post-shuffle
    # partitions, convert to broadcast join when a side turns out
    # small, split skewed partitions). Essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The testdata events table stores TIMESTAMP(NANOS), which the
    # vanilla parquet reader rejects; read as epoch-nanos LONG and
    # convert (io.read_table truncates to micros, matching DuckDB).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _runtime_conf() -> dict[str, str]:
    conf = dict(_RUNTIME_CONF)
    # Shuffle (and streaming state-store) partition count sized to the
    # actual parallelism instead of the 200 default — also applied to
    # externally-built sessions, where stateful streaming would
    # otherwise run 200 state tasks per micro-batch.
    conf["spark.sql.shuffle.partitions"] = str(default_parallelism())
    return conf


def default_parallelism() -> int:
    """Worker-thread count for local mode (driver contract: 32)."""
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(app_name: str = "simpleetlpipeline-spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    shuffle_partitions defaults to the core count: at local test
    scale the 200 default only adds scheduling overhead; on a real
    cluster this knob would be set to ~2-3x total cores and AQE
    coalesces it down per-stage.
    """
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or cpus))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _runtime_conf().items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions",
                             str(shuffle_partitions or cpus))
    return builder.getOrCreate()


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Assert runtime-settable conf on an externally-built session.

    The correctness driver hands us its own SparkSession; timezone
    and AQE flags are runtime-mutable, so pin them for deterministic
    query semantics.
    """
    for k, v in _runtime_conf().items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable on this build; best effort
    return spark
