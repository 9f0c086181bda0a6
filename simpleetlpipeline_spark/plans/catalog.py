"""Master query registry assembled from all catalogs.

__spark_entry__.py re-exports this. Every oracle-checked operator
appears in QUERIES with a matching ORACLE_SQL entry; genuinely
non-SQL-expressible operators (LSH-approximate dedup, stateful
streaming) appear in QUERIES only (driver records a rows-only
check).
"""

from __future__ import annotations

from simpleetlpipeline_spark.functions import (
    curation,
    dedup,
    multimodal,
    similarity,
    text,
)
from simpleetlpipeline_spark.plans import advanced, analytics
from simpleetlpipeline_spark.streaming import stateful as streaming_stateful
from simpleetlpipeline_spark.streaming import windows as streaming_windows

QUERIES = dict(analytics.QUERIES)
ORACLE_SQL = dict(analytics.ORACLE_SQL)

for _mod in (advanced, text, dedup, similarity, multimodal, curation,
             streaming_windows, streaming_stateful):
    QUERIES.update(_mod.QUERIES)
    ORACLE_SQL.update(_mod.ORACLE_SQL)


def _etl_pipeline_run(spark, sf_dir):
    from simpleetlpipeline_spark.pipeline import etl_pipeline_run
    return etl_pipeline_run(spark, sf_dir)


QUERIES["etl_pipeline_run"] = _etl_pipeline_run  # rows-only (driver loop)


def register(queries: dict, oracle: dict | None = None) -> None:
    """Extension catalogs call this at import time."""
    QUERIES.update(queries)
    if oracle:
        ORACLE_SQL.update(oracle)
