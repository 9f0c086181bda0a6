"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (top_products: 3-table star join +
                 grouped top-k, SURVEY.md §7 step 1) on sf0.001.
queries()      — every implemented operator from SURVEY.md §2 as
                 (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB ANSI-SQL twins for the correctness gate.

Implementation lives in simpleetlpipeline_spark/; this module only
re-exports the catalog.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simpleetlpipeline_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["top_products"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE_SQL)
