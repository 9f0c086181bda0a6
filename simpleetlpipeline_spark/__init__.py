"""simpleetlpipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
reference repo (nimish-nimishmittal/SimpleETLPipeline — a pandas +
SQLite batch ETL pipeline over an e-commerce star schema, see
SURVEY.md) as an idiomatic, Catalyst-optimized PySpark library, and
extends it with the operators a large-scale training-data pipeline
needs (dedup, similarity search, text analysis, multimodal columns,
streaming event analytics).

Design stance (SURVEY.md §7): a thin declarative library — schema
registry + readers/writers + transform catalog + validation/quality
module + analytics query catalog + pipeline driver with metadata
lineage. No custom parser and no custom Catalyst rules; every
operator is expressed through the DataFrame/SQL API so predicate
pushdown, column pruning, join selection (broadcast vs sort-merge),
AQE and whole-stage codegen come for free and the same code scales
from local[32] to a 1000-executor cluster.
"""

from simpleetlpipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
