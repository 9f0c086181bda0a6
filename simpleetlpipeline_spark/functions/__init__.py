"""Scalar/column function library: text analysis, dedup, similarity,
multimodal — the training-data-pipeline extensions (BASELINE.json
north star) built on pyspark.sql.functions only where possible."""
