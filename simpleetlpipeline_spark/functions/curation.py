"""End-to-end training-corpus curation.

The flagship composition for the 100 TB framing: the quality filter,
language filter, exact dedup, and near-dup removal that a large-scale
training-data pipeline chains in front of tokenization — built
entirely from this engine's oracled operators (text.doc_stats,
text.lang_id, text.doc_fingerprint, dedup.dedup_clusters).

corpus_curate        — deterministic, fully SQL-expressible stages
                       (quality >= threshold, detected 'en', keep the
                       min doc_id per md5 fingerprint) — DuckDB-
                       oracled end to end.
corpus_curate_neardup — adds MinHash-LSH near-dup cluster removal
                       (keep each cluster's canonical doc). The LSH
                       family is engine-specific, so this variant is
                       rows-only in the gate; its structure is
                       unit-tested via dedup_clusters.

Scale: stats/lang/fingerprint are narrow projections joined on
doc_id (Catalyst collapses the shared scan where possible; each stage
alone is shuffle-free), exact dedup is one window shuffle keyed by
the 128-bit fingerprint (uniform — no skew), and near-dup removal is
the LSH pair graph + connected components from dedup.py: everything
linear in corpus size, nothing all-pairs, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simpleetlpipeline_spark.functions.dedup import dedup_cluster_frame
from simpleetlpipeline_spark.functions.text import (
    _STOPWORDS_SQL,
    _lang_case,
    _lang_hits_sql,
    LANG_MARKERS,
    doc_fingerprint,
    doc_stats,
    lang_id,
)
from simpleetlpipeline_spark.session import ensure_session_conf

QUALITY_THRESHOLD = 0.3
KEEP_LANG = "en"


def corpus_curate(spark: SparkSession, sf_dir: str,
                  quality_threshold: float = QUALITY_THRESHOLD,
                  keep_lang: str = KEEP_LANG) -> DataFrame:
    """Quality filter -> language filter -> exact dedup (min doc_id
    per md5 fingerprint); returns the surviving corpus manifest."""
    ensure_session_conf(spark)
    stats = doc_stats(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score")
    langs = lang_id(spark, sf_dir).select("doc_id", "detected_lang")
    prints = doc_fingerprint(spark, sf_dir).select(
        "doc_id", "md5_fingerprint")
    survivors = (
        stats.join(langs, "doc_id").join(prints, "doc_id")
        .filter((F.col("quality_score") >= quality_threshold)
                & (F.col("detected_lang") == keep_lang))
    )
    w = Window.partitionBy("md5_fingerprint").orderBy("doc_id")
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "detected_lang", "n_tokens", "quality_score")
    )


def corpus_curate_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_curate plus near-dup removal: every non-canonical
    member of a MinHash-LSH cluster (dedup.dedup_cluster_frame) is
    dropped. Rows-only in the gate (LSH hash family)."""
    ensure_session_conf(spark)
    kept = corpus_curate(spark, sf_dir)
    clusters = dedup_cluster_frame(spark, sf_dir)
    drops = (
        clusters.select(
            F.explode("members").alias("doc_id"), "keep_doc_id")
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
        .select("doc_id")
    )
    return kept.join(drops, "doc_id", "left_anti")


QUERIES = {
    "corpus_curate": corpus_curate,
    "corpus_curate_neardup": corpus_curate_neardup,  # rows-only
}

ORACLE_SQL = {
    "corpus_curate": f"""
        WITH t AS (
            SELECT doc_id, text, lang,
                   string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id, text, lang,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(toks, x -> x IN {_STOPWORDS_SQL}))
                        AS BIGINT) AS n_stopwords,
                   {_lang_hits_sql}
            FROM t
        ), b AS (
            SELECT *,
                   greatest({", ".join("hits_" + x for x in LANG_MARKERS)})
                       AS best,
                   floor(least(1.0, n_tokens / 50.0)
                         * (1 - n_stopwords / n_tokens) * 10000) / 10000
                       AS quality_score,
                   md5(text) AS md5_fingerprint
            FROM s
        ), kept AS (
            SELECT doc_id,
                   {_lang_case} AS detected_lang,
                   n_tokens, quality_score, md5_fingerprint
            FROM b
            WHERE quality_score >= {QUALITY_THRESHOLD}
              AND {_lang_case} = '{KEEP_LANG}'
        )
        SELECT doc_id, detected_lang, n_tokens, quality_score
        FROM kept
        QUALIFY row_number() OVER (PARTITION BY md5_fingerprint
                                   ORDER BY doc_id) = 1
    """,
}
