"""Generate PLANS.md — a physical-plan audit of the headline catalog
queries.

For each query the executed plan (post-AQE initial plan) is digested
into the facts that matter at 100 TB: what the scans read (column
pruning), which filters reached parquet (pushdown), every join's
physical strategy, how many shuffle exchanges run, whether top-k
plans as TakeOrderedAndProject, and how much of the plan runs inside
WholeStageCodegen. Run after plan-affecting changes:

    python tools/plan_report.py          # writes PLANS.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

#: Queries audited in depth — the bench top-costs plus one
#: representative per operator family.
HEADLINE = [
    "top_products", "revenue_by_nation", "customer_rollup",
    "monthly_sales", "events_asof_purchase", "events_conversion_window",
    "tfidf_top_terms", "dedup_exact", "dedup_pairs_all",
    "dedup_minhash_lsh", "ann_topk", "ann_ivf_topk",
    "embedding_quantize", "doc_chunk", "tokenize_ids",
    "fuzzy_name_neighbors", "shard_manifest", "quality_bins",
    "events_value_histogram", "approx_distinct_users",
    "media_meta_extract", "kmeans_assign", "corpus_health",
    "dedup_incremental", "events_anomaly",
    # round-4 relational/warehouse surface
    "promo_revenue_monthly", "late_ship_orders", "large_volume_orders",
    "copurchase_pairs", "latest_event_per_user", "events_props_stats",
    "scd2_customer_history", "bigram_pmi", "events_hourly_gapfill",
    "monthly_sales_incremental", "snapshot_diff", "train_split_assign",
    "user_path_transitions", "semantic_dedup_clusters",
    "token_char_correlation", "events_dow_hour_heatmap",
    "order_percentile_ranks", "events_dedup_batch",
    # round-5 additions
    "embedding_neardup_lsh", "media_ingest_rollup",
    # round-5 second half: subquery/decorrelation + corpus QA +
    # iterative + custom-source surface
    "cross_nation_trade", "nation_market_share",
    "supplier_value_concentration", "customer_order_distribution",
    "top_revenue_supplier", "small_order_part_revenue",
    "disjunctive_promo_revenue", "idle_high_balance_customers",
    "bigram_doc_logprob", "ttr_by_source", "source_vocab_overlap",
    "embedding_outliers", "copurchase_pagerank", "jsonl_ingest_rollup",
    "monthly_sales_retract", "zorder_layout_manifest",
    "gopher_quality_flags", "semantic_decontaminate", "hll_shard_merge",
    "pretrain_prepare_report", "pq_ann_topk", "events_unpivot_daily",
    "k_anonymity_report", "feature_scaling_stats",
    "item_cooccurrence_cf", "user_level_split",
    "stratified_exact_sample", "cheapest_supplier_per_part",
    "returned_revenue_customers", "supplier_part_variety",
    "suppliers_kept_waiting", "shipping_priority_orders",
    "discount_revenue_forecast", "product_margin_by_nation",
    "ann_recall_report", "events_point_in_time_enrich",
    "customer_rfm_segments", "basket_lift_rules",
    "events_funnel_windowed", "revenue_concentration",
    "events_stickiness", "monthly_seasonality_index",
    "compression_quality", "linestatus_priority_mix",
    "surplus_stock_suppliers", "segment_dedup",
    "rolling_7d_revenue", "negative_samples", "user_value_ewma",
    "top_events_per_user", "ann_incremental_topk",
    "event_pattern_conversions", "benford_digit_test",
    "copurchase_triangles", "token_weighted_sample",
    "cf_holdout_hitrate", "ab_test_report", "revenue_trend_ols",
    "cdc_latest_state", "fd_audit",
    "chi_square_independence", "bm25_doc_ranking",
    "kaplan_meier_survival", "revenue_attribution",
    "customer_retention_set_ops", "copurchase_khop_reach",
    "revenue_cusum_changepoint", "events_value_psi",
    "user_erasure_audit",
    "user_value_twap", "revenue_autocorrelation",
    "categorical_entropy_profile", "copurchase_degree_powerlaw",
    "language_sampling_weights", "supplier_efficiency_frontier",
    "revenue_trend_theil_sen", "event_hour_mutual_information",
    "bloom_semijoin_reduction", "poisson_bootstrap_mean_ci",
    "open_orders_timeline", "hll_audience_overlap",
    "cms_user_event_counts", "priority_sample_docs",
    "mann_whitney_u_test", "order_value_equidepth",
    "daily_revenue_stl",
    # round-6 additions: two-pass global-rank consumers, stats/ML
    # evaluation, text/dedup extensions, governance
    "zipf_term_fit", "robust_outlier_mad", "embedding_dim_stats",
    "woe_encoding", "table_stats_profile", "gains_lift_table",
    "user_activity_streaks", "quantile_normalize_quality",
    "ngram_novelty_score", "source_overlap_matrix",
    "interarrival_time_profile", "expectation_suite_report",
    "revenue_growth_mom_yoy", "dedup_minhash_incremental",
    "user_sequence_entropy", "weighted_price_percentiles",
]

_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)")


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def digest(plan: str) -> dict:
    pushed = sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)))
    pushed = [p for p in pushed if p.strip()]
    # ReadSchema: struct<a:bigint,b:string...> — the tree string may
    # truncate long structs with '...', so stay on one line and keep
    # only tokens that are plain identifiers.
    read_cols = sorted({
        c.split(":")[0].strip()
        for s in re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
        for c in s.rstrip(">. ").split(",")
        if _IDENT_RE.match(c.split(":")[0].strip())
    })
    joins = [m.group(1) for m in _JOIN_RE.finditer(plan)]
    return {
        "read_cols": read_cols,
        "pushed": bool(pushed),
        "joins": joins,
        # every Exchange flavor is a real shuffle barrier: hash (joins/
        # aggs), range (global sorts), SinglePartition (global windows)
        "exchanges": len(re.findall(r"Exchange (hashpartitioning|"
                                    r"rangepartitioning|SinglePartition)",
                                    plan)),
        "topk": "TakeOrderedAndProject" in plan,
        "python": ("ArrowEvalPython" in plan or "MapInPandas" in plan
                   or "FlatMapGroupsInPandas" in plan),
    }


def main() -> None:
    from simpleetlpipeline_spark.plans import catalog
    from simpleetlpipeline_spark.session import get_spark

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        "Auto-generated by `tools/plan_report.py` at sf0.01 (plan",
        "shapes are scale-independent; AQE may further coalesce or",
        "convert joins at runtime). Columns: what the parquet scans",
        "actually read (pruning), whether filters reached the scan",
        "(pushdown), physical join strategies in plan order, shuffle",
        "exchange count (hash + range + single-partition), top-k as",
        "TakeOrderedAndProject, and whether any Python (Arrow) stage",
        "is on the path — everything else is JVM whole-stage codegen.",
        "",
        "| query | cols read | pushdown | joins | shuffles | top-k | python |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in HEADLINE:
        fn = catalog.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            # Pre-execution (AQE initial) plan: deterministic and free of
            # cached-subplan repetition; AQE can only improve it at
            # runtime (broadcast conversion, coalescing, skew split).
            d = digest(df._jdf.queryExecution().executedPlan().toString())
        except Exception as exc:  # pragma: no cover
            lines.append(f"| {name} | ERROR: {exc} | | | | | |")
            continue
        joins = ", ".join(
            f"{j}×{d['joins'].count(j)}" for j in dict.fromkeys(d["joins"])
        ) or "—"
        cols = ", ".join(d["read_cols"][:6])
        if len(d["read_cols"]) > 6:
            cols += f", … ({len(d['read_cols'])})"
        lines.append(
            f"| {name} | {cols or '—'} | {'yes' if d['pushed'] else '—'} "
            f"| {joins} | {d['exchanges']} | {'yes' if d['topk'] else '—'} "
            f"| {'Arrow' if d['python'] else '—'} |")
    lines += [
        "",
        "Audit invariants enforced by tests/test_plans.py: dimension",
        "joins broadcast (no SortMergeJoin in star joins), LSH band",
        "joins stay equi-joins (never cartesian), rollups pre-aggregate",
        "the fact side under the join, bucketed joins run with zero",
        "exchange, chunking/quantization stay narrow, and salted",
        "aggregation keeps two aggregate stages.",
        "",
    ]
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(HEADLINE)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
