"""Regenerate tests/plan_snapshots.json: per-query physical-plan
operator-count fingerprints at sf0.001 (SURVEY.md §7 plan-regression
snapshots). Run after an intentional plan change:

    python scripts/gen_plan_snapshots.py

then review the JSON diff — every changed line is a plan change you
are explicitly signing off on.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "plan_snapshots.json")

# Batch queries with deterministic, side-effect-free plan construction.
# Excluded: streaming (no explain before start), model-building queries
# (IVF/LSH collect at build time), write-path queries (bucketed/object
# -store layouts depend on cache state).
SNAPSHOT_QUERIES = [
    "flagship_cdc_compaction", "agg_hash_groupby", "agg_grouping_sets",
    "agg_global", "agg_minmax_by", "agg_corr_covar",
    "join_inner_hash", "join_sortmerge", "join_asof", "join_semi",
    "join_anti", "join_theta_range", "join_skew_salted",
    "join_asof_nearest",
    "dedup_latest_per_key", "scd2_from_cdc", "cdc_merge_upsert",
    "cdc_time_travel", "text_unigram_logprob",
    "cdc_delta_agg", "ts_time_bucket", "ts_gap_fill", "ts_ewma",
    "ts_interpolate_linear",
    "topk_global", "topk_per_group", "win_running_sum", "win_lag_lead",
    "win_ignore_nulls", "win_cume_dist", "win_trailing_time_range",
    "agg_median_mad",
    "dedup_exact", "dedup_ngram_jaccard", "text_stats", "text_chunking",
    "text_decontaminate", "text_repetition_signals", "sample_domain_quota",
    "sample_pack_token_budget", "sample_temperature_mix",
    "sample_global_shuffle", "set_intersect_all", "set_except_distinct",
    "win_ntile", "embedding_centroid_per_label", "source_python_datasource",
    "ts_resample_ohlc", "join_null_safe", "pipeline_llm_preprocess", "agg_cube",
    "analytics_forecast_revenue", "analytics_top_supplier",
    "analytics_disjunctive_filter",
    "analytics_priority_late_orders",
    "analytics_linestatus_priority_mix", "analytics_large_volume_orders",
    "tfidf_keywords", "sim_topk_search", "sim_cosine_pairwise",
    "fn_string", "fn_array", "fn_map_higher_order", "decode_json_event",
    "decode_canal_json", "decode_debezium_json", "decode_maxwell_json",
    "mm_decode_ppm_real",
    "fn_variant", "fn_try_arith", "analytics_cumulative_distinct_users",
    "analytics_shipping_priority", "analytics_nation_volume",
    "analytics_regional_trade", "analytics_sessionize_batch",
    "analytics_funnel", "analytics_retention", "analytics_histogram",
    "analytics_volume_shipping", "analytics_product_profit",
    "analytics_returned_items", "analytics_order_count_distribution",
    "analytics_promo_share", "analytics_small_qty_revenue",
    "analytics_idle_customers", "analytics_min_cost_supplier",
    "analytics_yoy_growth", "analytics_basket_pairs",
    "analytics_important_stock", "analytics_supplier_part_variety",
    "analytics_restock_candidates",
    "analytics_rfm_segmentation", "dedup_sorted_neighborhood",
    "sql_portable_cte",
    "fn_datetime_tz", "sample_weighted", "maintenance_zorder_layout",
    "audit_observe_metrics",
    "subquery_in", "subquery_scalar_correlated",
    "set_union_evolved", "reshape_pivot", "reshape_unpivot",
    "sample_stratified", "sample_train_test_split",
]


def main() -> None:
    from cdc_plg_spark import registry
    from cdc_plg_spark.plans.inspect import plan_signature
    from cdc_plg_spark.session import get_spark

    spark = get_spark("gen-plan-snapshots")
    spark.sparkContext.setLogLevel("ERROR")
    snaps: dict[str, dict[str, int]] = {}
    for name in SNAPSHOT_QUERIES:
        df = registry.get(name).fn(spark, SF_SMALL)
        snaps[name] = plan_signature(df)
        print(name, snaps[name])
    with open(OUT, "w") as f:
        json.dump(snaps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(snaps)} snapshots to {OUT}")


if __name__ == "__main__":
    main()
