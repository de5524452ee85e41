"""Capture .explain("formatted") for the r14 optimization round.

Writes plans/r14/<query>_<tag>.txt for every query named on the
command line (default: the bench headline set + the LSH/incremental
family), with bench-identical session confs at $SPARK_GRAFT_SF_DIR.

Usage: python scripts/capture_plans_r14.py <before|after> [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DEFAULT = [
    "flagship_cdc_compaction", "agg_hash_groupby", "agg_grouping_sets",
    "join_inner_hash", "join_sortmerge", "join_bucketed_colocated",
    "join_asof", "dedup_latest_per_key", "topk_per_group",
    "win_running_sum", "dedup_exact", "text_stats", "tfidf_keywords",
    "sim_topk_search", "fn_string", "decode_json_event",
    "decode_canal_json", "analytics_shipping_priority",
    "analytics_nation_volume", "analytics_sessionize_batch",
    "analytics_volume_shipping", "analytics_returned_items", "ts_ewma",
    "join_asof_nearest",
    # LSH / incremental family (own bench section)
    "dedup_fuzzy_minhash", "dedup_fuzzy_minhash_checked",
    "dedup_incremental_vs_index",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("capture-plans-r14")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_plg_spark import registry
    from cdc_plg_spark.plans.inspect import plan_str

    registry.load_all()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        q = registry.get(name)
        df = q.fn(spark, SF_DIR)
        p = plan_str(df, "formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF_DIR} ({tag})\n{p}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
