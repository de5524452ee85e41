"""Benchmark harness — BASELINE.md §"Benchmark protocol".

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], times each query
(median of N_RUNS, noop-materialized so driver transfer doesn't skew),
runs the identical DuckDB oracle SQL for the ≤2× baseline comparison,
and prints ONE JSON line:

    {"metric": "...", "value": <spark total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "duckdb": {...}, "ratio": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Headline set: one representative per engine area (batch relational,
# windows, LLM-pipeline). Streaming replays are excluded — their cost is
# dominated by per-query checkpoint setup, not dataflow (they're
# correctness-gated instead, tests/test_streaming.py).
BENCH_QUERIES = [
    "flagship_cdc_compaction",   # scan+filter+broadcast join+window+agg
    "agg_hash_groupby",          # TPC-H Q1-style partial+final hash agg
    "agg_grouping_sets",         # rollup shuffle
    "join_inner_hash",           # broadcast hash join
    "join_sortmerge",            # large-large shuffle join
    "join_asof",                 # window-based as-of pattern
    "dedup_latest_per_key",      # CDC compaction window
    "topk_per_group",            # rank-k per group
    "win_running_sum",           # running frame
    "dedup_exact",               # hash dedup over documents
    "text_stats",                # explode+agg over documents
    "tfidf_keywords",            # multi-join text pipeline
    "sim_topk_search",           # brute-force cosine top-k
    "fn_string",                 # scalar function pipeline
    "decode_json_event",         # JSON envelope decode
]

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _median_time(fn, n=N_RUNS):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("cdc-plg-spark-bench")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_plg_spark import registry

    entries = registry.all_entries()
    names = [n for n in BENCH_QUERIES if n in entries]

    # warm the JVM + parquet footers once with the cheapest query
    entries[names[0]].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()

    per_query: dict[str, float] = {}
    for name in names:
        q = entries[name]

        def run(q=q):
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        per_query[name] = round(_median_time(run), 4)

    spark_total = round(sum(per_query.values()), 4)

    # DuckDB side: identical oracle SQL over the same parquet, same box.
    duck: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        con.execute("SET TimeZone='UTC'")
        con.execute(f"SET threads TO {int(CPUS)}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
        for name in names:
            sql = entries[name].oracle
            if not sql:
                continue
            duck[name] = round(_median_time(
                lambda sql=sql: con.execute(sql).fetchall()), 4)
    except Exception:
        pass

    duck_total = round(sum(duck.values()), 4) if duck else None
    out = {
        "metric": "headline suite wall-time, median of %d runs" % N_RUNS,
        "value": spark_total,
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "duckdb": duck,
        "duckdb_total": duck_total,
        "ratio_vs_duckdb": (round(spark_total / duck_total, 3)
                            if duck_total else None),
        "cpus": int(CPUS),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
