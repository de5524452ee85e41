"""Quiet-host profile for the decode_canal_json watch (VERDICT r10
task 2: BENCH_r10 recorded 0.6185 s > the ~0.5 s escalation threshold
the r9 builder set; the whole r10 suite inflated uniformly, implicating
host state + plan-build, but the rule fired and must be discharged with
data, not waved off).

Replicates the bench harness's conditions exactly (local[32], FAIR,
AQE, arrow, shuffle=32, noop sink, same warmup) and reports the
combined number the bench records PLUS its split:
- plan_build_sec: the fn(spark, sf_dir) call — driver-side py4j plan
  construction, constant with SF and serialized by the GIL;
- exec_sec: noop write of a PREPARED DataFrame — the engine's part.

Run on a QUIET host (nothing else on the box).  Closure per the r9
rule: combined median <= ~0.5 s on two runs.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
NAME = "decode_canal_json"


def med(fn, n=N):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4), [round(t, 4) for t in ts]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("decode-canal-profile")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.scheduler.mode", "FAIR")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_plg_spark import registry

    q = registry.all_entries()[NAME]
    # bench-identical warmup: one full run
    q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    combined, combined_all = med(
        lambda: q.fn(spark, SF_DIR).write.format("noop")
                 .mode("overwrite").save())
    build, build_all = med(lambda: q.fn(spark, SF_DIR))
    prepared = q.fn(spark, SF_DIR)
    execd, exec_all = med(
        lambda: prepared.write.format("noop").mode("overwrite").save())
    print(json.dumps({
        "query": NAME, "sf_dir": SF_DIR, "n_runs": N,
        "combined_median_sec": combined, "combined_runs": combined_all,
        "plan_build_median_sec": build, "plan_build_runs": build_all,
        "exec_median_sec": execd, "exec_runs": exec_all,
        "watch_threshold_sec": 0.5,
        "closes_watch": combined <= 0.52,
    }))


if __name__ == "__main__":
    main()
