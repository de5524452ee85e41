"""Same-session interleaved A/B for the two slowest streaming replays
(VERDICT r13 task 3): join_outer_stream_stream and
stream_join_then_window, HDFS-backed state store (the vanilla-session
default) vs RocksDB (the engine's 100 TB default in session.py that a
driver-owned session never gets).

The state-store providerClass is read at QUERY START, so flipping the
session conf between runs gives a true A/B in one JVM (same JIT, same
host window).  Each run re-executes the operator end to end (fresh
checkpoint + sink dir via run_to_table's mkdtemp) — nothing is reused
across runs.  Alternating order so host drift cannot pick a winner.

Usage: python scripts/ab_stream_state_r14.py [SF_DIR] [ROUNDS]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .appName("ab-stream-state-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cdc_plg_spark import registry  # noqa: E402
from cdc_plg_spark.streaming.core import ROCKSDB_PROVIDER  # noqa: E402

HDFS_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                 "HDFSBackedStateStoreProvider")
QUERIES = ["join_outer_stream_stream", "stream_join_then_window"]
entries = registry.all_entries()


def run(name: str, provider: str) -> float:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    tag = "rocksdb" if provider == ROCKSDB_PROVIDER else "hdfs"
    spark.sparkContext.setJobDescription(f"ab:{name}:{tag}")
    t0 = time.perf_counter()
    entries[name].fn(spark, SF).write.format("noop").mode(
        "overwrite").save()
    return round(time.perf_counter() - t0, 2)


results: dict = {}
for name in QUERIES:
    # one warm run per provider (JIT + staged-fixture build)
    run(name, HDFS_PROVIDER)
    run(name, ROCKSDB_PROVIDER)
    r = {"hdfs": [], "rocksdb": []}
    for _ in range(ROUNDS):
        r["hdfs"].append(run(name, HDFS_PROVIDER))
        r["rocksdb"].append(run(name, ROCKSDB_PROVIDER))
    results[name] = r
    print(json.dumps({name: r}), flush=True)
print(json.dumps({"sf_dir": SF, "rounds": ROUNDS, **results}))
