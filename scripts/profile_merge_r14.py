"""Phase + job-count profile of lakehouse_merge_upsert (VERDICT r13
task 7): split the 2-3 s wall into create / merge / read-back, count
the Spark jobs each phase schedules, and A/B the MERGE with AQE on vs
off — the hypothesis is that AQE's per-stage re-optimization adds
driver scheduling latency to a transaction whose sub-queries are tiny
at exhibit scale.

Usage: python scripts/profile_merge_r14.py [SF_DIR] [ROUNDS]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .appName("profile-merge-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

from cdc_plg_spark.catalog import load_table  # noqa: E402
from cdc_plg_spark.lakehouse import TxLogTable  # noqa: E402
from cdc_plg_spark.operators.lakehouse import (  # noqa: E402
    SPLIT_TS, _apply_latest, _latest_per_user, _out, _with_op)

tracker = sc.statusTracker()


def jobs() -> int:
    ids = tracker.getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


def phase(label, fn, out):
    j0 = jobs()
    t0 = time.perf_counter()
    r = fn()
    out[label] = {"sec": round(time.perf_counter() - t0, 3),
                  "jobs": jobs() - j0}
    return r


ev = load_table(spark, "events", SF)
ev.count()  # warm footers

results = []
for i in range(ROUNDS):
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        prof: dict = {"aqe": aqe}
        snap = _apply_latest(ev.filter(F.col("ts") < SPLIT_TS))
        delta = _with_op(_latest_per_user(
            ev.filter(F.col("ts") >= SPLIT_TS))).select(
            "user_id", "event_id", "ts", "value", "op")
        d = tempfile.mkdtemp(prefix="prof_merge_")
        t = phase("create", lambda: TxLogTable.create(
            spark, os.path.join(d, "t"), snap, "user_id", n_files=8), prof)
        phase("merge", lambda: t.merge(delta, op_col="op"), prof)
        phase("read", lambda: _out(t.read()).write.format("noop")
              .mode("overwrite").save(), prof)
        prof["total"] = round(sum(v["sec"] for v in prof.values()
                                  if isinstance(v, dict)), 3)
        results.append(prof)
        print(json.dumps(prof), flush=True)
        import shutil
        shutil.rmtree(d, ignore_errors=True)
spark.conf.set("spark.sql.adaptive.enabled", "true")
print(json.dumps({"sf_dir": SF, "rounds": ROUNDS}))
