"""Phase profile of lakehouse_bloom_point_read (VERDICT r13 task 6):
the 48 s cold sweep number — is it the point READ (the thing the
exhibit demonstrates) or the exhibit's index BUILD (create 16 bloomed
files + ZORDER rewrite + 3 COW deletes)?  Times each phase, counts
jobs, and records the pruning evidence (files admitted by range vs
read after bloom probe) plus a warm second run.

Usage: python scripts/profile_bloom_r14.py [SF_DIR] [ROUNDS]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .appName("profile-bloom-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()

from cdc_plg_spark.catalog import load_table  # noqa: E402
from cdc_plg_spark.lakehouse import TxLogTable  # noqa: E402


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


ev = load_table(spark, "events", SF).select("event_id", "user_id", "value")
ev.count()  # warm

for i in range(ROUNDS):
    prof: dict = {"run": i}
    d = tempfile.mkdtemp(prefix="prof_bloom_")
    t = phase("create_bloomed_16f", lambda: TxLogTable.create(
        spark, os.path.join(d, "t"), ev, "event_id", n_files=16,
        key_bloom_bits=24), prof)
    mx = ev.agg(F.max("event_id")).head()[0]
    k_present = mx * 40 // 100
    k_dels = [mx * pct // 100 for pct in (58, 60, 62)]
    phase("optimize_zorder", lambda: t.optimize(
        zorder_by=("event_id", "user_id"), target_files=16), prof)
    phase("cow_deletes_x3", lambda: [t.delete_where((k, k))
                                     for k in k_dels], prof)

    def _range_admits(k):
        return sum(1 for s in t.snapshot().files.values()
                   if s["min_key"] <= k <= s["max_key"])

    def _reads():
        pres = t.read(key_between=(k_present, k_present))
        files_pres = len(pres.inputFiles())
        abs_probes = [len(t.read(key_between=(k, k)).inputFiles())
                      for k in k_dels]
        pres.collect()
        return {"range_admits_present": _range_admits(k_present),
                "bloom_reads_present": files_pres,
                "absent_file_reads": abs_probes,
                "range_admits_absent": [_range_admits(k) for k in k_dels]}

    prof["pruning"] = phase("point_reads", _reads, prof)
    prof["total"] = round(sum(v["sec"] for v in prof.values()
                              if isinstance(v, dict) and "sec" in v), 3)
    print(json.dumps(prof), flush=True)
    shutil.rmtree(d, ignore_errors=True)
print(json.dumps({"sf_dir": SF, "done": True}))
