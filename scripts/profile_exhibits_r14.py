"""Phase profiles for the two never-profiled ~30 s (cold, r13 sweep)
transactional exhibits — lakehouse_convert_cdc_roundtrip and
stream_ddl_additive_evolve — same treatment as the r14 bloom/merge
profiles (§6/§7): apportion the cold number over phases, cold then
warm in one session, with Spark job counts per phase, so the report
can say WHERE the time goes instead of guessing.  Measurement only;
the operators are not modified (their cost is the commit/replay
machinery they exist to exercise).

Usage: python scripts/profile_exhibits_r14.py [SF_DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .appName("profile-exhibits-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sc = spark.sparkContext
tracker = sc.statusTracker()


class P:
    """Phase timer: wall seconds + Spark job-ids spent inside."""

    def __init__(self):
        self.rows = []

    def __call__(self, label):
        self.label, self.t0 = label, time.perf_counter()
        self.j0 = len(tracker.getJobIdsForGroup(None) or []) \
            if hasattr(tracker, "getJobIdsForGroup") else 0
        return self

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        j1 = len(tracker.getJobIdsForGroup(None) or []) \
            if hasattr(tracker, "getJobIdsForGroup") else 0
        self.rows.append((self.label,
                          round(time.perf_counter() - self.t0, 2),
                          j1 - self.j0))


def profile_convert_roundtrip(tag):
    import tempfile

    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.lakehouse import TxLogTable
    from cdc_plg_spark.operators.lakehouse import (
        _CUTS, _apply_latest, _latest_per_user, _mv_refresh_fn, _mv_seed,
        _with_op)
    from cdc_plg_spark.sources.txlog_stream import TxLogChangesSource
    from cdc_plg_spark.streaming.core import run_foreach_batch

    spark.dataSource.register(TxLogChangesSource)
    p = P()
    ev = load_table(spark, "events", SF)
    d = tempfile.mkdtemp(prefix="prof_cvt_rt_")
    pdir = os.path.join(d, "imported")
    with p("write imported parquet"):
        (_apply_latest(ev.filter(F.col("ts") < _CUTS[0]))
         .repartition(8).write.parquet(pdir))
    with p("convert (metadata-only)"):
        primary = TxLogTable.convert(spark, pdir, "user_id")
    with p(f"{len(_CUTS) - 1} CDC merges"):
        for lo, hi in zip(_CUTS[:-1], _CUTS[1:]):
            delta = _with_op(_latest_per_user(
                ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)))).select(
                "user_id", "event_id", "ts", "value", "op")
            primary.merge(delta, op_col="op")
    with p("mv seed create"):
        mv = TxLogTable.create(spark, os.path.join(d, "mv"),
                               _mv_seed(primary), "grp", n_files=1)
    ckpt = tempfile.mkdtemp(prefix="prof_cvt_rt_ckpt_")
    with p(f"{len(_CUTS) - 1} checkpointed stream catch-up runs"):
        for _ in range(len(_CUTS) - 1):
            stream = (spark.readStream.format("txlog_changes")
                      .option("path", primary.path)
                      .option("fullImages", "true")
                      .option("maxCommitsPerTrigger", "1").load())
            run_foreach_batch(stream, _mv_refresh_fn(mv, f"prof{tag}"), ckpt)
    with p("final mv read"):
        n = mv.read().count()
    import shutil
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(d, ignore_errors=True)
    return {"rows": n, "phases": p.rows,
            "total": round(sum(r[1] for r in p.rows), 2)}


def profile_ddl_evolve(tag):
    from cdc_plg_spark import registry

    p = P()
    with p("full query (foreachBatch 3-batch run + mergeSchema read)"):
        n = registry.all_entries()["stream_ddl_additive_evolve"].fn(
            spark, SF).count()
    return {"rows": n, "phases": p.rows,
            "total": round(sum(r[1] for r in p.rows), 2)}


out = {}
for rnd in ("cold", "warm"):
    out[f"convert_roundtrip_{rnd}"] = profile_convert_roundtrip(rnd)
    print(json.dumps({f"convert_roundtrip_{rnd}":
                      out[f"convert_roundtrip_{rnd}"]}), flush=True)
for rnd in ("cold", "warm"):
    out[f"ddl_evolve_{rnd}"] = profile_ddl_evolve(rnd)
    print(json.dumps({f"ddl_evolve_{rnd}": out[f"ddl_evolve_{rnd}"]}),
          flush=True)
json.dump(out, open("/tmp/profile_exhibits_r14.json", "w"), indent=1)
print("PROFILE_DONE", flush=True)
