"""Phase breakdown for the lakehouse_incremental_mv bench tracker
(VERDICT r10 task 5: the 3.26 s/run number is the dominant term in the
lakehouse write-path section; split WRITE-PATH build cost — table
create + per-cut MERGE commits — from the incremental FOLD the query
name advertises, so BASELINE.md can document what the tracker actually
measures).

Phases mirror operators/lakehouse.py::lakehouse_incremental_mv exactly
(same helpers, same cuts) with a timer per phase:
- create:      TxLogTable.create from the pre-cut snapshot (1 commit,
               8-file write)
- merge_k:     each weekly-cut CDC MERGE (candidate pruning + COW
               rewrite + commit)
- fold_build:  constructing the v0-read + per-commit table_changes
               union plan (driver-side)
- fold_exec:   executing the ONE grouped aggregate to a noop sink —
               the part that is actually "incremental MV maintenance"

Run on a quiet host; bench-identical session confs.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("SPARK_GRAFT_BENCH_LAKE_RUNS", "3"))


def main() -> None:
    from functools import reduce

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("incremental-mv-profile")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.scheduler.mode", "FAIR")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.lakehouse import TxLogTable
    from cdc_plg_spark.operators.lakehouse import (
        _CUTS, _apply_latest, _latest_per_user, _with_op)

    def one_run() -> dict[str, float]:
        t: dict[str, float] = {}
        ev = load_table(spark, "events", SF_DIR)
        d = tempfile.mkdtemp(prefix="lh_mv_prof_")

        t0 = time.perf_counter()
        tbl = TxLogTable.create(
            spark, os.path.join(d, "t"),
            _apply_latest(ev.filter(F.col("ts") < _CUTS[0])),
            "user_id", n_files=8)
        t["create"] = time.perf_counter() - t0

        for i, (lo, hi) in enumerate(zip(_CUTS[:-1], _CUTS[1:]), 1):
            delta = _with_op(_latest_per_user(
                ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)))
            ).select("user_id", "event_id", "ts", "value", "op")
            t0 = time.perf_counter()
            tbl.merge(delta, op_col="op")
            t[f"merge_{i}"] = time.perf_counter() - t0

        grp = F.pmod(F.col("user_id"), F.lit(16)).cast("long").alias("grp")
        cents = F.round(F.col("value") * 100, 0).cast("long")
        sign = (F.when(F.col("change_type").isin("I", "U_post"), F.lit(1))
                 .otherwise(F.lit(-1)))
        t0 = time.perf_counter()
        parts = [tbl.read(version=0).select(
            grp, F.lit(1).alias("_n"),
            F.col("event_id").alias("_id"), cents.alias("_c"))]
        for v in range(1, len(_CUTS)):
            parts.append(
                tbl.table_changes(v - 1, v, full_images=True)
                   .select(grp, sign.alias("_n"),
                           (sign * F.col("event_id")).alias("_id"),
                           (sign * cents).alias("_c")))
        mv = (reduce(lambda x, y: x.unionByName(y), parts)
              .groupBy("grp")
              .agg(F.sum("_n").alias("n_keys"),
                   F.sum("_id").alias("id_sum"),
                   F.sum("_c").alias("cents_sum"))
              .filter(F.col("n_keys") > 0))
        t["fold_build"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        mv.write.format("noop").mode("overwrite").save()
        t["fold_exec"] = time.perf_counter() - t0
        t["total"] = sum(t.values())
        return {k: round(v, 4) for k, v in t.items()}

    one_run()  # warm (JIT, footer caches) — matches the bench's warm run
    runs = [one_run() for _ in range(N)]
    keys = runs[0].keys()
    med = {k: round(sorted(r[k] for r in runs)[len(runs) // 2], 4)
           for k in keys}
    write_path = round(med["create"] + sum(
        v for k, v in med.items() if k.startswith("merge_")), 4)
    print(json.dumps({
        "query": "lakehouse_incremental_mv", "sf_dir": SF_DIR,
        "n_runs": N, "runs": runs, "median": med,
        "write_path_sec": write_path,
        "fold_sec": round(med["fold_build"] + med["fold_exec"], 4),
        "write_path_share": round(write_path / med["total"], 3),
    }))


if __name__ == "__main__":
    main()
