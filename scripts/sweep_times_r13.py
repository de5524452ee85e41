"""One-run wall-time sweep over every registry entry at $SPARK_GRAFT_SF_DIR
(r13 optimization round: the per-operator hotspot checklist).

Each query is built and noop-materialized once (guide §1.4); eager
exhibits (lakehouse/iterative tags) execute inside fn() and are timed
end-to-end the same way.  Output: JSONL lines {name, sec, tags, err}
to stdout, progressively, so a stuck query is visible.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("sweep-times-r13")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_plg_spark import registry

    registry.load_all()
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name in sorted(registry.all_entries()):
        if only and only not in name:
            continue
        e = registry.get(name)
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        err = None
        try:
            e.fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
        except Exception as ex:           # noqa: BLE001 — sweep survey
            err = f"{type(ex).__name__}: {ex}"[:200]
        sec = round(time.perf_counter() - t0, 3)
        print(json.dumps({"name": name, "sec": sec,
                          "tags": list(e.tags), "err": err}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
