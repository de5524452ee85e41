"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (SURVEY.md §4, §7):

- AQE on (runtime re-plan: join-strategy switch, skew-join split,
  partition coalesce) — the main line of defense against skew and
  mis-sized shuffles at scale.
- Session timezone UTC — the oracle harness compares timestamps as UTC
  (FIXTURES.md "Oracle harness notes").
- Arrow on — every Python↔JVM crossing is Arrow-batched.
- shuffle.partitions sized by env (32 locally; a real cluster overrides
  via spark-submit conf — AQE coalesces down when partitions are small).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: engine semantics follow permissive SQL (oracle parity with
    # DuckDB on casts/overflow is handled per-query with try_* functions).
    "spark.sql.ansi.enabled": "false",
    # fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    # rejects; read as long ns and convert in catalog.load_table
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # fixture timestamps are µs with isAdjustedToUTC=false; with NTZ
    # inference on they'd surface as TIMESTAMP_NTZ and every
    # unix_micros/watermark call breaks.  Read them as TimestampType —
    # session TZ is UTC, so the instant matches DuckDB's naive read —
    # and keep the scan type native so filters still push down.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # write timestamps as INT64 TIMESTAMP(MICROS), not legacy INT96:
    # INT96 carries NO parquet column statistics, which would forfeit
    # footer-derived time-range data skipping on every table this
    # session writes (lakehouse._write_data re-asserts this conf at
    # runtime for foreign sessions, same pattern as load_table's
    # nanosAsLong)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # local testing tier; cluster deployments override
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.files.maxPartitionBytes": "128MB",
    # streaming state at scale: RocksDB keeps large per-key state off-heap
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "cdc_plg_spark", master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    on a cluster, pass ``master=None`` with a pre-configured
    spark-submit and the builder only applies missing confs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    if extra_confs:
        for k, v in extra_confs.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
